/* LD_PRELOAD shim: pin the process's current and future memory.
 *
 * Purpose (see scalemine_spark/scratch.py module docstring): this sandbox
 * restores guest memory lazily and demand faults cost ~150-640us/page,
 * while population under mlock uses a fast bulk path (~2300x faster
 * measured). The python driver pins itself via ctypes; the JVM has no
 * mlockall flag, so executor/driver JVMs get pinned by preloading this
 * shim (constructor runs before main). Best-effort: failure is ignored —
 * on normal hardware this is a no-op cost-wise either way.
 */
#include <sys/mman.h>

__attribute__((constructor)) static void pin_all(void) {
    (void)mlockall(MCL_CURRENT | MCL_FUTURE);
}
