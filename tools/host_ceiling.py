"""Measure this box's raw scaling ceilings for the two resources an
iterative Spark job consumes: CPU (ALU-bound busy loop) and MEMORY BANDWIDTH
(streaming numpy reduction over arrays far larger than LLC).

The scaling protocol (tools/scaling_bench.py) measures whole-job efficiency
at local[2] vs local[8]; this tool establishes what the HARDWARE allows for
each resource class at those process counts — a single shared-memory box is
not 4 independent executors, so bandwidth-bound phases cannot scale like a
real N->4N cluster whose nodes each bring their own memory channels.

Usage: python tools/host_ceiling.py [--levels 1,2,8] [--seconds 8]
Prints JSON: per-level aggregate throughput and the lo->hi efficiency.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def cpu_worker(barrier, seconds: float, out) -> None:
    x = 1
    n = 0
    barrier.wait()  # workers start their timed window together
    stop_t = time.monotonic() + seconds
    while time.monotonic() < stop_t:
        for _ in range(10000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 10000
    out.append(n)


def bw_worker(barrier, seconds: float, out) -> None:
    import numpy as np

    # allocate + first-touch BEFORE the timed window: fresh page allocation
    # is pathologically slow in this sandbox's VM (measured 6.6s for a 64 MB
    # standard_normal — it once consumed the whole budget and reported 0)
    a = np.random.default_rng(0).standard_normal(64 * 1024 * 1024 // 8)  # 64 MB
    float(a.sum())
    n = 0
    s = 0.0
    barrier.wait()
    stop_t = time.monotonic() + seconds
    while time.monotonic() < stop_t:
        s += float(a.sum())  # streaming read, ~64 MB per pass
        n += 1
    out.append(n)


def run_level(kind: str, nproc: int, seconds: float) -> float:
    mgr = mp.Manager()
    out = mgr.list()
    barrier = mp.Barrier(nproc)
    fn = cpu_worker if kind == "cpu" else bw_worker
    ps = [mp.Process(target=fn, args=(barrier, seconds, out)) for _ in range(nproc)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(out) / seconds  # aggregate ops/sec or passes/sec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    res = {}
    for kind in ("cpu", "bw"):
        per = {}
        for n in levels:
            per[n] = run_level(kind, n, args.seconds)
        lo, hi = levels[0], levels[-1]
        per["efficiency"] = round((per[hi] / per[lo]) / (hi / lo), 3)
        res[kind] = {str(k): (round(v, 1) if isinstance(v, float) else v) for k, v in per.items()}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
