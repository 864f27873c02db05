"""G16 neighborhood function + HyperBall (algorithms/neighborhood.py).

The exact operator is checked against a pure-python BFS pair count; the
HyperBall register STATE is replayed bit-for-bit by a pure-python HLL
simulation (same md5-60 hash split), and its estimates carry an accuracy
contract vs the exact ball sizes."""

import hashlib
import math
import random
import shutil

import pytest

from scalemine_spark.algorithms import hyperball, neighborhood_function
from scalemine_spark.checkpoint import CheckpointManager


def _rand_edges(n=60, m=180, seed=7):
    rng = random.Random(seed)
    es = set()
    while len(es) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            es.add((u, v))
    return sorted(es)


def _balls(pairs, max_t):
    """dict vertex -> set of vertices within directed distance <= t, per t."""
    verts = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, []).append(v)
    balls = {0: {v: {v} for v in verts}}
    for t in range(1, max_t + 1):
        prev = balls[t - 1]
        balls[t] = {
            v: reach | {w for u in reach for w in adj.get(u, [])}
            for v, reach in prev.items()
        }
    return balls


def test_neighborhood_function_matches_python_bfs(spark):
    pairs = _rand_edges()
    e = spark.createDataFrame(pairs, "src long, dst long")
    nf, info = neighborhood_function(e, max_t=4)
    got = {r["t"]: r["n_pairs"] for r in nf.collect()}
    balls = _balls(pairs, 4)
    want = {t: sum(len(s) for s in balls[t].values()) for t in range(5)}
    assert got == want
    assert info["counts"] == [want[t] for t in range(5)]


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _hll_init(v: int, m: int):
    h = _md5_60(str(v))
    b = h % m
    rest = h // m
    w = 60 - int(math.log2(m))
    rho = (w + 1) - rest.bit_length() if rest > 0 else w + 1
    regs = [0] * m
    regs[b] = rho
    return regs


def test_hyperball_registers_bit_exact_vs_python(spark):
    pairs = _rand_edges(n=40, m=120, seed=3)
    m = 16
    e = spark.createDataFrame(pairs, "src long, dst long")
    out, info = hyperball(e, max_t=3, m=m)
    got = {r["id"]: list(r["regs"]) for r in out.collect()}

    verts = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, []).append(v)
    state = {v: _hll_init(v, m) for v in verts}
    sums = []
    for _ in range(3):
        nxt = {}
        for v in verts:
            regs = list(state[v])
            for w in adj.get(v, []):
                regs = [max(a, b) for a, b in zip(regs, state[w])]
            nxt[v] = regs
        state = nxt
        sums.append(sum(sum(r) for r in state.values()))
    assert got == state
    assert info["sum_regs"] == sums


def test_hyperball_estimate_accuracy_vs_exact(spark):
    """Deterministic accuracy contract: with m=64, the mean relative error
    of per-vertex ball estimates vs the exact t=3 ball sizes stays under
    20% on the seeded fixture (HLL's 1.04/sqrt(64) = 13% expected)."""
    pairs = _rand_edges(n=200, m=900, seed=11)
    e = spark.createDataFrame(pairs, "src long, dst long")
    out, _ = hyperball(e, max_t=3, m=64)
    est = {r["id"]: r["ball_est"] for r in out.collect()}
    exact = {v: len(s) for v, s in _balls(pairs, 3)[3].items()}
    rel = [abs(est[v] - exact[v]) / exact[v] for v in exact]
    assert sum(rel) / len(rel) < 0.20, sum(rel) / len(rel)


def test_hyperball_resume_bitwise(spark, tmp_path):
    pairs = _rand_edges(n=30, m=80, seed=5)
    e = spark.createDataFrame(pairs, "src long, dst long")
    base = str(tmp_path / "hb")
    full, _ = hyperball(e, max_t=3, m=16,
                        checkpointer=CheckpointManager(base, "r", "hb"))
    want = {r["id"]: list(r["regs"]) for r in full.collect()}
    # wipe the last round's manifests; resume must replay exactly one round
    import glob, os
    ms = sorted(glob.glob(f"{base}/r/hb/_manifests/*.json"))
    for f in [p for p in ms if p.split("/")[-1].startswith("000003")]:
        os.remove(f)
    out2, info2 = hyperball(e, max_t=3, m=16,
                            checkpointer=CheckpointManager(base, "r", "hb"))
    assert {r["id"]: list(r["regs"]) for r in out2.collect()} == want
    assert len(info2["sum_regs"]) == 1
    shutil.rmtree(base, ignore_errors=True)


def test_neighborhood_saturation_early_stop(spark):
    # a single edge saturates at t=1; counts must pad flat to max_t
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    nf, info = neighborhood_function(e, max_t=3)
    got = sorted((r["t"], r["n_pairs"]) for r in nf.collect())
    assert got == [(0, 2), (1, 3), (2, 3), (3, 3)]
