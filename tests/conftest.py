import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scalemine_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
TESTDATA_ROOT = "/root/testdata"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("scalemine-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_small(spark, tmp_path_factory):
    """Synthetic sf0.001-scale pages fixture (2000 urls) + expected edges."""
    from scalemine_spark.fixtures import materialize_pages

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    ppath, epath = materialize_pages(
        f"{TESTDATA_ROOT}/sf0.001/documents.parquet", cache, n_pages=2000, seed=42
    )
    return spark.read.parquet(ppath), spark.read.parquet(epath)


def edges_df(spark, pairs):
    """Edge DataFrame from a list of (src, dst) int pairs."""
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def pagerank_numpy(pairs, n_ids=None, d=0.85, iters=200, tol=0.0):
    """Dense power-iteration oracle with the exact same update rule as G1."""
    import numpy as np

    ids = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    edges = {(idx[a], idx[b]) for a, b in pairs if a != b}
    out = np.zeros(n)
    for a, _ in edges:
        out[a] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for a, b in edges:
            contrib[b] += r[a] / out[a]
        dangling = r[out == 0].sum()
        rn = (1 - d) / n + d * (contrib + dangling / n)
        delta = np.abs(rn - r).sum()
        r = rn
        if tol > 0 and delta < tol:
            break
    return {v: r[idx[v]] for v in ids}


def components_oracle(pairs):
    """Union-find; comp = min id of component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    verts = set()
    for a, b in pairs:
        verts.add(a)
        verts.add(b)
        if a != b:
            union(a, b)
    return {v: find(v) for v in verts}


def lpa_oracle(pairs, iters):
    """Pure-python synchronous LPA, same tie rule (max count, min label)."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    verts = set(adj) | {v for e in pairs for v in e}
    labels = {v: v for v in verts}
    for _ in range(iters):
        new = {}
        for v in verts:
            if not adj[v]:
                new[v] = labels[v]
                continue
            cnt = Counter(labels[u] for u in adj[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    return labels


def triangles_oracle(pairs):
    """Exact per-vertex and global triangle counts."""
    from collections import defaultdict
    from itertools import combinations

    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    tri_per = defaultdict(int)
    total = 0
    seen = set()
    for v in adj:
        for x, y in combinations(sorted(adj[v]), 2):
            if y in adj[x]:
                t = tuple(sorted((v, x, y)))
                if t not in seen:
                    seen.add(t)
                    total += 1
                    for u in t:
                        tri_per[u] += 1
    verts = {v for e in pairs for v in e}
    return total, {v: tri_per.get(v, 0) for v in verts}
