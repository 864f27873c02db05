"""Similarity search over embedding columns (array<float>).

cosine_topk — exact brute-force baseline: broadcast the (small) query set,
cross-join against the corpus, dot products via zip_with/aggregate (JVM
higher-order functions — no Python), window top-k.

ann_lsh — data-independent scale path: random-hyperplane LSH signatures
(hyperplanes are seeded numpy constants embedded as array literals, fully
deterministic), bucket equi-join, exact re-rank inside the bucket. At 10^12
vectors the bucket join replaces the O(N*Q) cross product with O(N)
signature hashing plus per-bucket candidate lists.

ann_ivf — data-dependent scale path (inverted-file index): each corpus
vector is assigned to its nearest of K coarse centroids (ONE partial-
aggregatable argmax pass — map-side combine collapses the K candidate rows
per vector before any shuffle), queries probe their n_probe nearest
centroid lists, exact re-rank inside the probed lists. Scan fraction is
~n_probe/K of the corpus per query regardless of corpus size. Centroids are
pluggable (pass a trained k-means codebook at production scale); the
default codebook is the first K corpus vectors — deterministic, so the
driver oracle replays the whole index value-for-value in SQL.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return _dot(a, b) / (_norm(a) * _norm(b))


def _rerank_topk(cands: DataFrame, k: int) -> DataFrame:
    """Shared exact re-rank: (qid, qv, vec_id, embedding) candidate rows ->
    (qid, vec_id, cos) top-k per query. The 6-decimal rounding BEFORE the
    rank and the (cos desc, vec_id) tie-break are load-bearing — every
    DuckDB oracle (d5/d6/d11) replays exactly this ordering, so all three
    similarity operators must rank identically."""
    sims = cands.select(
        "qid", "vec_id", F.round(cosine(F.col("qv"), F.col("embedding")), 6).alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), "vec_id")
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 3) -> DataFrame:
    """(qid, vec_id, cos): exact top-k cosine neighbors per query vector."""
    qs = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    cands = corpus.crossJoin(F.broadcast(qs)).filter(F.col("vec_id") != F.col("qid"))
    return _rerank_topk(cands, k)


def _hyperplanes(n_bits: int, dim: int, seed: int = 1234) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).tolist()


def lsh_signature(col: Column, planes: list[list[float]]) -> Column:
    """Integer LSH signature: bit b = sign(dot(v, plane_b))."""
    sig = F.lit(0).cast("long")
    v = _as_double(col)
    for b, plane in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in plane])
        sig = sig + F.when(_dot(v, pl) > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def _probe_masks(n_bits: int, radius: int) -> list[int]:
    """All bit masks of popcount <= radius (multi-probe LSH, Lv et al. 2007).
    Enumerated as bit-position combinations — O(sum C(n_bits, r)) work, so
    wide signatures (n_bits >> 20) stay cheap as long as radius is small."""
    import itertools

    masks = [0]
    for r in range(1, radius + 1):
        masks.extend(
            sum(1 << b for b in bits)
            for bits in itertools.combinations(range(n_bits), r)
        )
    return masks


def ann_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_bits: int = 8,
    dim: int = 64,
    seed: int = 1234,
    n_tables: int = 1,
    probe_radius: int = 0,
) -> DataFrame:
    """(qid, vec_id, cos): approximate top-k via signature-bucket join +
    exact cosine re-rank within the bucket.

    Two recall levers, both preserving the bucket-join (never all-pairs)
    scale shape:
      * n_tables > 1 — independent hash tables (distinct hyperplane seeds);
        a true neighbor is missed only if it misses in EVERY table, so miss
        probability decays geometrically with n_tables. Costs one corpus
        signature pass per table.
      * probe_radius > 0 — multi-probe: each QUERY also looks into all
        buckets within that hamming radius of its own signature. Costs extra
        probe rows on the (small) query side only — the corpus is hashed and
        stored exactly once per table, which is the right trade at 10^12
        vectors where re-hashing the corpus is the expensive part.
    """
    probes = _probe_masks(n_bits, probe_radius)
    qbase = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    # ALL table signatures in ONE corpus pass (round 6, guide §1.2 "remove
    # passes" — the same fusion as dedup.cosine_neardup): the round-5 loop
    # re-scanned and re-hashed the corpus once per table; here the n_tables
    # sig expressions are one projection, posexploded to (tbl, sig), and
    # the bucket join key becomes (tbl, sig). Per-table candidate sets are
    # identical; the corpus is read once. The (small) query side carries
    # its table index through the same explode.
    all_planes = [_hyperplanes(n_bits, dim, seed + 7919 * t) for t in range(n_tables)]
    c = corpus.select(
        "vec_id",
        "embedding",
        F.posexplode(
            F.array(*[lsh_signature(F.col("embedding"), pl) for pl in all_planes])
        ).alias("tbl", "sig"),
    )
    # multi-probe WITHOUT expression blow-up (round 6): the round-5 form
    # rebuilt the full n_bits-dot qsig expression once per probe mask —
    # sum(C(n_bits, r<=radius)) copies per table, each embedding every
    # hyperplane as array literals. At d6's parameters (8 bits, radius 3,
    # 6 tables) that was 558 copies ≈ 3*10^5 literal nodes, and the query
    # spent ~40s in CATALYST ANALYSIS on a 500-row fixture (measured —
    # the stages themselves were sub-second). Evaluate each table's qsig
    # ONCE per row, then XOR the column VALUE against a small literal
    # mask array with transform(): plan size O(tables*bits + masks),
    # identical probe set.
    mask_arr = F.array(*[F.lit(int(m)).cast("long") for m in probes])
    qs = (
        qbase.select(
            "qid",
            "qv",
            F.posexplode(
                F.array(*[lsh_signature(F.col("qv"), pl) for pl in all_planes])
            ).alias("tbl", "qsig"),
        )
        .select(
            "qid",
            "qv",
            "tbl",
            F.explode(
                F.transform(mask_arr, lambda m: F.col("qsig").bitwiseXOR(m))
            ).alias("sig"),
        )
    )
    cands = (
        c.join(F.broadcast(qs), ["tbl", "sig"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "qv", "vec_id", "embedding")
        .dropDuplicates(["qid", "vec_id"])
    )
    return _rerank_topk(cands, k)


def kmeans_codebook(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 5,
    dim: int | None = None,
    sample_frac: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """d12 — train an IVF codebook with Lloyd iterations under cosine
    assignment, entirely as partial-aggregatable DataFrame jobs. Returns a
    K-row DataFrame (cid BIGINT, cv ARRAY<DOUBLE>) that plugs straight into
    ``ann_ivf(centroids=...)``. Promoted from tools/ann_recall_sweep.py's
    private driver-side copy (round-4 verdict #3): IVF recall tracks
    quantizer quality (trained 0.77 vs firstk 0.385 at equal 6% scan —
    COVERAGE.md), so production callers need training as a first-class
    operator, not a bring-your-own array.

    Scale shape per Lloyd iteration (MLlib-style): assignment is the same
    ONE-pass broadcast-centroid argmax as ann_ivf (``max(struct(sim,-cid))``
    collapses the K-way fan-out map-side before any shuffle); the centroid
    update is ``groupBy(cid)`` over ``dim`` codegen'd AVG columns — partial
    aggregation ships at most K x dim partials per map task, and only the
    K result rows (the new codebook) ever reach the driver. With
    ``sample_frac`` the whole loop runs on a seeded sample — at 10^12
    vectors you train on ~10^5-10^6 rows and assign the full corpus once,
    inside ann_ivf.

    Determinism (driver-oracle contract, same tricks as d11): init = the
    first ``k`` corpus vectors BY vec_id (cid = that vec_id); assignment
    rounds cosines to 6 decimals before the argmax with smaller-cid
    tie-break; each new centroid coordinate is ROUND(avg, 6) so the next
    iteration's inputs are decimal-exact on every engine; an empty cluster
    keeps its previous centroid unchanged. The DuckDB oracle replays the
    full training loop value-for-value.
    """
    if dim is None:
        dim = len(corpus.select("embedding").first()[0])
    data = corpus.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("v"))
    if sample_frac is not None:
        data = data.sample(fraction=sample_frac, seed=seed)
    data = data.persist()  # consumed once per Lloyd iteration

    cent_rows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in corpus.orderBy("vec_id").limit(k).select("vec_id", "embedding").collect()
    ]
    spark = corpus.sparkSession
    for _ in range(iters):
        cent = spark.createDataFrame(cent_rows, "cid long, cv array<double>")
        csim = F.round(cosine(F.col("v"), F.col("cv")), 6)
        assigned = (
            data.crossJoin(F.broadcast(cent))
            .select("vid", "v", "cid", csim.alias("csim"))
            .groupBy("vid")
            .agg(
                F.max(F.struct(F.col("csim"), (-F.col("cid")).alias("ncid"))).alias("b"),
                F.first("v").alias("v"),
            )
            .select((-F.col("b.ncid")).alias("cid"), "v")
        )
        means = assigned.groupBy("cid").agg(
            *[
                F.round(F.avg(F.col("v")[i].cast("double")), 6).alias(f"m{i}")
                for i in range(dim)
            ]
        )
        # K tiny rows to the driver (the new codebook) — deliberately NOT
        # re-rounded here: the collected doubles ARE the 6dp-rounded values
        got = {int(r["cid"]): [float(r[f"m{i}"]) for i in range(dim)] for r in means.collect()}
        cent_rows = [(cid, got.get(cid, cv)) for cid, cv in cent_rows]
    data.unpersist()
    return spark.createDataFrame(cent_rows, "cid long, cv array<double>")


def ann_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: "np.ndarray | DataFrame | None" = None,
) -> DataFrame:
    """(qid, vec_id, cos): approximate top-k via an IVF (inverted-file) index.

    Index build = ONE pass over the corpus: cross the corpus with the K
    broadcast centroids and take argmax cosine per vector with a partial-
    aggregatable ``max(struct(sim, -cid))`` — each map task emits at most
    one partial row per vector, so the K-way fan-out never reaches a
    shuffle. Query = the same argmax on the (small) query side keeping the
    top ``n_probe`` centroids, then an equi-join on the centroid id against
    the assigned corpus and an exact cosine re-rank. Per query the scan
    volume is the n_probe probed lists (~``n_probe/K`` of the corpus,
    independent of corpus size) — never all-pairs.

    ``centroids``: optional trained codebook — either a (K, dim) float
    array or a ``kmeans_codebook`` result DataFrame (cid, cv) — at
    production scale (recall tracks quantizer quality; the machinery is
    identical). Default: the first ``n_centroids`` corpus vectors by
    ``vec_id`` — a deterministic codebook the driver oracle replays
    value-for-value in DuckDB. Similarities are rounded to 6 decimals
    BEFORE every argmax/rank (ties then break on id), so the assignment is
    reproducible across engines and partitionings.
    """
    if isinstance(centroids, DataFrame):
        cent = centroids.select(
            F.col("cid").cast("long").alias("cid"),
            F.col("cv").cast("array<double>").alias("cv"),
        )
    elif centroids is not None:
        import pandas as pd

        spark = corpus.sparkSession
        cent = spark.createDataFrame(
            pd.DataFrame(
                {
                    "cid": range(len(centroids)),
                    "cv": [[float(x) for x in row] for row in centroids],
                }
            )
        ).select(
            F.col("cid").cast("long").alias("cid"),
            F.col("cv").cast("array<double>").alias("cv"),
        )
    else:
        # genuinely the first K BY vec_id (TakeOrdered — cheap), not an
        # id-value filter: corpora whose ids are not 0-based (sharded /
        # re-keyed tables) would otherwise yield an EMPTY codebook and a
        # silently empty result. The d11 DuckDB oracle replays exactly
        # this (ORDER BY vec_id LIMIT K), so the replay holds on re-keyed
        # corpora too, not just 0-based ones.
        cent = corpus.orderBy("vec_id").limit(n_centroids).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
        )

    csim = F.round(cosine(F.col("embedding"), F.col("cv")), 6)
    assigned = (
        corpus.crossJoin(F.broadcast(cent))
        .select("vec_id", "embedding", "cid", csim.alias("csim"))
        .groupBy("vec_id")
        .agg(
            F.max(F.struct(F.col("csim"), (-F.col("cid")).alias("ncid"))).alias("b"),
            F.first("embedding").alias("embedding"),
        )
        .select("vec_id", "embedding", (-F.col("b.ncid")).alias("cid"))
    )

    qbase = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    qsim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    wq = Window.partitionBy("qid").orderBy(F.col("qsim").desc(), "cid")
    qprobes = (
        qbase.crossJoin(F.broadcast(cent))
        .select("qid", "qv", "cid", qsim.alias("qsim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("qid", "qv", "cid")
    )

    cands = assigned.join(F.broadcast(qprobes), "cid").filter(
        F.col("vec_id") != F.col("qid")
    )
    return _rerank_topk(cands, k)
