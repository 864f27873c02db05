"""Near-duplicate detection operators (training-data pipeline surface).

All JVM-side: shingling via split/explode, hashing via xxhash64 (fast
production path) or an md5-derived 60-bit integer (oracle-parity path — DuckDB
computes ('0x'||substr(md5(x),1,15))::BIGINT identically, so the driver's
correctness gate can replay MinHash/SimHash value-for-value). No Python UDFs
anywhere — at 10^12 docs these are plain shuffles with map-side partial
aggregation; candidate pairs only ever meet inside an LSH bucket, never via an
all-pairs product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# \x1f (unit separator) joins hash inputs; it never occurs in the fixtures'
# whitespace-split tokens, so (shingle, perm) packing is injective in practice.
_SEP = "\x1f"


def md5_60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT. DuckDB-reproducible:
    ('0x' || substr(md5(x), 1, 15))::BIGINT — used by the oracle-parity
    variants of MinHash/SimHash so the driver can check exact values."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _hash64(col: Column, hasher: str) -> Column:
    if hasher == "xxhash64":
        return F.xxhash64(col)
    if hasher == "md5":
        return md5_60(col)
    raise ValueError(f"unknown hasher {hasher!r}")


def _word_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    sep: str = r"\s+",
) -> DataFrame:
    """(id, shingle) — n-gram word shingles, distinct per doc."""
    words = F.split(F.col(text_col), sep)
    idx = F.sequence(F.lit(0), F.greatest(F.size(F.col("w")) - n, F.lit(0)))
    return (
        docs.select(F.col(id_col).alias("id"), words.alias("w"))
        .select("id", F.explode(idx).alias("i"), "w")
        .select("id", F.concat_ws(" ", F.slice(F.col("w"), F.col("i") + 1, n)).alias("shingle"))
        .dropDuplicates(["id", "shingle"])
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    hasher: str = "xxhash64",
    sep: str = r"\s+",
) -> DataFrame:
    """(id, perm, minhash): K independent permutations simulated by
    hash(shingle, perm). One explode + one groupBy — the standard scalable
    formulation (map-side partial MIN keeps hot shingles cheap)."""
    sh = _word_shingles(docs, n=n, sep=sep)
    perms = sh.withColumn("perm", F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))))
    if hasher == "xxhash64":
        h = F.xxhash64("shingle", "perm")
    else:
        h = md5_60(F.concat(F.col("shingle"), F.lit(_SEP), F.col("perm").cast("string")))
    return perms.groupBy("id", "perm").agg(F.min(h).alias("minhash"))


def _banded(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, band, band_key STRING) — band key is the comma-joined minhash run
    in perm order (string, not re-hashed: DuckDB reproduces it exactly via
    string_agg(mh, ',' ORDER BY perm))."""
    rows_per_band = num_hashes // bands
    return (
        sig.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("perm", "minhash"))),
                    lambda x: x["minhash"].cast("string"),
                ),
            ).alias("band_key")
        )
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    hasher: str = "xxhash64",
    sep: str = r"\s+",
) -> DataFrame:
    """(id1, id2, n_bands) candidate near-dup pairs: band the K minhashes into
    `bands` groups, self-join on (band, band_key). Pairs only ever meet inside
    a bucket -> no quadratic blowup at scale."""
    banded = _banded(minhash_signatures(docs, num_hashes, n, hasher, sep), num_hashes, bands)
    a = banded.select(F.col("id").alias("id1"), "band", "band_key")
    b = banded.select(F.col("id").alias("id2"), F.col("band").alias("band2"), F.col("band_key").alias("bk2"))
    pairs = a.join(b, (a.band == b.band2) & (a.band_key == b.bk2) & (a.id1 < b.id2))
    return pairs.groupBy("id1", "id2").agg(F.count("*").alias("n_bands"))


def word_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", sep: str = r"\s+") -> DataFrame:
    """(id, ws ARRAY<STRING>) distinct word set per doc."""
    return docs.select(F.col(id_col).alias("id"), F.array_distinct(F.split(F.col(text_col), sep)).alias("ws"))


def minhash_near_dups(
    docs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 8,
    n: int = 1,
    hasher: str = "xxhash64",
    sep: str = r"\s+",
) -> DataFrame:
    """(id1, id2, jaccard) — LSH candidates re-ranked with the exact word-set
    Jaccard, keeping pairs >= threshold. The scale shape: candidate generation
    is bucketed (never all-pairs); the exact Jaccard runs only on candidates.
    """
    cand = minhash_lsh_candidates(docs, num_hashes, bands, n, hasher, sep).select("id1", "id2")
    ws = word_sets(docs, sep=sep)
    w1 = ws.select(F.col("id").alias("id1"), F.col("ws").alias("ws1"))
    w2 = ws.select(F.col("id").alias("id2"), F.col("ws").alias("ws2"))
    inter = F.size(F.array_intersect("ws1", "ws2"))
    union = F.size("ws1") + F.size("ws2") - inter
    jac = inter.cast("double") / union
    return (
        cand.join(w1, "id1")
        .join(w2, "id2")
        .filter(jac >= threshold)
        .select("id1", "id2", F.round(jac, 6).alias("jaccard"))
    )


def cosine_neardup(
    vectors: DataFrame,
    threshold: float = 0.8,
    n_bits: int = 6,
    n_tables: int = 4,
    dim: int | None = None,
    seed: int = 4242,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """(a_id, b_id, cos) — embedding-cosine near-duplicate pairs: the last
    dedup family next to exact (d1), n-gram Jaccard (d2), MinHash+LSH (d3)
    and SimHash (d4). Random-hyperplane LSH buckets candidates (pairs only
    ever meet inside a bucket of one of ``n_tables`` independent tables —
    never all-pairs), then the exact cosine runs on candidates only and
    keeps pairs with ROUND(cos, 6) >= threshold.

    Scale shape at 10^12 vectors: the corpus is hashed once per table
    (n_tables * n_bits JVM-side dot products per row, whole-stage
    codegen'd — no Python), the self-join shuffles on the signature, and
    recall is tuned like any LSH scheme: more tables -> geometrically
    fewer misses, fewer bits -> bigger buckets. ``max_bucket`` is the skew
    guard: buckets larger than it (degenerate near-constant regions — the
    web's zero vectors and boilerplate embeddings) are dropped from
    candidate generation rather than exploding quadratically; their
    members are trivially groupable by exact hash (d1) instead.

    Oracle parity: hyperplanes are seeded-numpy constants embedded as
    array literals and every dot-product sign is taken on ROUND(dot, 6),
    so DuckDB replays signatures, buckets, candidates and the final
    cosines value-for-value (same trick family as d3/d4's md5 hasher).
    """
    from scalemine_spark.operators.similarity import _dot, _hyperplanes, _norm

    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    base = vectors.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )

    # ALL table signatures in ONE pass over the corpus (round 6, guide
    # §1.2 "remove passes"): the round-5 form looped per table, re-scanning
    # the vector column n_tables times; here the n_tables sig expressions
    # are computed in a single projection and posexploded to
    # (id, tbl, sig) rows. Buckets, the skew guard, and the self-join key
    # become (tbl, sig) — identical per-table candidate sets, one scan.
    sig_exprs = []
    for ti in range(n_tables):
        planes = _hyperplanes(n_bits, dim, seed + 7919 * ti)
        sig = F.lit(0).cast("long")
        for b, plane in enumerate(planes):
            pl = F.array(*[F.lit(float(x)) for x in plane])
            sig = sig + F.when(
                F.round(_dot(F.col("v"), pl), 6) > 0, F.lit(2**b).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        sig_exprs.append(sig)
    sigs = base.select(
        "id", F.posexplode(F.array(*sig_exprs)).alias("tbl", "sig")
    )
    if max_bucket is not None:
        ok = sigs.groupBy("tbl", "sig").count().filter(F.col("count") <= max_bucket)
        sigs = sigs.join(ok.select("tbl", "sig"), ["tbl", "sig"])
    a = sigs.select(F.col("id").alias("a_id"), "tbl", "sig")
    b_ = sigs.select(
        F.col("id").alias("b_id"), F.col("tbl").alias("tbl2"), F.col("sig").alias("sig2")
    )
    cand = (
        a.join(b_, (a.tbl == b_.tbl2) & (a.sig == b_.sig2) & (a.a_id < b_.b_id))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )

    va = base.select(F.col("id").alias("a_id"), F.col("v").alias("va"))
    vb = base.select(F.col("id").alias("b_id"), F.col("v").alias("vb"))
    cos = F.round(
        _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))), 6
    )
    return (
        cand.join(va, "a_id")
        .join(vb, "b_id")
        .filter(cos >= threshold)
        .select("a_id", "b_id", cos.alias("cos"))
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 64,
    hasher: str = "xxhash64",
    sep: str = r"\s+",
) -> DataFrame:
    """(id, simhash BIGINT): SimHash — per word-feature hash, sum the +1/-1
    votes per bit position, take the sign. Pure columnar: one explode + one
    groupBy with n_bits codegen'd SUMs — stays whole-stage-codegen'd.

    hasher='md5' with n_bits<=60 is the oracle-parity variant (DuckDB
    reproduces the identical hash, votes, and final simhash value in SQL).
    """
    if hasher == "md5" and n_bits > 60:
        raise ValueError("md5 hasher provides 60 bits")
    words = (
        docs.select(F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), sep)).alias("w"))
        .filter(F.length("w") > 0)
        .withColumn("h", _hash64(F.col("w"), hasher))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(n_bits)
    ]
    agg = words.groupBy("id").agg(*votes)
    sim = F.lit(0).cast("long")
    for b in range(n_bits):
        weight = 2**b if b < 63 else -(2**63)
        sim = sim + F.when(F.col(f"b{b}") > 0, F.lit(weight).cast("long")).otherwise(0)
    return agg.select("id", sim.alias("simhash"))
