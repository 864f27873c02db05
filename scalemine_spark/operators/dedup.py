"""Near-duplicate detection operators (training-data pipeline surface).

All JVM-side: shingling via split/explode, hashing via xxhash64 with
per-permutation seeds (a seed column folded into the hash input), min via
groupBy().min(). No Python UDFs anywhere — at 10^12 docs these are plain
shuffles with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle) — n-gram word shingles, distinct per doc."""
    words = F.split(F.col(text_col), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(F.col("w")) - n, F.lit(0)))
    return (
        docs.select(F.col(id_col).alias("id"), words.alias("w"))
        .select("id", F.explode(idx).alias("i"), "w")
        .select("id", F.concat_ws(" ", F.slice(F.col("w"), F.col("i") + 1, n)).alias("shingle"))
        .dropDuplicates(["id", "shingle"])
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 16, n: int = 3) -> DataFrame:
    """(id, perm, minhash): K independent permutations simulated by
    xxhash64(shingle, perm). One explode + one groupBy — the standard
    scalable formulation."""
    sh = _word_shingles(docs, n=n)
    perms = sh.withColumn("perm", F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))))
    return perms.groupBy("id", "perm").agg(F.min(F.xxhash64("shingle", "perm")).alias("minhash"))


def minhash_lsh_candidates(
    docs: DataFrame, num_hashes: int = 16, bands: int = 4, n: int = 3
) -> DataFrame:
    """(id1, id2, n_bands) candidate near-dup pairs: band the K minhashes into
    `bands` groups, hash each band, self-join on (band, band_hash). Pairs
    only ever meet inside a bucket -> no quadratic blowup at scale."""
    sig = minhash_signatures(docs, num_hashes, n)
    rows_per_band = num_hashes // bands
    banded = (
        sig.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(F.xxhash64(F.sort_array(F.collect_list(F.struct("perm", "minhash")))).alias("band_hash"))
    )
    a = banded.select(F.col("id").alias("id1"), "band", "band_hash")
    b = banded.select(F.col("id").alias("id2"), F.col("band").alias("band2"), F.col("band_hash").alias("bh2"))
    pairs = a.join(
        b, (a.band == b.band2) & (a.band_hash == b.bh2) & (a.id1 < b.id2)
    )
    return pairs.groupBy("id1", "id2").agg(F.count("*").alias("n_bands")).orderBy("id1", "id2")


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash BIGINT): 64-bit SimHash — per word-feature hash, sum the
    +1/-1 votes per bit position, take the sign. Pure columnar: explode words,
    explode 64 bit positions via a compact aggregate over bit masks.

    Implementation detail: instead of exploding 64x, we aggregate per bit via
    SUM(CASE sign) over (shiftright(hash, b) & 1) for b in 0..63 in one pass
    using an array of expressions — stays whole-stage-codegen'd.
    """
    words = (
        docs.select(F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .withColumn("h", F.xxhash64("w"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agg = words.groupBy("id").agg(*votes)
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim + F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(0)
    return agg.select("id", sim.alias("simhash")).orderBy("id")
