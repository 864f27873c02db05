"""Corpus-statistics text operators (training-data-pipeline mandate).

TF-IDF is the workhorse for keyword extraction / document representation
in web-corpus pipelines; at 10^12 docs the plan must be two partial-agg
passes over the exploded token stream plus a per-document top-k window —
never a corpus-wide sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# The corpus tokenizer shared by d14/d16/d17/d18: lowercase [a-z0-9]+ runs.
# This regex class behaves identically under Spark's Java regex and DuckDB's
# RE2 (proven by d14's exact driver row) — any change here must keep that
# cross-engine property, since every oracle replays it.
TOKEN_RE = "[a-z0-9]+"


def tokenize(text_col: Column) -> Column:
    """Token array for the shared corpus tokenizer (see TOKEN_RE note)."""
    return F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_RE), 0)


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document: (doc_id, term, score_n, rk).

    Tokenizer: lowercase [a-z0-9]+ runs (the d14 tokenizer, whose regex
    semantics are identical between Spark's Java regex and DuckDB's RE2
    for this class — proven by d14's exact driver row). Score contract:
    score_n = tf * floor(1e9 * ln(N/df)) — an exact BIGINT (integer tf
    times an integer nano-idf), so per-term scores, ties (broken by term
    asc), and the top-k cut replay exactly under any merge order;
    floor(1e9*ln(N/df)) was verified bit-identical between Spark and
    DuckDB for every (N, df) pair with N in {500, 5000, 50000}, df<=N
    (55,500 rationals, 0 mismatches). Real-valued tf-idf is
    score_n * 1e-9.

    Scale plan: one explode -> two hash aggregates (tf on (doc, term),
    df on term — both partial-agg map-side), one broadcast-size N scalar,
    one join on term, and a per-document row_number window (partition =
    doc) — the only sort is within each document's term list.
    """
    n_docs = docs.count()
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf_n = F.floor(F.lit(1e9) * F.log(F.lit(float(n_docs)) / F.col("df"))).cast(
        "long"
    )
    scored = tf.join(df, "term").select(
        "doc_id", "term", (F.col("tf") * idf_n).alias("score_n")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score_n").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "score_n", "rk")
    )
