"""Repetition-quality filters and benchmark-contamination checks
(training-data-pipeline mandate).

Two canonical pre-training curation passes that every large web-corpus
pipeline runs (the Gopher/MassiveText "repetition" rules and the
benchmark-decontamination n-gram overlap pass), re-expressed Spark-first:

* ``repetition_metrics`` — per-document duplicate-token fraction and
  top-bigram fraction computed as a PURE NARROW MAP: tokenize,
  ``array_distinct``, and a higher-order ``aggregate`` run-length scan
  over the *sorted* per-row bigram array. Zero shuffles, zero Python —
  at 10^12 documents this is a single scan whose cost is the tokenizer.
  (The obvious alternative — explode bigrams and groupBy (doc, ngram) —
  shuffles ~|tokens| rows per document; the in-row scan never leaves the
  row.)

* ``ngram_contamination`` — fraction of each document's distinct word
  n-grams that appear in a benchmark/eval n-gram set. The document side
  explodes DISTINCT n-grams only; the join key is a 60-bit md5-derived
  integer (operators/dedup.py:md5_60) so the shuffle moves 8-byte keys
  instead of strings AND DuckDB replays the exact same join. The
  benchmark set is distinct-deduped before the join; when small it
  broadcasts (eval benchmarks are ~10^6 n-grams — always broadcastable),
  otherwise a plain hash join on the 64-bit key.

Exactness contract (the pattern proven by d13/d16): every reported
fraction is a BIGINT nano-fraction ``(1e9 * num) div den`` — integer
arithmetic end-to-end, so values replay exactly under any partitioning,
merge order, or engine (Spark `div` and DuckDB `//` agree on
non-negative integers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scalemine_spark.operators.dedup import md5_60

_TOKEN_RE = "[a-z0-9]+"


def _tokens(text_col: Column) -> Column:
    return F.regexp_extract_all(F.lower(text_col), F.lit(_TOKEN_RE), 0)


def _bigrams(toks: Column) -> Column:
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def _max_run_of_sorted(arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED string array —
    i.e. the max multiplicity of any element — via one higher-order
    ``aggregate`` scan. 0 for an empty array. Runs entirely inside the
    row: no explode, no shuffle."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc.prev), acc.run + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc.best, run).alias("best")
        )

    return F.aggregate(F.array_sort(arr), init, step, lambda acc: acc.best)


def repetition_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals: (id, n_tokens, dup_token_frac_n,
    top_bigram_frac_n) with nano-fraction BIGINTs.

    dup_token_frac_n  = 1e9 * (n_tokens - n_distinct_tokens) div n_tokens
    top_bigram_frac_n = 1e9 * max_bigram_multiplicity div (n_tokens - 1)

    Both 0 for degenerate (empty / single-token) documents. Plan: one
    narrow projection — tokenizer, array_distinct, sorted-run scan — no
    shuffle, no Python, no per-document state off-row.
    """
    toks = _tokens(F.col(text_col))
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_w"),
    ).select(
        "doc_id",
        F.size("_w").alias("n_tokens"),
        F.size(F.array_distinct("_w")).alias("_nd"),
        _max_run_of_sorted(_bigrams(F.col("_w"))).alias("_top"),
    )
    return d.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.expr(
            "CASE WHEN n_tokens > 0 THEN (1000000000L * (n_tokens - _nd)) div n_tokens "
            "ELSE 0L END"
        ).alias("dup_token_frac_n"),
        F.expr(
            "CASE WHEN n_tokens > 1 THEN (1000000000L * _top) div (n_tokens - 1) "
            "ELSE 0L END"
        ).alias("top_bigram_frac_n"),
    )


def repetition_filter(
    docs: DataFrame,
    max_dup_token_frac_n: int = 300_000_000,
    max_top_bigram_frac_n: int = 180_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents that PASS the repetition gate (Gopher-style thresholds:
    defaults 0.30 duplicate-token fraction, 0.18 top-bigram fraction).
    Pure filter over the narrow-map metrics — still zero shuffles."""
    m = repetition_metrics(docs, id_col=id_col, text_col=text_col)
    return m.filter(
        (F.col("dup_token_frac_n") <= F.lit(max_dup_token_frac_n))
        & (F.col("top_bigram_frac_n") <= F.lit(max_top_bigram_frac_n))
    )


def _distinct_ngrams(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, gram_h) — md5-60 hash of each DISTINCT word n-gram per doc.
    n-gram build is an in-row transform over the token array; distinctness
    is array_distinct BEFORE the explode, so the exploded row count is
    bounded by distinct grams, not token count."""
    toks = _tokens(F.col(text_col))
    parts = ", ".join(f"_w[i + {j}]" for j in range(n))
    grams = F.expr(
        f"CASE WHEN size(_w) >= {n} THEN "
        f"transform(sequence(0, size(_w) - {n}), i -> concat_ws(' ', {parts})) "
        "ELSE array() END"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_w"))
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("gram"))
        .select("doc_id", md5_60(F.col("gram")).alias("gram_h"))
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document benchmark-contamination: (doc_id, n_grams, n_matched,
    contamination_frac_n) where contamination_frac_n = 1e9 * n_matched div
    n_grams over the document's DISTINCT word n-grams (0 when the document
    has no n-gram of length ``n``).

    Scale plan: the benchmark side is distinct-deduped to its gram set and
    (by default) broadcast — eval suites are tiny next to the corpus; the
    corpus side is one explode of per-row-distinct grams, one inner join
    on the 8-byte md5-60 key, and two hash aggregates (matched count;
    total count), both partial-agg map-side. Nothing quadratic, nothing
    driver-side, no Python.
    """
    dg = _distinct_ngrams(docs, n, id_col, text_col)
    bg = (
        _distinct_ngrams(benchmark, n, bench_id_col, bench_text_col)
        .select("gram_h")
        .distinct()
    )
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    totals = dg.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    matched = (
        dg.join(bg, "gram_h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched"))
    )
    out = totals.join(matched, "doc_id", "left").select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.coalesce(F.col("n_matched"), F.lit(0)).cast("long").alias("n_matched"),
    )
    # docs too short to have any n-gram still get a row (n_grams = 0)
    short = docs.select(F.col(id_col).alias("doc_id")).join(
        out.select("doc_id"), "doc_id", "left_anti"
    )
    out = out.unionByName(
        short.select(
            "doc_id", F.lit(0).cast("long").alias("n_grams"), F.lit(0).cast("long").alias("n_matched")
        )
    )
    return out.select(
        "doc_id",
        "n_grams",
        "n_matched",
        F.expr(
            "CASE WHEN n_grams > 0 THEN (1000000000L * n_matched) div n_grams ELSE 0L END"
        ).alias("contamination_frac_n"),
    )
