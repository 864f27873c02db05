"""Repetition-quality filters and benchmark-contamination checks
(training-data-pipeline mandate).

Two canonical pre-training curation passes that every large web-corpus
pipeline runs (the Gopher/MassiveText "repetition" rules and the
benchmark-decontamination n-gram overlap pass), re-expressed Spark-first:

* ``repetition_metrics`` / ``repetition_filter`` — per-document
  duplicate-token fraction and top-bigram fraction computed as a PURE
  NARROW MAP: tokenize, ``array_distinct``, and a higher-order
  ``aggregate`` run-length scan over the *sorted* per-row bigram array.
  Zero shuffles, zero Python — at 10^12 documents this is a single scan
  whose cost is the tokenizer. (The obvious alternative — explode bigrams
  and groupBy (doc, ngram) — shuffles ~|tokens| rows per document; the
  in-row scan never leaves the row.) ``repetition_filter`` keeps the
  ORIGINAL document columns (the filter is a narrow projection + predicate
  on the same row — no join back to the corpus is ever needed).

* ``ngram_contamination`` — fraction of each document's distinct word
  n-grams that appear in a benchmark/eval n-gram set. The per-document
  gram TOTAL is a narrow in-row ``size(array_distinct(...))`` (no explode,
  no shuffle), so every document keeps a row for free — only the matched
  count touches an exploded side: distinct grams per row, hashed to a
  60-bit md5-derived integer (operators/dedup.py:md5_60) so the shuffle
  moves 8-byte keys instead of strings AND DuckDB replays the exact same
  join. The benchmark set is distinct-deduped before the join; when small
  it broadcasts (eval benchmarks are ~10^6 n-grams — always
  broadcastable), otherwise a plain hash join on the 64-bit key. The
  tokenizer runs once per branch (totals map, matched explode) — two
  narrow passes, nothing quadratic, no driver-side work.

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
from scalemine_spark.operators.text import tokenize


def _ngrams(toks_col_name: str, n: int) -> Column:
    """In-row word n-gram array over a token-array COLUMN NAME: space-joined
    windows of n consecutive tokens; empty below n tokens. One builder for
    every gram consumer in this module (d17 bigrams, d18 trigrams), so the
    gram semantics cannot drift apart."""
    parts = ", ".join(f"{toks_col_name}[i + {j}]" for j in range(n))
    return F.expr(
        f"CASE WHEN size({toks_col_name}) >= {n} THEN "
        f"transform(sequence(0, size({toks_col_name}) - {n}), i -> concat_ws(' ', {parts})) "
        "ELSE array() END"
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


def _with_repetition_metrics(docs: DataFrame, text_col: str) -> DataFrame:
    """docs + (n_tokens, dup_token_frac_n, top_bigram_frac_n) as extra
    columns — one narrow projection, no shuffle, original columns kept."""
    return (
        # NULL text: Spark's size(NULL array) is -1 (legacy sizeOfNull) while
        # the DuckDB oracles take the NULL->0 path — coalesce to an empty
        # token array so n_tokens is 0 on both engines (latent-only today:
        # the fixtures carry no NULL texts; round-5 advisory).
        docs.withColumn(
            "_w",
            F.coalesce(tokenize(F.col(text_col)), F.array().cast("array<string>")),
        )
        .withColumn("_n_tokens", F.size("_w"))
        .withColumn("_nd", F.size(F.array_distinct("_w")))
        .withColumn("_top", _max_run_of_sorted(_ngrams("_w", 2)))
        .withColumn("n_tokens", F.col("_n_tokens").cast("long"))
        .withColumn(
            "dup_token_frac_n",
            F.expr(
                "CASE WHEN _n_tokens > 0 THEN "
                "(1000000000L * (_n_tokens - _nd)) div _n_tokens ELSE 0L END"
            ),
        )
        .withColumn(
            "top_bigram_frac_n",
            F.expr(
                "CASE WHEN _n_tokens > 1 THEN "
                "(1000000000L * _top) div (_n_tokens - 1) ELSE 0L END"
            ),
        )
        .drop("_w", "_n_tokens", "_nd", "_top")
    )


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
    return _with_repetition_metrics(docs, text_col).select(
        F.col(id_col).alias("doc_id"),
        "n_tokens",
        "dup_token_frac_n",
        "top_bigram_frac_n",
    )


def repetition_filter(
    docs: DataFrame,
    max_dup_token_frac_n: int = 300_000_000,
    max_top_bigram_frac_n: int = 180_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The documents (ORIGINAL columns, text included) that PASS the
    repetition gate (Gopher-style thresholds: defaults 0.30 duplicate-token
    fraction, 0.18 top-bigram fraction). The metrics are computed as extra
    columns on the same narrow projection and dropped after the predicate —
    still zero shuffles, and no join back to the corpus."""
    m = _with_repetition_metrics(docs, text_col)
    return m.filter(
        (F.col("dup_token_frac_n") <= F.lit(max_dup_token_frac_n))
        & (F.col("top_bigram_frac_n") <= F.lit(max_top_bigram_frac_n))
    ).select(*docs.columns)


def _distinct_gram_hashes(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, gram_h) — md5-60 hash of each DISTINCT word n-gram per doc.
    Distinctness is array_distinct BEFORE the explode, so the exploded row
    count is bounded by distinct grams, not token count."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("_w"))
        .select("doc_id", F.explode(F.array_distinct(_ngrams("_w", n))).alias("gram"))
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
    has no n-gram of length ``n`` — such documents still get a row, for
    free, because the totals side is the corpus itself).

    Scale plan: gram totals are a NARROW per-row map (size of the in-row
    distinct-gram array — no explode, no shuffle, no re-aggregation);
    only the matched count explodes, joins the distinct-deduped (and by
    default broadcast) benchmark gram set on the 8-byte md5-60 key, and
    partial-aggregates per doc. One left join stitches the two. Nothing
    quadratic, nothing driver-side, no Python.
    """
    totals = docs.select(
        F.col(id_col).alias("doc_id"),
        # same NULL-text guard as _with_repetition_metrics: without it
        # size(array_distinct(...)) is -1 for NULL text on Spark only
        F.coalesce(tokenize(F.col(text_col)), F.array().cast("array<string>")).alias("_w"),
    ).select(
        "doc_id",
        F.size(F.array_distinct(_ngrams("_w", n))).cast("long").alias("n_grams"),
    )
    bg = (
        _distinct_gram_hashes(benchmark, n, bench_id_col, bench_text_col)
        .select("gram_h")
        .distinct()
    )
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    matched = (
        _distinct_gram_hashes(docs, n, id_col, text_col)
        .join(bg, "gram_h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched"))
    )
    return totals.join(matched, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("n_matched"), F.lit(0)).cast("long").alias("n_matched"),
        F.expr(
            "CASE WHEN n_grams > 0 THEN "
            "(1000000000L * coalesce(n_matched, 0L)) div n_grams ELSE 0L END"
        ).alias("contamination_frac_n"),
    )
