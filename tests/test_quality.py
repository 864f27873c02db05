"""Repetition-quality metrics and n-gram contamination (operators/quality.py).

Hand-computed ground truth on tiny corpora; the d17/d18 driver rows carry
the full value-level DuckDB replay at sf0.01."""

import pytest
from pyspark.sql import functions as F

from scalemine_spark.operators.quality import (
    ngram_contamination,
    repetition_filter,
    repetition_metrics,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_metrics_hand_computed(spark):
    d = _docs(
        spark,
        [
            # 6 tokens, 3 distinct -> dup = 3/6; bigrams: "a b","b a","a b",
            # "b a","a c" -> top multiplicity 2 of 5
            (1, "a b a b a c"),
            # all-unique tokens: dup 0; all bigrams unique -> top 1/3
            (2, "w x y z"),
            # single token: no bigram, no dup
            (3, "solo"),
            # empty text
            (4, ""),
            # pathological repetition: "spam spam spam spam"
            (5, "spam spam spam spam"),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_metrics(d).collect()}
    assert got[1]["n_tokens"] == 6
    assert got[1]["dup_token_frac_n"] == 1_000_000_000 * 3 // 6
    assert got[1]["top_bigram_frac_n"] == 1_000_000_000 * 2 // 5
    assert got[2]["dup_token_frac_n"] == 0
    assert got[2]["top_bigram_frac_n"] == 1_000_000_000 // 3
    assert got[3] == {
        "doc_id": 3, "n_tokens": 1, "dup_token_frac_n": 0, "top_bigram_frac_n": 0
    }
    assert got[4] == {
        "doc_id": 4, "n_tokens": 0, "dup_token_frac_n": 0, "top_bigram_frac_n": 0
    }
    # 4x spam: dup 3/4, top bigram "spam spam" 3/3
    assert got[5]["dup_token_frac_n"] == 750_000_000
    assert got[5]["top_bigram_frac_n"] == 1_000_000_000


def test_repetition_filter_gates_on_both_metrics(spark):
    d = _docs(
        spark,
        [
            (1, "clean text with many distinct interesting words here"),
            (2, "spam spam spam spam spam spam"),  # fails dup gate
            # 0 duplicate tokens but a dominant bigram? impossible without
            # dup tokens — instead exceed the bigram gate via repetition:
            (3, "x y x y x y x y x y"),
        ],
    )
    out = repetition_filter(d)
    assert out.columns == d.columns  # original docs columns, text included
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {1}


def test_repetition_metrics_is_narrow_no_shuffle(spark):
    d = _docs(spark, [(1, "a b c")])
    plan = repetition_metrics(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_ngram_contamination_hand_computed(spark):
    docs = _docs(
        spark,
        [
            # trigrams: "a b c","b c d","c d e" (3 distinct)
            (1, "a b c d e"),
            # repeats collapse: "q q q" x4 tokens -> trigrams {"q q q"} (1)
            (2, "q q q q"),
            (3, "xx yy"),  # too short for a trigram
        ],
    )
    bench = _docs(spark, [(100, "b c d e q q q")])
    # bench trigrams: {"b c d","c d e","d e q","e q q","q q q"}
    got = {r["doc_id"]: r.asDict() for r in ngram_contamination(docs, bench).collect()}
    assert got[1]["n_grams"] == 3 and got[1]["n_matched"] == 2
    assert got[1]["contamination_frac_n"] == 1_000_000_000 * 2 // 3
    assert got[2] == {
        "doc_id": 2, "n_grams": 1, "n_matched": 1,
        "contamination_frac_n": 1_000_000_000,
    }
    assert got[3] == {
        "doc_id": 3, "n_grams": 0, "n_matched": 0, "contamination_frac_n": 0
    }


def test_ngram_contamination_benchmark_broadcast(spark):
    docs = _docs(spark, [(1, "a b c d")])
    bench = _docs(spark, [(2, "b c d")])
    plan = (
        ngram_contamination(docs, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_ngram_contamination_matches_python_on_corpus(spark):
    """Cross-check against a pure-python recount on the sf0.001 documents."""
    import os

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("testdata missing")
    d = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 17 == 0)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_matched"])
        for r in ngram_contamination(d, bench).collect()
    }

    import re

    rows = d.collect()
    tri = {}
    for r in rows:
        w = re.findall("[a-z0-9]+", r["text"].lower())
        tri[r["doc_id"]] = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    bset = set()
    for did, grams in tri.items():
        if did % 17 == 0:
            bset |= grams
    for did, grams in tri.items():
        assert got[did] == (len(grams), len(grams & bset)), did
