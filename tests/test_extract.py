"""Stage-A acceptance: byte-identical text per url + exact edge recovery
(BASELINE.json:15 per-row invariant)."""

import pandas as pd
from pyspark.sql import functions as F

from scalemine_spark.extract import (
    extract_doc_text,
    extract_edge_urls,
    extract_edges,
    extract_hrefs_batch,
    extract_text_batch,
    normalize_url_batch,
    normalize_url_simple,
    url_id,
)


def test_text_byte_identity_spark(spark, pages_small):
    """X1: engine-extracted text == reference text column, for EVERY url."""
    pages, _ = pages_small
    derived = extract_doc_text(pages).withColumnRenamed("text", "etext")
    bad = (
        pages.join(derived.dropDuplicates(["url"]), "url")
        .filter(~(F.col("text").eqNullSafe(F.col("etext"))))
        .count()
    )
    assert bad == 0


def test_edges_exact_recovery(spark, pages_small):
    """X2+X3: normalized (src_url, dst_url) == generator ground truth."""
    pages, expected = pages_small
    got = extract_edge_urls(pages)
    sym_diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym_diff == 0
    assert got.count() == expected.count()


def test_edge_ids_match_xxhash(spark, pages_small):
    pages, expected = pages_small
    ids = extract_edges(pages)
    exp_ids = expected.select(
        url_id(F.col("src_url")).alias("src"), url_id(F.col("dst_url")).alias("dst")
    ).dropDuplicates().filter(F.col("src") != F.col("dst"))
    assert ids.exceptAll(exp_ids).count() == 0
    assert exp_ids.exceptAll(ids).count() == 0


def test_extraction_idempotent_on_recrawl(spark, pages_small):
    """Same url crawled twice (identical html) -> one text value."""
    pages, _ = pages_small
    n = (
        extract_doc_text(pages)
        .groupBy("url")
        .agg(F.countDistinct("text").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert n == 0


def test_unescape_and_entities():
    s = pd.Series(["<html><body><p>a &amp; b &lt;tag&gt; &#65;&#x42;</p></body></html>".encode()])
    assert extract_text_batch(s).iloc[0] == "a & b <tag> AB"


def test_multiblock_join():
    html = b"<html><body><p>one</p><p>two</p><p>three</p></body></html>"
    assert extract_text_batch(pd.Series([html])).iloc[0] == "one\ntwo\nthree"


def test_no_paragraphs():
    assert extract_text_batch(pd.Series([b"<html><body>nope</body></html>"])).iloc[0] == ""


def test_href_extraction_forms():
    html = b'<html><body><a href="https://X.org/A">x</a><a class="z" href=\'/rel\'>y</a></body></html>'
    assert extract_hrefs_batch(pd.Series([html])).iloc[0] == ["https://X.org/A", "/rel"]


def test_normalize_rules():
    base = pd.Series(["https://h1.example.org/p/10"] * 5)
    href = pd.Series(
        [
            "https://H2.EXAMPLE.ORG/p/3#frag",  # lowercase host, strip fragment
            "/p/7",  # abs-path vs base host
            "sub/page",  # relative vs base dir
            "//h3.example.org/q",  # protocol-relative
            "HTTPS://h4.example.org/Q?a=1#x",  # scheme lower, path case kept
        ]
    )
    out = normalize_url_batch(base, href).tolist()
    assert out == [
        "https://h2.example.org/p/3",
        "https://h1.example.org/p/7",
        "https://h1.example.org/p/sub/page",
        "https://h3.example.org/q",
        "https://h4.example.org/Q?a=1",
    ]


def test_normalize_simple_column(spark):
    df = spark.createDataFrame(
        [("HTTPS://Host.ORG/Path#frag",), ("https://a.b/c?q=1#z",)], ["u"]
    )
    got = [r[0] for r in df.select(normalize_url_simple(F.col("u"))).collect()]
    assert got == ["https://host.org/Path", "https://a.b/c?q=1"]
