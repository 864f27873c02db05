"""Stage A — extraction (SURVEY §2 rows X1-X5).

Everything here is vectorized: Arrow-batched pandas UDFs operating on whole
pandas Series with .str/regex kernels — per-row Python UDFs are banned
(BASELINE.json:15 "vectorized pandas/Arrow UDFs (no per-row Python)").

Text contract (X1, normative per FIXTURES.md B1): the extracted text of a page
is the concatenation of the inner texts of its ``<p>...</p>`` blocks joined by
``"\\n"``, html-entity-decoded, with no other whitespace normalization. The
fixtures generator writes ``pages.text`` directly from the source blocks
(never parsing html); this module re-derives it by parsing ``pages.html``.
The byte-identity acceptance test is meaningful because the two code paths
are independent.

URL normalization contract (X3, normative):
  1. html-entity-decode, strip surrounding whitespace
  2. strip the fragment (first ``#`` to end)
  3. resolve against the page url: ``scheme://...`` absolute as-is;
     ``//host/...`` takes the base scheme; ``/path`` takes the base
     scheme+host; anything else resolves against the base url's directory
     (no ``..`` handling — out of scope, documented)
  4. lowercase the scheme and the host only (path/query preserved)
Only http(s) results become edges.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

# --------------------------------------------------------------------------
# vectorized html-entity decode (applied batch-wise; matches html.unescape for
# the entity set produced by html.escape plus numeric refs)
# --------------------------------------------------------------------------

_NUMERIC_ENT = re.compile(r"&#(x[0-9a-fA-F]+|[0-9]+);")


def _dec_numeric(m: re.Match) -> str:
    v = m.group(1)
    return chr(int(v[1:], 16)) if v[0] in "xX" else chr(int(v))


def unescape_series(s: pd.Series) -> pd.Series:
    """Entity-decode a Series of str. &amp; is decoded LAST so escaped
    sequences like ``&amp;lt;`` do not double-decode (mirrors html.escape
    round-trip)."""
    s = s.str.replace(_NUMERIC_ENT, _dec_numeric, regex=True)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        s = s.str.replace(ent, ch, regex=False)
    return s


def _to_str(html: pd.Series) -> pd.Series:
    """BINARY arrives as a Series of bytes objects; decode utf-8 at C level
    via a pyarrow binary->string cast (no per-row Python). Falls back to a
    python decode with errors='replace' only if the cast rejects the batch
    (invalid utf-8 somewhere).

    Bytes-vs-str is decided from the first NON-null value (a batch whose
    first row is null must still be decoded); nulls pass through the arrow
    cast as nulls, so nullable html columns survive every path."""
    probe = html.dropna()
    if len(probe) == 0 or not isinstance(probe.iloc[0], (bytes, bytearray)):
        return html
    import pyarrow as pa

    try:
        arr = pa.Array.from_pandas(html, type=pa.binary())
        return arr.cast(pa.string()).to_pandas()
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return html.map(
            lambda b: b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else b
        )


# --------------------------------------------------------------------------
# X1 — text extraction: html BINARY -> text STRING (byte-identical per url)
# --------------------------------------------------------------------------

_P_BLOCK = re.compile(r"<p(?:\s[^>]*)?>(.*?)</p>", re.DOTALL | re.IGNORECASE)


def extract_text_batch(html: pd.Series) -> pd.Series:
    s = _to_str(html)
    # findall -> list of inner texts per row; join with "\n"; entity-decode.
    joined = s.str.findall(_P_BLOCK).str.join("\n")
    return unescape_series(joined.fillna(""))


@pandas_udf(StringType())
def extract_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for html in batches:
        yield extract_text_batch(html)


# --------------------------------------------------------------------------
# X2 — href extraction: html BINARY -> ARRAY<STRING> of raw hrefs
# --------------------------------------------------------------------------

_HREF = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"']*)["']""", re.IGNORECASE)


def extract_hrefs_batch(html: pd.Series) -> pd.Series:
    s = _to_str(html)
    found = s.str.findall(_HREF)
    # null html -> findall yields NaN; Arrow needs None for ARRAY<STRING>
    return found.where(found.notna(), None)


@pandas_udf(ArrayType(StringType()))
def extract_hrefs_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for html in batches:
        yield extract_hrefs_batch(html)


# --------------------------------------------------------------------------
# X1+X2 single pass — when a pipeline needs BOTH text and hrefs, decode and
# scan the html once and emit struct(text, hrefs) in one Arrow crossing.
# --------------------------------------------------------------------------


_PAGE_STRUCT = StructType(
    [
        StructField("text", StringType()),
        StructField("hrefs", ArrayType(StringType())),
    ]
)


@pandas_udf(_PAGE_STRUCT)
def extract_page_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    for html in batches:
        s = _to_str(html)
        found = s.str.findall(_HREF)
        yield pd.DataFrame(
            {
                "text": unescape_series(s.str.findall(_P_BLOCK).str.join("\n").fillna("")),
                "hrefs": found.where(found.notna(), None),
            }
        )


def extract_docs(pages: DataFrame) -> DataFrame:
    """(url, text, hrefs) — X1 and X2 from a single html pass."""
    return _ensure_parallelism(pages).select(
        "url", extract_page_udf(F.col("html")).alias("p")
    ).select("url", F.col("p.text").alias("text"), F.col("p.hrefs").alias("hrefs"))


# --------------------------------------------------------------------------
# X3 — url normalization (vectorized; also a (base, href) pandas UDF)
# --------------------------------------------------------------------------

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")
_PARTS_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)(.*)$", re.DOTALL)


def _lower_scheme_host(s: pd.Series) -> pd.Series:
    """X3 step 4: lowercase scheme + host, preserve path/query; urls that
    don't parse as scheme://... pass through unchanged."""
    parts = s.str.extract(_PARTS_RE)
    ok = parts[0].notna()
    rebuilt = parts[0].str.lower() + "://" + parts[1].str.lower() + parts[2].fillna("")
    return s.where(~ok, rebuilt)


def normalize_url_batch(base: pd.Series, href: pd.Series) -> pd.Series:
    """X3 contract (module docstring), dedup-then-map execution: real batches
    repeat hrefs heavily (site-wide nav links — measured ~7% unique in the
    bench corpus), so every per-value step (entity decode, strip,
    de-fragment, classify, case-normalize) runs on np.unique'd values and is
    scattered back by inverse index. Base parsing likewise runs per unique
    base (one page contributes many links). Byte-identical to the direct
    formulation (property-tested per row class) at ~6x the throughput."""
    n = len(href)
    if n == 0:
        return pd.Series([], index=href.index, dtype=object)
    b_all = base.fillna("").str.strip().to_numpy(dtype=object)
    h_arr = href.fillna("").astype("string").astype(object).to_numpy(dtype=object)

    # ---- per-unique-href: decode, strip, de-fragment, classify ----------
    uh, hinv = np.unique(h_arr, return_inverse=True)
    us = unescape_series(pd.Series(uh, dtype=object)).str.strip()
    us = us.str.split("#", n=1).str[0]
    has_scheme_u = us.str.match(_SCHEME_RE).fillna(False).to_numpy(dtype=bool)
    proto_rel_u = us.str.startswith("//").fillna(False).to_numpy(dtype=bool) & ~has_scheme_u
    abs_path_u = us.str.startswith("/").fillna(False).to_numpy(dtype=bool) & ~proto_rel_u

    # absolute hrefs resolve independently of base: finish them per-unique
    res_u = np.empty(len(uh), dtype=object)
    if has_scheme_u.any():
        res_u[has_scheme_u] = _lower_scheme_host(us[has_scheme_u]).to_numpy(dtype=object)
    out = res_u[hinv]

    # ---- base-dependent rows: parse each unique base once ---------------
    pend = ~has_scheme_u[hinv]
    if pend.any():
        hp = us.to_numpy(dtype=object)[hinv][pend]
        proto_rel = proto_rel_u[hinv][pend]
        abs_path = abs_path_u[hinv][pend]
        ub, binv = np.unique(b_all[pend], return_inverse=True)
        bp = pd.Series(ub, dtype=object).str.extract(_PARTS_RE)
        bscheme = bp[0].fillna("https").to_numpy(dtype=object)[binv]
        bhost = bp[1].fillna("").to_numpy(dtype=object)[binv]
        # base directory = path up to (and incl.) last '/'; '' path -> '/'
        bpath = bp[2].fillna("/").str.split("?", n=1).str[0]
        bdir = bpath.str.replace(r"[^/]*$", "", regex=True)
        bdir = np.where(bdir.str.len() > 0, bdir, "/")[binv]
        constructed = np.where(
            proto_rel,
            bscheme + ":" + hp,
            np.where(
                abs_path,
                bscheme + "://" + bhost + hp,
                bscheme + "://" + bhost + bdir + hp,
            ),
        )
        uc, cinv = np.unique(constructed, return_inverse=True)
        out[pend] = _lower_scheme_host(pd.Series(uc, dtype=object)).to_numpy(dtype=object)[cinv]
    return pd.Series(out, index=href.index, dtype=object)


@pandas_udf(StringType())
def normalize_url_udf(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    for base, href in it:
        yield normalize_url_batch(base, href)


def normalize_url_simple(col: Column) -> Column:
    """Column-expression fast path for already-absolute urls (X3 'simple
    cases'): strip fragment + lowercase scheme/host, pure Catalyst codegen."""
    no_frag = F.regexp_replace(col, "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    host = F.lower(F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1))
    rest = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(.*)$", 1)
    return F.when(scheme != "", F.concat(scheme, F.lit("://"), host, rest)).otherwise(no_frag)


# --------------------------------------------------------------------------
# X4/X5 + Stage-A composites
# --------------------------------------------------------------------------


def url_id(col: Column) -> Column:
    """X4 — stable vertex id: xxhash64 of the normalized url (JVM built-in)."""
    return F.xxhash64(col)


def extract_doc_text(pages: DataFrame) -> DataFrame:
    """X1 as a DataFrame op: (url, text) re-derived from html."""
    return pages.select("url", extract_text_udf(F.col("html")).alias("text"))


# --------------------------------------------------------------------------
# fused single-crossing extraction paths (one html decode+parse per page;
# one Arrow round-trip instead of separate text/href/normalize crossings)
# --------------------------------------------------------------------------


def _edges_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """(url, html) batch -> exploded (src_url, dst_url) with normalization —
    href findall and url resolution fused into ONE vectorized pass."""
    s = _to_str(pdf["html"])
    hrefs = s.str.findall(_HREF)
    # null html -> NaN entry; count it as 0 links and skip it in the flatten
    # (a bare `len(h)` would raise TypeError on the NaN float)
    counts = hrefs.str.len().fillna(0).astype(np.int64).to_numpy()
    if counts.sum() == 0:
        return pd.DataFrame({"src_url": pd.Series([], dtype=object),
                             "dst_url": pd.Series([], dtype=object)})
    base = np.repeat(pdf["url"].to_numpy(dtype=object), counts)
    flat = np.concatenate(
        [np.asarray(h, dtype=object) for h in hrefs if isinstance(h, list) and h]
    )
    dst = normalize_url_batch(pd.Series(base), pd.Series(flat))
    # pre-filter INSIDE the batch (round 6, guide §4.1: control how many
    # rows cross the Arrow boundary): non-http(s) results and self-links
    # are dropped by every consumer's JVM filter anyway — dropping them
    # here means they never get serialized back to the JVM. The pandas
    # startswith pair is exactly the consumer's "^https?://" anchor, so
    # the JVM filters (kept as the contract) become near-no-ops.
    d = dst.to_numpy(dtype=object)
    keep = (
        (dst.str.startswith("http://") | dst.str.startswith("https://"))
        .fillna(False)
        .to_numpy(dtype=bool)
        & (d != base)
    )
    return pd.DataFrame({"src_url": base[keep], "dst_url": d[keep]})


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """A narrow input (one small parquet file = one split = one row group)
    would run the whole extraction UDF in a single task — repartition up to
    the configured shuffle parallelism first. One extra exchange of the raw
    html rows buys cores-wide regex work; a real crawl store (many files,
    many row groups) already scans wide and skips this."""
    if df.isStreaming:
        # streaming relations have no static partition count (df.rdd raises)
        # and micro-batch parallelism is the source's concern — the Stage-A
        # UDFs apply to the stream unchanged (sources/pages.py contract)
        return df
    spark = df.sparkSession
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() * 2 <= target:
        # hash-repartition on the url instead of round-robin (round 6):
        # every keyless repartition(n) first pays a local sort of its input
        # rows so retried tasks reproduce the same row-to-partition
        # assignment (SPARK-23207; guide §2.5) — here that sorted the FULL
        # html payload inside the (often single) input task before the
        # exchange. Hashing the unique page url is just as deterministic
        # under retries, spreads 135k+ distinct keys evenly over any task
        # count, and skips the payload sort outright.
        return df.repartition(target, F.col("url"))
    return df


def extract_edge_urls(pages: DataFrame, langs: list[str] | None = None) -> DataFrame:
    """X2+X3(+X5): (src_url, dst_url) normalized link pairs, http(s) only,
    deduped, self-loops removed.

    Implementation: one mapInPandas crossing that decodes each page's html
    once and emits already-normalized exploded pairs (the separate
    extract_hrefs_udf -> explode -> normalize_url_udf composition is kept as
    the per-operator API surface; this fused path avoids shipping the raw
    href strings out to the JVM and back in a second UDF)."""
    df = pages
    if langs:
        df = df.filter(F.col("lang").isin(langs))  # X5
    df = _ensure_parallelism(df)
    raw = df.select("url", "html").mapInPandas(
        lambda it: (_edges_batch(pdf) for pdf in it),
        "src_url string, dst_url string",
    )
    out = (
        raw.filter(F.col("dst_url").rlike("^https?://"))
        .filter(F.col("dst_url") != F.col("src_url"))
        .dropDuplicates(["src_url", "dst_url"])
    )
    return out


def extract_edges(pages: DataFrame, langs: list[str] | None = None) -> DataFrame:
    """Full Stage A: pages -> (src BIGINT, dst BIGINT) edge table."""
    pairs = extract_edge_urls(pages, langs)
    return (
        pairs.select(url_id(F.col("src_url")).alias("src"), url_id(F.col("dst_url")).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
