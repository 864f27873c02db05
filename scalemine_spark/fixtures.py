"""Deterministic synthetic fixtures (FIXTURES.md §B).

B1 `pages` — the mandated input shape (url, warc_ts, html, text, lang)
[BASELINE.json:15], synthesized from /root/testdata documents.text with a
single integer seed; no wall clock, no network, no /dev/urandom, independent
of core count. Identical seed => byte-identical parquet.

The generator writes the `text` column DIRECTLY from the source paragraph
blocks (the canonical extraction definition: blocks joined by "\n",
entity-decoded == the raw blocks). It never parses html. The engine's
extractor (scalemine_spark.extract) independently re-derives text by parsing
html; byte-identity between the two is the Stage-A acceptance test.

Randomness: splitmix64-style integer mixing on (seed, row, stream) — fully
vectorized in numpy, partition/order independent. At true 10^12 scale this
same per-row mixing runs distributed (spark.range + mapInPandas); driver-side
pandas is used here because fixture scales are <= ~10^6 rows.
"""

from __future__ import annotations

import html as _html
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_U64 = np.uint64
_PHI = _U64(0x9E3779B97F4A7C15)
_M1 = _U64(0xBF58476D1CE4E5B9)
_M2 = _U64(0x94D049BB133111EB)


def _mix(seed: int, idx: np.ndarray, stream: int) -> np.ndarray:
    """splitmix64 finalizer over (seed, idx, stream) -> uint64."""
    with np.errstate(over="ignore"):
        x = idx.astype(np.uint64) * _PHI
        x ^= _U64((seed * 0x9E3779B9 + stream * 0x85EBCA6B) & 0xFFFFFFFFFFFFFFFF)
        x ^= x >> _U64(30)
        x *= _M1
        x ^= x >> _U64(27)
        x *= _M2
        x ^= x >> _U64(31)
    return x


def _uniform(seed: int, idx: np.ndarray, stream: int) -> np.ndarray:
    return _mix(seed, idx, stream).astype(np.float64) / float(2**64)


def _powerlaw_index(u: np.ndarray, n: int, alpha: float = 3.0) -> np.ndarray:
    """Map uniform u -> index in [0, n) with Zipf-like mass at low indices."""
    return np.minimum((n * np.power(u, alpha)).astype(np.int64), n - 1)


BASE_TS_US = 1767225600_000_000  # 2026-01-01T00:00:00Z in microseconds


def generate_pages(
    docs_parquet: str,
    n_pages: int,
    seed: int = 42,
    n_hosts: int | None = None,
    max_links: int = 30,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (pages_pdf, edges_expected_pdf).

    pages_pdf:  url, warc_ts (datetime64[us]), html (bytes), text, lang
    edges_expected_pdf: src_url, dst_url  (canonical normalized urls, deduped,
    self-loops removed) — ground truth for Stage-A end-to-end assertions.
    """
    docs = pq.read_table(docs_parquet, columns=["doc_id", "text", "lang"]).to_pandas()
    ndocs = len(docs)
    if n_hosts is None:
        n_hosts = max(8, n_pages // 50)

    i = np.arange(n_pages, dtype=np.int64)
    host_idx = _powerlaw_index(_uniform(seed, i, 1), n_hosts)
    urls = np.array([f"https://h{h}.example.org/p/{k}" for k, h in zip(i, host_idx)], dtype=object)

    # doc pick: FIXTURES.md B1 — doc_id = hash(url) % ndocs (stable crc32)
    doc_pick = np.array([zlib.crc32(u.encode()) % ndocs for u in urls], dtype=np.int64)
    dtexts = docs["text"].to_numpy(dtype=object)
    dlangs = docs["lang"].to_numpy(dtype=object)

    # paragraph blocks: split picked doc text into 1-3 chunks at word bounds
    n_blocks = 1 + (_mix(seed, i, 2) % _U64(3)).astype(np.int64)

    # outlinks: k in [0, max_links], targets Zipf-like over the url universe
    k_links = (_mix(seed, i, 3) % _U64(max_links + 1)).astype(np.int64)
    src_rep = np.repeat(i, k_links)
    slot = np.concatenate([np.arange(k, dtype=np.int64) for k in k_links]) if len(src_rep) else np.array([], dtype=np.int64)
    link_key = src_rep * _U64(64).astype(np.int64) + slot  # unique per (page, slot)

    tgt = _powerlaw_index(_uniform(seed, link_key, 4), n_pages)
    # ~1% dangling: target outside the corpus
    u_kind = _uniform(seed, link_key, 5)
    dangle = u_kind < 0.01
    # perturbation draws
    u_pert = _uniform(seed, link_key, 6)

    tgt_host = host_idx[tgt]
    canon = np.array(
        [f"https://h{h}.example.org/p/{t}" for h, t in zip(tgt_host, tgt)], dtype=object
    )
    canon[dangle] = [f"https://dead-{int(k) % 50}.example.net/x" for k in link_key[dangle]]

    # href as it appears in html (normalize(href, base) must recover canon):
    href = canon.copy()
    same_host = (tgt_host == host_idx[src_rep]) & ~dangle
    rel = same_host & (u_pert < 0.05)  # abs-path relative form
    href[rel] = [f"/p/{t}" for t in tgt[rel]]
    frag = (~rel) & (u_pert >= 0.05) & (u_pert < 0.06)
    href[frag] = [h + "#frag" for h in href[frag]]
    upper = (~rel) & (u_pert >= 0.06) & (u_pert < 0.07)
    href[upper] = [
        h.replace("https://", "https://", 1).replace(h.split("/")[2], h.split("/")[2].upper(), 1)
        for h in href[upper]
    ]

    # assemble html + text per page
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    href_by_page: list[list[str]] = [[] for _ in range(n_pages)]
    for s, h in zip(src_rep, href):
        href_by_page[s].append(h)

    for k in range(n_pages):
        dt = dtexts[doc_pick[k]] or ""
        nb = int(n_blocks[k])
        words = dt.split(" ")
        if nb == 1 or len(words) < nb * 2:
            blocks = [dt]
        else:
            step = max(1, len(words) // nb)
            blocks = [" ".join(words[j * step : (j + 1) * step if j < nb - 1 else len(words)]) for j in range(nb)]
        text = "\n".join(blocks)
        body = "".join(f"<p>{_html.escape(b)}</p>" for b in blocks)
        anchors = "".join(f'<a href="{h}">a{j}</a>' for j, h in enumerate(href_by_page[k]))
        page = f"<html><head><title>Page {k}</title></head><body>{body}{anchors}</body></html>"
        htmls.append(page.encode("utf-8"))
        texts.append(text)
        langs.append(str(dlangs[doc_pick[k]]))

    ts = BASE_TS_US + i * 7_000_000  # +7s per row
    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts.astype("datetime64[us]"),
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )

    # ~5% recrawled: duplicate row, +1 day, identical content (as-of / J9 path)
    recrawl_mask = _uniform(seed, i, 7) < 0.05
    rec = pages[recrawl_mask].copy()
    rec["warc_ts"] = rec["warc_ts"] + np.timedelta64(86400, "s")
    pages = pd.concat([pages, rec], ignore_index=True)
    pages = pages.sort_values(["url", "warc_ts"], kind="mergesort").reset_index(drop=True)

    edges = (
        pd.DataFrame({"src_url": urls[src_rep], "dst_url": canon})
        .query("src_url != dst_url")
        .drop_duplicates()
        .sort_values(["src_url", "dst_url"], kind="mergesort")
        .reset_index(drop=True)
    )
    return pages, edges


PAGES_PA_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        # UTC-adjusted so Spark reads TimestampType (the mandated shape),
        # not TIMESTAMP_NTZ [BASELINE.json:15]
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def materialize_pages(
    docs_parquet: str,
    out_dir: str,
    n_pages: int,
    seed: int = 42,
) -> tuple[str, str]:
    """Generate (or reuse cached) pages.parquet + edges_expected.parquet under
    out_dir; returns their paths. Cache key is (n_pages, seed) in the path."""
    tag = f"pages_n{n_pages}_s{seed}"
    pdir = os.path.join(out_dir, tag)
    ppath = os.path.join(pdir, "pages.parquet")
    epath = os.path.join(pdir, "edges_expected.parquet")
    if os.path.exists(ppath) and os.path.exists(epath):
        return ppath, epath
    os.makedirs(pdir, exist_ok=True)
    pages, edges = generate_pages(docs_parquet, n_pages, seed)
    tbl = pa.Table.from_pandas(pages, schema=PAGES_PA_SCHEMA, preserve_index=False)
    pq.write_table(tbl, ppath + ".tmp", compression="zstd")
    os.replace(ppath + ".tmp", ppath)
    et = pa.Table.from_pandas(edges, preserve_index=False)
    pq.write_table(et, epath + ".tmp", compression="zstd")
    os.replace(epath + ".tmp", epath)
    return ppath, epath


def synth_edges_distributed(spark, n_edges: int, n_vertices: int, seed: int = 42):
    """Distributed deterministic power-law edge generator (Spark-native).

    For scaling runs beyond what the driver-side pages generator can build:
    spark.range(n_edges) + xxhash64-based mixing -> (src, dst) with Zipf-like
    in/out degree mass at low vertex ids (hubs), self-loops dropped, deduped.
    Deterministic in (n_edges, n_vertices, seed); independent of partitioning
    (hashes key on the row id). This is the 10^12-scale generation path — the
    same expression pipeline runs on any cluster size.
    """
    from pyspark.sql import functions as F

    def u(col, stream):
        # uniform in [0,1) from xxhash64 (signed) -> shifted
        return (F.xxhash64(col, F.lit(seed), F.lit(stream)) / F.lit(float(2**64))) + F.lit(0.5)

    df = spark.range(n_edges)
    src = F.floor(F.lit(float(n_vertices)) * F.pow(u(F.col("id"), 1), F.lit(2.0))).cast("long")
    dst = F.floor(F.lit(float(n_vertices)) * F.pow(u(F.col("id"), 2), F.lit(2.0))).cast("long")
    return (
        df.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


# --------------------------------------------------------------------------
# B3 — hand-written micro-graphs (edge lists; undirected unless noted)
# --------------------------------------------------------------------------

G_LINE = [(0, 1), (1, 2), (2, 3)]  # directed path
G_TWO_CC = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]  # two triangles
G_STAR_HUB = [(0, k) for k in range(1, 21)]  # hub -> leaves (all leaves dangle)
G_CYCLE_DANGLING = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4)]  # cycle + dangling 4


def g_karate_like(seed: int = 7, n: int = 34, m: int = 78) -> list[tuple[int, int]]:
    """Fixed 34-vertex seeded graph (karate-club-sized), deterministic."""
    edges = set()
    k = 0
    idx = 0
    while len(edges) < m:
        arr = np.arange(idx, idx + 4 * m, dtype=np.int64)
        a = (_mix(seed, arr, 10) % _U64(n)).astype(np.int64)
        b = (_mix(seed, arr, 11) % _U64(n)).astype(np.int64)
        for u, v in zip(a, b):
            if u != v:
                edges.add((min(int(u), int(v)), max(int(u), int(v))))
                if len(edges) >= m:
                    break
        idx += 4 * m
        k += 1
        if k > 50:
            break
    return sorted(edges)


# --------------------------------------------------------------------------
# B4 — random property-test graphs (numpy only)
# --------------------------------------------------------------------------


def erdos(n: int = 200, p: float = 0.05, seed: int = 0) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    mask = rng.random((n, n)) < p
    iu = np.triu_indices(n, k=1)
    sel = mask[iu]
    return list(zip(iu[0][sel].tolist(), iu[1][sel].tolist()))


def powerlaw(n: int = 500, m: int = 3, seed: int = 0) -> list[tuple[int, int]]:
    """Barabási–Albert-ish preferential attachment, numpy only."""
    rng = np.random.default_rng(seed)
    targets = list(range(m))
    repeated: list[int] = list(range(m))
    edges: list[tuple[int, int]] = []
    for v in range(m, n):
        chosen = set()
        while len(chosen) < m:
            chosen.add(int(repeated[rng.integers(0, len(repeated))]))
        for t in chosen:
            edges.append((min(v, t), max(v, t)))
            repeated.append(t)
            repeated.append(v)
    return sorted(set(edges))
