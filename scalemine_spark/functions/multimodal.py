"""Multimodal column plumbing (training-data pipeline surface).

Media (image/audio/video) are opaque BINARY columns + typed metadata. The
Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas signatures,
partitioning — is real and tested; the actual codec work is stubbed because
no image/audio libraries exist in this container: `decode_image_batch`
raises NotImplementedError unless PIL is importable (import-try gate), and
`fake_decode` provides a deterministic stand-in so the pipeline shape is
exercisable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

BINARY_META_SCHEMA = "doc_id long, n_bytes long, magic_hex string"
DECODE_SCHEMA = "doc_id long, width int, height int, n_channels int"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes long"


def binary_metadata(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """mapInPandas metadata extraction over a BINARY column: byte length +
    leading-4-bytes magic (lowercase hex). Fully C-level inside the batch:
    pyarrow ``binary_length`` / ``binary_slice`` kernels, plus ONE
    ``bytes.hex()`` pass over the concatenated slice buffer (per-row work is
    just O(1) string slicing on the precomputed hex). Null payloads yield
    null metadata."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for pdf in batches:
            arr = pa.Array.from_pandas(pdf[bin_col], type=pa.binary())
            n_bytes = pc.binary_length(arr).to_pandas()  # nullable Int64
            sliced = pc.binary_slice(arr, 0, 4)
            offs = np.frombuffer(sliced.buffers()[1], dtype=np.int32)[
                sliced.offset : sliced.offset + len(sliced) + 1
            ]
            buf = sliced.buffers()[2]
            full_hex = buf.to_pybytes().hex() if buf is not None else ""
            valid = np.asarray(sliced.is_valid())
            magic = [
                full_hex[2 * a : 2 * b] if ok else None
                for a, b, ok in zip(offs[:-1], offs[1:], valid)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes.astype("Int64"),
                    "magic_hex": magic,
                }
            )

    return df.mapInPandas(fn, BINARY_META_SCHEMA)


def decode_image(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Real decode path — requires an image library. Stub-gated: the Spark
    plumbing (schema, mapInPandas batching) is identical to fake_decode."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL/pillow, not present in this container; "
            "use fake_decode() for the deterministic pipeline-shape stand-in"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        from PIL import Image

        for pdf in batches:
            ims = [Image.open(io.BytesIO(b)) for b in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": [i.width for i in ims],
                    "height": [i.height for i in ims],
                    "n_channels": [len(i.getbands()) for i in ims],
                }
            )

    return df.mapInPandas(fn, DECODE_SCHEMA)


def fake_decode(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Deterministic decode stand-in: dimensions derived from byte length
    (width = 1 + n%509, height = 1 + n%253, channels = 1 + n%3). Exercises
    the exact batching/schema path of decode_image."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[bin_col].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": (1 + n % 509).astype("int32"),
                    "height": (1 + n % 253).astype("int32"),
                    "n_channels": (1 + n % 3).astype("int32"),
                }
            )

    return df.mapInPandas(fn, DECODE_SCHEMA)


def frame_sample(
    df: DataFrame, block_bytes: int = 256, every_k: int = 4,
    id_col: str = "doc_id", bin_col: str = "payload",
) -> DataFrame:
    """'Video' frame sampling stand-in: split the binary payload into
    block_bytes frames, keep every k-th; emits (doc_id, frame_idx,
    frame_bytes). The real frame decoder would slot into the same shape."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            nb = pdf[bin_col].map(len).to_numpy(dtype="int64")
            ids = pdf[id_col].to_numpy(dtype="int64")
            # kept frames per doc: ceil((nb // block) / k) — pure numpy, no
            # per-row Python loop (the real frame decoder slots in per batch)
            n_frames = nb // block_bytes
            n_kept = (n_frames + every_k - 1) // every_k
            rep_ids = np.repeat(ids, n_kept)
            rep_nb = np.repeat(nb, n_kept)
            # frame_idx = every_k * (0..n_kept-1) per doc, flattened
            offs = np.repeat(np.cumsum(n_kept) - n_kept, n_kept)
            idxs = (np.arange(len(rep_ids), dtype="int64") - offs) * every_k
            sizes = np.minimum(block_bytes, rep_nb - idxs * block_bytes)
            yield pd.DataFrame(
                {"doc_id": rep_ids,
                 "frame_idx": idxs.astype("int32"),
                 "frame_bytes": sizes.astype("int64")}
            )

    return df.mapInPandas(fn, FRAME_SCHEMA)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: utf-8 bytes of the text column as the opaque payload."""
    return docs.select("doc_id", F.encode(F.col(text_col), "utf-8").alias("payload"))
