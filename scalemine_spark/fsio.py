"""Filesystem shim for checkpoint/manifest I/O (SURVEY §2 S3/S7).

On a real cluster the checkpoint root is s3a://... or hdfs://... — POSIX
os.* calls on the driver do not work there. All CheckpointManager filesystem
operations route through this shim:

  * PosixFS   — local paths (no scheme or file:). Fast path, no JVM hops.
  * HadoopFS  — any path with a URI scheme, resolved through Spark's Hadoop
    FileSystem API (``Path(p).getFileSystem(hadoopConf)``), so file://,
    hdfs://, s3a://, gs://, abfs:// all work wherever Spark itself can write.
    Parquet footers are read through a seekable file adapter over
    FSDataInputStream (range reads only — never the whole state file).

``fs_for(path)`` picks the backend from the path's scheme. Commit atomicity:
manifest bytes are written to a tmp name and renamed; rename-to-fresh-path is
atomic on POSIX and HDFS (on S3A rename is copy+delete, but a FRESH
destination is still all-or-nothing to readers). CheckpointManager only ever
writes fresh names — amends create a new manifest VERSION rather than
rewriting in place — so the delete-then-rename branch of
``HadoopFS.write_bytes_atomic`` (needed only when the destination already
exists, where a reader could observe the gap) is not exercised by the
checkpoint protocol.
"""

from __future__ import annotations

import io
import os
import re

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://")


class PosixFS:
    """Local-path backend. Tolerates file:// URIs (manifests written through
    HadoopFS record them) by stripping the scheme."""

    @staticmethod
    def _l(p: str) -> str:
        return strip_local_scheme(p)

    def makedirs(self, p: str) -> None:
        os.makedirs(self._l(p), exist_ok=True)

    def isdir(self, p: str) -> bool:
        return os.path.isdir(self._l(p))

    def exists(self, p: str) -> bool:
        return os.path.exists(self._l(p))

    def listdir(self, p: str) -> list[str]:
        return os.listdir(self._l(p))

    def getsize(self, p: str) -> int:
        return os.path.getsize(self._l(p))

    def read_bytes(self, p: str) -> bytes:
        with open(self._l(p), "rb") as fh:
            return fh.read()

    def write_bytes_atomic(self, p: str, data: bytes) -> None:
        p = self._l(p)
        tmp = p + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, p)  # atomic on POSIX

    def parquet_num_rows(self, p: str) -> int:
        import pyarrow.parquet as pq

        return pq.read_metadata(self._l(p)).num_rows


class _HadoopSeekableFile(io.RawIOBase):
    """Seekable read-only python file over FSDataInputStream — lets pyarrow
    read a parquet FOOTER from any Hadoop-visible store with range reads."""

    def __init__(self, jvm, fs, jpath):
        self._jvm = jvm
        self._stream = fs.open(jpath)
        self._len = fs.getFileStatus(jpath).getLen()
        self._pos = 0

    def seekable(self) -> bool:  # pragma: no cover - trivial
        return True

    def readable(self) -> bool:  # pragma: no cover - trivial
        return True

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        else:
            self._pos = self._len + offset
        return self._pos

    def tell(self) -> int:
        return self._pos

    def size(self) -> int:
        return self._len

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._len - self._pos
        n = max(0, min(n, self._len - self._pos))
        if n == 0:
            return b""
        self._stream.seek(self._pos)
        data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(self._stream, n)
        self._pos += n
        return bytes(data)

    def close(self) -> None:
        try:
            self._stream.close()
        finally:
            super().close()


class HadoopFS:
    """Hadoop FileSystem-backed ops (driver-side via py4j)."""

    def __init__(self, root: str):
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError("HadoopFS requires an active SparkSession")
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(root).getFileSystem(self._conf)

    def _p(self, p: str):
        return self._Path(p)

    def makedirs(self, p: str) -> None:
        self._fs.mkdirs(self._p(p))

    def isdir(self, p: str) -> bool:
        jp = self._p(p)
        return bool(self._fs.exists(jp) and self._fs.getFileStatus(jp).isDirectory())

    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self._p(p)))

    def listdir(self, p: str) -> list[str]:
        return [st.getPath().getName() for st in self._fs.listStatus(self._p(p))]

    def getsize(self, p: str) -> int:
        return int(self._fs.getFileStatus(self._p(p)).getLen())

    def read_bytes(self, p: str) -> bytes:
        jp = self._p(p)
        stream = self._fs.open(jp)
        try:
            n = int(self._fs.getFileStatus(jp).getLen())
            return bytes(self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream, n))
        finally:
            stream.close()

    def write_bytes_atomic(self, p: str, data: bytes) -> None:
        # Atomic only for FRESH destinations (tmp write + rename). If `p`
        # already exists the delete+rename below leaves a no-file window —
        # callers that need always-visible files must write versioned fresh
        # names instead (CheckpointManager.amend_metrics does exactly that).
        tmp = self._p(p + ".tmp")
        out = self._fs.create(tmp, True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()
        dst = self._p(p)
        if self._fs.exists(dst):
            self._fs.delete(dst, False)
        self._fs.rename(tmp, dst)

    def parquet_num_rows(self, p: str) -> int:
        import pyarrow.parquet as pq

        fh = _HadoopSeekableFile(self._jvm, self._fs, self._p(p))
        try:
            return pq.read_metadata(fh).num_rows
        finally:
            fh.close()


def fs_for(path: str):
    """Backend by scheme: local paths -> PosixFS, anything with a URI scheme
    (including file://) -> HadoopFS."""
    if _SCHEME_RE.match(path):
        return HadoopFS(path)
    return PosixFS()


def strip_local_scheme(path: str) -> str:
    """file:///x -> /x (Spark writers accept both; POSIX tools need the
    latter). Non-file schemes pass through unchanged."""
    if path.startswith("file://"):
        return path[len("file://"):]
    return path
