"""Iceberg-style checkpoint sink (SURVEY §2 rows S3, S7).

No Iceberg runtime jar exists in this sandbox (SURVEY §0), so this implements
the same contract — atomic snapshot commits with per-partition lineage +
metrics, resumable — as parquet data files plus JSON manifests committed via
atomic rename. When a real Iceberg catalog is on the classpath, the layout
maps 1:1 (manifest == Iceberg snapshot metadata).

Layout:
    <root>/<run_id>/<algo>/iter=<k>/           parquet state files (Spark write)
    <root>/<run_id>/<algo>/_manifests/<k>.json atomic commit marker:
        {iter, schema, files: [{path, rows, bytes}], metrics, run_id, algo}

Commit protocol: (1) Spark writes the data dir (overwrite), (2) the manifest
is assembled from the actual files in the store (per-partition lineage: one
entry per parquet part file with its row count from the footer), (3) manifest
JSON is written to a tmp name and renamed — rename-to-fresh-path is atomic on
POSIX and HDFS, so a manifest either exists fully or not at all. `latest()`
ignores data dirs without manifests, which makes crash-mid-write resume-safe
[BASELINE.json:14].

Cluster-real filesystem handling: ALL fs operations route through
scalemine_spark.fsio (POSIX fast path for local roots; Hadoop FileSystem API
for file://, hdfs://, s3a://, ... — the footer read is a range read over
FSDataInputStream, never a full download). Two Spark actions per commit
(write + none — footers are read driver-side, no job). Lineage truncation:
`commit()` returns a fresh re-read of the just-written parquet, which resets
the logical plan each iteration (SURVEY §4.3.1 — the naive loop grows the
plan exponentially).
"""

from __future__ import annotations

import json
import posixpath
import re
import time

from pyspark.sql import DataFrame, SparkSession

from scalemine_spark.fsio import fs_for

# 000004.json (version 0) / 000004.v2.json (2nd amend). Amends write a NEW
# versioned name instead of rewriting in place: rename-to-fresh-path is
# atomic on POSIX/HDFS and safe even on S3A-style copy+delete renames —
# readers always see SOME complete manifest for a committed iteration (the
# previous version survives until the new one is fully visible).
_MANIFEST_RE = re.compile(r"^(\d{6})(?:\.v(\d+))?\.json$")


class CheckpointManager:
    def __init__(self, root: str, run_id: str, algo: str):
        self.root = root
        self.run_id = run_id
        self.algo = algo
        self.base = posixpath.join(root, run_id, algo)
        self.manifest_dir = posixpath.join(self.base, "_manifests")
        self._fs = fs_for(root)
        self._fs.makedirs(self.manifest_dir)

    # -- paths -------------------------------------------------------------
    def data_dir(self, it: int) -> str:
        return posixpath.join(self.base, f"iter={it}")

    def manifest_path(self, it: int, version: int = 0) -> str:
        name = f"{it:06d}.json" if version == 0 else f"{it:06d}.v{version}.json"
        return posixpath.join(self.manifest_dir, name)

    def _versions(self) -> dict[int, list[int]]:
        """iter -> sorted list of manifest versions present in the store."""
        out: dict[int, list[int]] = {}
        if not self._fs.isdir(self.manifest_dir):
            return out
        for name in self._fs.listdir(self.manifest_dir):
            m = _MANIFEST_RE.match(name)
            if m:
                out.setdefault(int(m.group(1)), []).append(int(m.group(2) or 0))
        for vs in out.values():
            vs.sort()
        return out

    # -- commit ------------------------------------------------------------
    def commit(self, it: int, state: DataFrame, metrics: dict[str, float]) -> DataFrame:
        """Atomically commit iteration `it`; returns the re-read state
        (fresh lineage)."""
        spark = state.sparkSession
        ddir = self.data_dir(it)
        state.write.mode("overwrite").parquet(ddir)

        files = []
        for name in sorted(self._fs.listdir(ddir)):
            if not name.endswith(".parquet"):
                continue
            fp = posixpath.join(ddir, name)
            files.append(
                {
                    "path": fp,
                    "rows": self._fs.parquet_num_rows(fp),
                    "bytes": self._fs.getsize(fp),
                }
            )

        manifest = {
            "run_id": self.run_id,
            "algo": self.algo,
            "iter": it,
            "schema": state.schema.json(),
            "files": files,
            "row_count": sum(f["rows"] for f in files),
            "metrics": {k: float(v) for k, v in metrics.items()},
            "committed_at_unix": time.time(),
        }
        self._fs.write_bytes_atomic(
            self.manifest_path(it), json.dumps(manifest, indent=1).encode()
        )
        return spark.read.parquet(ddir)

    def amend_metrics(self, it: int, metrics: dict[str, float]) -> None:
        """Merge metrics into an already-committed manifest by writing the
        NEXT manifest version to a fresh name (never an in-place rewrite —
        see _MANIFEST_RE note). Readers pick the highest complete version;
        the iteration stays visibly committed at every instant, on every
        store rename semantics (POSIX, HDFS, S3A copy+delete)."""
        versions = self._versions().get(it, [0])
        m = self.read_manifest(it)
        m["metrics"].update({k: float(v) for k, v in metrics.items()})
        self._fs.write_bytes_atomic(
            self.manifest_path(it, versions[-1] + 1), json.dumps(m, indent=1).encode()
        )

    # -- resume ------------------------------------------------------------
    def latest(self) -> int | None:
        """Max committed iteration (valid manifest + data present), else None."""
        best = None
        for it, versions in self._versions().items():
            # any complete version proves the commit; prefer the newest,
            # fall back past a torn amend to an older complete one
            for v in reversed(versions):
                try:
                    m = json.loads(self._fs.read_bytes(self.manifest_path(it, v)))
                    if all(self._fs.exists(f["path"]) for f in m["files"]):
                        best = it if best is None else max(best, it)
                    break
                except (json.JSONDecodeError, KeyError, OSError):
                    continue  # torn/corrupt manifest version — try older
        return best

    def read_manifest(self, it: int) -> dict:
        """Highest complete manifest version for `it` (amends supersede)."""
        for v in reversed(self._versions().get(it, [0])):
            try:
                return json.loads(self._fs.read_bytes(self.manifest_path(it, v)))
            except (json.JSONDecodeError, OSError):
                continue
        raise FileNotFoundError(f"no readable manifest for iter {it}")

    def read_state(self, spark: SparkSession, it: int) -> DataFrame:
        return spark.read.parquet(self.data_dir(it))

    def metrics_history(self) -> list[dict]:
        """S7 — per-iteration metrics rows, ordered by iter."""
        out = []
        it = self.latest()
        if it is None:
            return out
        for k in range(it + 1):
            if self._fs.exists(self.manifest_path(k)):
                m = self.read_manifest(k)
                out.append({"iter": k, "row_count": m["row_count"], **m["metrics"]})
        return out
