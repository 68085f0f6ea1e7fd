"""Manifest-committed versioned tables: an object-store-safe commit
protocol (ROADMAP #8).

``compact_parquet`` / ``upsert_snapshot`` commit by directory rename —
atomic on local/HDFS but not on S3-class stores, where a failed job can
leave readers seeing half a table.  This module commits the way table
formats (Delta/Iceberg) do, reduced to its core:

- data files are IMMUTABLE and uniquely named; a write stages them under
  the table's ``data/`` directory where no reader looks for them,
- a snapshot is a tiny JSON **manifest** (``manifest-v{N}.json``) listing
  exactly the data files in that version,
- the commit is the single atomic publish of that manifest (local:
  ``os.replace``; S3: conditional PUT of one small object).

Readers resolve the highest manifest and read ONLY its files, so they
never observe a partial write, writers never block readers, old versions
stay readable (time travel), and crashed writes leave only invisible
orphans for ``vacuum_versioned`` to sweep.  The 100 TB story: the commit
cost is one small-object write regardless of data size, and the manifest
doubles as file-level pruning metadata (no directory listing on read).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_GLOB = "manifest-v*.json"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"manifest-v{version}.json")


def table_versions(table_dir: str) -> list[int]:
    """All committed versions, ascending; [] for a nonexistent table."""
    out = []
    for p in glob.glob(os.path.join(table_dir, _MANIFEST_GLOB)):
        stem = os.path.basename(p)[len("manifest-v") : -len(".json")]
        if stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def commit_versioned(df: DataFrame, table_dir: str, mode: str = "overwrite") -> int:
    """Write ``df`` as a new committed version of ``table_dir``; returns
    the new version number.  ``mode='overwrite'`` snapshots just this
    data; ``mode='append'`` carries the previous version's files forward
    (append = old manifest's file list + the new files — no data rewrite).

    The write stages to a scratch dir, hard-moves the finished parts into
    ``data/`` under version-unique names (invisible to readers: readers
    only trust the manifest), then publishes the manifest atomically.  A
    crash before the final publish leaves the table exactly at the prior
    version.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    versions = table_versions(table_dir)
    version = (versions[-1] + 1) if versions else 1

    stage = os.path.join(table_dir, f".stage-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    tag = uuid.uuid4().hex[:8]
    files = []
    for i, part in enumerate(sorted(glob.glob(os.path.join(stage, "part-*.parquet")))):
        name = f"v{version}-{tag}-{i:05d}.parquet"
        os.replace(part, os.path.join(data_dir, name))
        files.append(name)
    shutil.rmtree(stage, ignore_errors=True)

    if mode == "append" and versions:
        files = _read_manifest(table_dir, versions[-1])["files"] + files
    manifest = {"version": version, "mode": mode, "files": files}
    tmp = os.path.join(table_dir, f".manifest-{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(table_dir, version))  # THE commit
    return version


def read_versioned(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a committed version (latest when ``version`` is None).  Only
    manifest-listed files are read — staged, orphaned, or future files in
    ``data/`` are invisible."""
    versions = table_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no committed versions in {table_dir}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions}")
    files = _read_manifest(table_dir, v)["files"]
    data_dir = os.path.join(table_dir, "data")
    return spark.read.parquet(*[os.path.join(data_dir, f) for f in files])


def vacuum_versioned(table_dir: str, keep: int = 2) -> list[str]:
    """Garbage-collect: keep the newest ``keep`` versions, delete older
    manifests and every data file no kept version references (including
    crash orphans).  Returns the deleted file names.  Run with a retention
    window longer than the longest reader at scale."""
    versions = table_versions(table_dir)
    kept, dropped = versions[-keep:], versions[:-keep]
    live: set[str] = set()
    for v in kept:
        live.update(_read_manifest(table_dir, v)["files"])
    deleted = []
    data_dir = os.path.join(table_dir, "data")
    for p in glob.glob(os.path.join(data_dir, "*.parquet")):
        if os.path.basename(p) not in live:
            os.remove(p)
            deleted.append(os.path.basename(p))
    for v in dropped:
        os.remove(_manifest_path(table_dir, v))
    for stray in glob.glob(os.path.join(table_dir, ".stage-*")):
        shutil.rmtree(stray, ignore_errors=True)
    return deleted


def compact_versioned(
    spark: SparkSession, table_dir: str, target_files: int = 8
) -> int:
    """Rewrite the LATEST version's data into ``target_files`` files and
    commit the result as a new version (same rows, fewer files).

    Append-mode ingestion (e.g. the streaming dedup corpus/index, one
    commit per micro-batch) accumulates a file per batch; readers then
    pay per-file open cost and tiny scan tasks.  Compaction is an
    ordinary overwrite commit, so it is atomic, readers on older versions
    are untouched, and ``vacuum_versioned`` reclaims the small files once
    the retention window passes.  Returns the new version number.
    """
    latest = read_versioned(spark, table_dir)
    return commit_versioned(
        latest.repartition(target_files), table_dir, mode="overwrite"
    )
