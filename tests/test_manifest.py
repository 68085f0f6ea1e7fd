"""Manifest-committed versioned tables (sources/manifest.py): atomic
publish, time travel, append snapshots, orphan invisibility, vacuum."""

from __future__ import annotations

import os
import shutil

from vtb_datafusion_2023_spark.sources.manifest import (
    commit_versioned,
    read_versioned,
    table_versions,
    vacuum_versioned,
)


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def test_versioned_overwrite_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = commit_versioned(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), t)
    v2 = commit_versioned(spark.createDataFrame([(3, "c")], "k int, v string"), t)
    assert (v1, v2) == (1, 2)
    assert table_versions(t) == [1, 2]
    assert _rows(read_versioned(spark, t)) == [(3, "c")]
    assert _rows(read_versioned(spark, t, version=1)) == [(1, "a"), (2, "b")]


def test_versioned_append_carries_files_without_rewrite(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_versioned(spark.createDataFrame([(1, "a")], "k int, v string"), t)
    before = set(os.listdir(os.path.join(t, "data")))
    commit_versioned(
        spark.createDataFrame([(2, "b")], "k int, v string"), t, mode="append"
    )
    assert _rows(read_versioned(spark, t)) == [(1, "a"), (2, "b")]
    # v1's physical files are reused, not rewritten
    assert before <= set(os.listdir(os.path.join(t, "data")))


def test_unmanifested_files_are_invisible(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_versioned(spark.createDataFrame([(1, "a")], "k int, v string"), t)
    data = os.path.join(t, "data")
    # simulate a crashed writer: a finished data file that never committed
    src = next(p for p in os.listdir(data) if p.endswith(".parquet"))
    shutil.copy(os.path.join(data, src), os.path.join(data, "vX-orphan-00000.parquet"))
    assert _rows(read_versioned(spark, t)) == [(1, "a")]


def test_vacuum_removes_old_versions_and_orphans(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(3):
        commit_versioned(spark.createDataFrame([(i, "x")], "k int, v string"), t)
    data = os.path.join(t, "data")
    open(os.path.join(data, "vX-orphan-00000.parquet"), "w").close()
    deleted = vacuum_versioned(t, keep=1)
    assert table_versions(t) == [3]
    assert "vX-orphan-00000.parquet" in deleted
    # only version-3 files remain and the table still reads
    assert _rows(read_versioned(spark, t)) == [(2, "x")]
    live = set(os.listdir(data))
    assert all(f.startswith("v3-") for f in live)
