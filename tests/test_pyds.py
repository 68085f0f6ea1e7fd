"""Custom Python DataSources (Spark 4): media directory scan + versioned
manifest tables through spark.read.format(...)."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from vtb_datafusion_2023_spark.operators.codecs import (
    encode_bmp,
    encode_gif,
    encode_png,
    encode_wav,
)
from vtb_datafusion_2023_spark.sources.pyds import register_datasources


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_datasources(spark)


def test_media_source_scans_and_decodes_directory(spark, tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (8, 9, 3)).astype(np.uint8)
    gray = rng.integers(0, 256, (5, 6)).astype(np.uint8)
    pcm = rng.integers(-100, 100, 64).astype(np.int16)
    (tmp_path / "a.png").write_bytes(encode_png(img))
    (tmp_path / "b.gif").write_bytes(encode_gif(gray))
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "c.wav").write_bytes(encode_wav(pcm))
    (tmp_path / "d.bmp").write_bytes(encode_bmp(img))
    (tmp_path / "skip.txt").write_text("not media")

    rows = {os.path.basename(r.path): r for r in
            spark.read.format("media").load(str(tmp_path)).collect()}
    assert set(rows) == {"a.png", "b.gif", "c.wav", "d.bmp"}  # txt skipped
    assert rows["a.png"].container == "png"
    assert (rows["a.png"].width, rows["a.png"].height) == (9, 8)
    assert abs(rows["a.png"].feature[0] - img.astype(float).mean()) < 1e-12
    assert rows["b.gif"].container == "gif" and rows["b.gif"].width == 6
    assert rows["c.wav"].container == "wav" and rows["c.wav"].feature[2] == 64.0
    assert all(r.error is None for r in rows.values())


def test_media_source_reports_undecodable_payloads(spark, tmp_path):
    # a WAV with an unsupported codec tag: typed row with error, no crash
    import struct

    fmt = struct.pack("<HHIIHH", 99, 1, 8000, 8000, 1, 8)
    bad = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", 0))
    (tmp_path / "bad.wav").write_bytes(bad)
    r = spark.read.format("media").load(str(tmp_path)).collect()[0]
    assert r.container == "wav" and r.width is None and "codec 99" in r.error


def test_versioned_source_latest_and_time_travel(spark, tmp_path):
    from vtb_datafusion_2023_spark.sources.manifest import commit_versioned

    t = str(tmp_path / "tbl")
    commit_versioned(
        spark.range(0, 100).selectExpr("id as k", "id*2 as v"), t
    )
    commit_versioned(
        spark.range(100, 150).selectExpr("id as k", "id*2 as v"), t, mode="append"
    )
    latest = spark.read.format("versioned").load(t)
    assert latest.count() == 150 and latest.columns == ["k", "v"]
    assert latest.agg(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(150))
    v1 = spark.read.format("versioned").option("version", "1").load(t)
    assert v1.count() == 100
    # SQL-only surface
    spark.sql(
        f"create or replace temporary view vt using versioned options (path '{t}')"
    )
    assert spark.sql("select count(*) n from vt").collect()[0].n == 150


def test_media_source_streams_new_files_incrementally(spark, tmp_path):
    """format('media') as a streaming source: batch 1 sees the initial
    files, batch 2 only the file added afterwards; restart from the
    checkpoint re-reads nothing."""
    import numpy as np

    d = tmp_path / "landing"
    d.mkdir()
    rng = np.random.default_rng(1)
    (d / "0001.png").write_bytes(encode_png(rng.integers(0, 256, (4, 5, 3)).astype(np.uint8)))
    (d / "0002.gif").write_bytes(encode_gif(rng.integers(0, 256, (3, 3)).astype(np.uint8)))

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run_once():
        q = (
            spark.readStream.format("media")
            .load(str(d))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_once()
    first = {os.path.basename(r.path) for r in spark.read.parquet(out).collect()}
    assert first == {"0001.png", "0002.gif"}

    (d / "0003.png").write_bytes(encode_png(rng.integers(0, 256, (6, 6, 3)).astype(np.uint8)))
    run_once()
    rows = spark.read.parquet(out).collect()
    names = sorted(os.path.basename(r.path) for r in rows)
    assert names == ["0001.png", "0002.gif", "0003.png"]  # no re-reads

    run_once()  # nothing new
    assert spark.read.parquet(out).count() == 3


def test_versioned_source_pushdown_prunes_partitions(spark, tmp_path):
    """pushFilters + manifest zone maps: a narrow range plans only the
    overlapping file's partition; every filter is still applied exactly."""
    from vtb_datafusion_2023_spark.sources.manifest import commit_versioned

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        t = str(tmp_path / "zt")
        df = spark.range(0, 10000).selectExpr("id as k", "id*2 as v").repartitionByRange(10, "k")
        commit_versioned(df, t, stats_cols=["k"])

        narrow = (spark.read.format("versioned").option("pushdown", "true")
                  .load(t).filter("k >= 2500 and k <= 2600"))
        got = sorted(r.k for r in narrow.collect())
        assert got == list(range(2500, 2601))
        assert narrow.rdd.getNumPartitions() <= 2
        assert spark.read.format("versioned").load(t).rdd.getNumPartitions() == 10
        # equality predicate prunes too
        one = (spark.read.format("versioned").option("pushdown", "true")
               .load(t).filter("k = 7777"))
        assert one.rdd.getNumPartitions() == 1 and one.collect()[0].v == 15554
        # disjoint range: zero partitions planned, empty result
        none = (spark.read.format("versioned").option("pushdown", "true")
                .load(t).filter("k > 99999"))
        assert none.count() == 0
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")


def test_versioned_source_streams_appends(spark, tmp_path):
    """readStream on a versioned table emits each append exactly once:
    batch 1 = v1's rows, after an append only the delta arrives, and an
    up-to-date re-run emits nothing."""
    from vtb_datafusion_2023_spark.sources.manifest import commit_versioned

    t = str(tmp_path / "vt")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    commit_versioned(spark.range(0, 100).selectExpr("id as k", "id*2 as v"), t)

    def run_once():
        q = (
            spark.readStream.format("versioned")
            .load(t)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_once()
    assert spark.read.parquet(out).count() == 100

    commit_versioned(
        spark.range(100, 130).selectExpr("id as k", "id*2 as v"), t, mode="append"
    )
    run_once()
    got = spark.read.parquet(out)
    assert got.count() == 130  # only the 30-row delta was appended
    assert got.select("k").distinct().count() == 130

    run_once()  # nothing new
    assert spark.read.parquet(out).count() == 130


def test_versioned_stream_rejects_overwrite_between_offsets(spark, tmp_path):
    """An overwrite commit renames every data file, so a file-name diff
    would re-emit the whole snapshot as 'new' rows.  The change feed must
    raise instead of silently duplicating (exactly-once contract)."""
    from vtb_datafusion_2023_spark.sources.manifest import commit_versioned
    from vtb_datafusion_2023_spark.sources.pyds import VersionedTableStreamReader

    t = str(tmp_path / "vt2")
    commit_versioned(spark.range(0, 50).selectExpr("id as k"), t)  # v1
    commit_versioned(spark.range(50, 60).selectExpr("id as k"), t, mode="append")  # v2
    commit_versioned(spark.range(0, 9).selectExpr("id as k"), t, mode="overwrite")  # v3

    r = VersionedTableStreamReader({"path": t})
    # append-only range is fine
    assert r._check_append_only(1, 2) is None
    # crossing the overwrite raises loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overwrite"):
        r._check_append_only(2, 3)
    # initial batch (start=0) legitimately emits the current snapshot
    assert r._check_append_only(0, 3) is None


def test_versioned_stream_rejects_merge_between_offsets(spark, tmp_path):
    """A merge commit rewrites each touched bucket into fresh file names
    (carried rows included), so the file-name diff would re-emit carried
    rows as duplicates — the guard must reject merge like overwrite."""
    import pytest as _pytest

    from vtb_datafusion_2023_spark.sources.manifest import (
        commit_versioned_bucketed,
        merge_into,
    )
    from vtb_datafusion_2023_spark.sources.pyds import VersionedTableStreamReader

    t = str(tmp_path / "vt3")
    commit_versioned_bucketed(
        spark.range(0, 50).selectExpr("id as k", "id * 2 as v"), t, key_col="k", n_buckets=4
    )  # v1
    merge_into(spark, t, spark.createDataFrame([(3, 999)], "k long, v long"))  # v2

    r = VersionedTableStreamReader({"path": t})
    with _pytest.raises(ValueError, match="merge"):
        r._check_append_only(1, 2)
    # initial batch still emits the snapshot
    assert r._check_append_only(0, 2) is None
