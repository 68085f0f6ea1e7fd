"""Structured Streaming surface: file-source -> watermarked windowed aggs
-> memory sink, compared against the equivalent batch computation."""

from __future__ import annotations

import pyspark.sql.functions as F

from vtb_datafusion_2023_spark import sqlgen
from vtb_datafusion_2023_spark.sources.readers import load_table
from vtb_datafusion_2023_spark.streaming import (
    read_events_stream,
    replay_to_table,
    session_window_agg,
    windowed_event_counts,
    windowed_user_spend,
)


def _run_stream(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def test_windowed_event_counts_matches_batch(spark, sf_small):
    stream = read_events_stream(spark, sf_small)
    got = _run_stream(spark, windowed_event_counts(stream), "wec").collect()
    ev = load_table(spark, sf_small, "events")
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
        .collect()
    )
    assert {(r.win_start, r.event_type, r.n) for r in got} == {
        (r.win_start, r.event_type, r.n) for r in want
    }
    assert len(got) > 0


def test_windowed_user_spend_matches_batch(spark, sf_small):
    stream = read_events_stream(spark, sf_small)
    got = _run_stream(spark, windowed_user_spend(stream), "wus").collect()
    ev = load_table(spark, sf_small, "events")
    want = (
        ev.groupBy(F.window("ts", "6 hours").alias("win"), "user_id")
        .agg(F.expr(sqlgen.dsum("value")).alias("spend"))
        .select(F.col("win.start").alias("win_start"), "user_id", "spend")
        .collect()
    )
    assert {(r.win_start, r.user_id, r.spend) for r in got} == {
        (r.win_start, r.user_id, r.spend) for r in want
    }


def test_session_window_stream_emits_subset_of_batch(spark, sf_small):
    """Streaming session_window (append mode, watermarked): every emitted
    session must equal its batch counterpart; sessions still open at the
    final watermark are legitimately withheld."""
    stream = read_events_stream(spark, sf_small).withWatermark("ts", "1 hour")
    got = replay_to_table(spark, session_window_agg(stream), mode="append").collect()
    want = {
        tuple(r) for r in session_window_agg(load_table(spark, sf_small, "events")).collect()
    }
    assert len(got) > 0
    for r in got:
        assert tuple(r) in want


def test_foreach_batch_parquet_sink_is_idempotent(spark, sf_small, tmp_path):
    from vtb_datafusion_2023_spark.sources.readers import load_table
    from vtb_datafusion_2023_spark.streaming.events import read_events_stream
    from vtb_datafusion_2023_spark.streaming.sinks import foreach_batch_parquet

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, sf_small).select("event_id", "user_id", "value")
    foreach_batch_parquet(stream, out, ckpt)
    got = spark.read.parquet(out)
    batch = load_table(spark, sf_small, "events")
    assert got.count() == batch.count()
    assert got.select("event_id").distinct().count() == batch.count()
    # re-running with the same checkpoint commits nothing new (offsets
    # already recorded) — contents unchanged
    foreach_batch_parquet(
        read_events_stream(spark, sf_small).select("event_id", "user_id", "value"),
        out,
        ckpt,
    )
    assert spark.read.parquet(out).count() == batch.count()


def test_upsert_snapshot_latest_wins_across_batches(spark, sf_small, tmp_path):
    """CDC snapshot: stream the events change-log in multiple micro-batches;
    the final snapshot must equal batch latest_by_key over ALL events, and
    re-running with the same checkpoint must be a no-op."""
    from vtb_datafusion_2023_spark.operators.cleaning import latest_by_key
    from vtb_datafusion_2023_spark.sources.readers import load_table
    from vtb_datafusion_2023_spark.streaming.sinks import upsert_snapshot

    ev = load_table(spark, sf_small, "events").select(
        "user_id", "ts", "event_type", "value", "event_id"
    )
    src = str(tmp_path / "changelog")
    ev.repartition(4).write.parquet(src)  # 4 files -> 4 micro-batches

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    upsert_snapshot(stream, snap, ckpt, ["user_id"], ["ts", "event_id"])

    got = spark.read.parquet(snap)
    want = latest_by_key(ev, ["user_id"], ["ts", "event_id"])
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    # replay with same checkpoint: committed batches skipped, snapshot stable
    stream2 = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    upsert_snapshot(stream2, snap, ckpt, ["user_id"], ["ts", "event_id"])
    got2 = spark.read.parquet(snap)
    assert got2.exceptAll(want).count() == 0 and want.exceptAll(got2).count() == 0


def test_upsert_snapshot_recovers_from_crash_between_renames(spark, sf_small, tmp_path):
    """A crash between 'snapshot -> .old' and 'staged -> snapshot' leaves
    only .old on disk; the next run must RESTORE it before merging —
    otherwise every key outside the replayed batch is silently lost."""
    import os

    from vtb_datafusion_2023_spark.operators.cleaning import latest_by_key
    from vtb_datafusion_2023_spark.sources.readers import load_table
    from vtb_datafusion_2023_spark.streaming.sinks import upsert_snapshot

    ev = load_table(spark, sf_small, "events").select(
        "user_id", "ts", "event_type", "value", "event_id"
    )
    src = str(tmp_path / "changelog")
    ev.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    upsert_snapshot(stream, snap, ckpt, ["user_id"], ["ts", "event_id"])

    # simulate the crash window: snapshot renamed away, .old is the only copy
    os.rename(snap, snap + ".old")

    # one new (tiny) change-log file, fresh checkpoint so it replays all
    extra = ev.limit(1)
    extra.write.mode("append").parquet(src)
    stream2 = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    upsert_snapshot(stream2, snap, str(tmp_path / "ckpt2"), ["user_id"], ["ts", "event_id"])

    got = spark.read.parquet(snap)
    want = latest_by_key(ev, ["user_id"], ["ts", "event_id"])
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    assert not os.path.exists(snap + ".old")


def test_sentinel_empty_table_and_units(spark, sf_small, tmp_path):
    """The sentinel anchor must fail loudly on an empty events table (not
    TypeError on None) and accept day/second units."""
    import pytest as _pytest

    from vtb_datafusion_2023_spark.streaming.events import (
        EVENTS_STREAM_SCHEMA,
        events_stream_with_sentinel,
    )

    empty_dir = str(tmp_path / "empty_sf")
    spark.createDataFrame([], EVENTS_STREAM_SCHEMA).write.parquet(
        empty_dir + "/events.parquet"
    )
    with _pytest.raises(ValueError, match="empty"):
        events_stream_with_sentinel(spark, empty_dir)
    # day units parse; custom event types reach the sentinel rows
    s = events_stream_with_sentinel(
        spark, sf_small, advance="2 days", event_types=("view",)
    )
    assert s.isStreaming


def test_stream_to_versioned_table_exactly_once(spark, sf_small, tmp_path):
    """Streaming sink into a manifest table: each micro-batch commits one
    append version stamped with its batch_id; replaying the SAME batches
    (fresh checkpoint, same source) no-ops instead of duplicating rows."""
    from vtb_datafusion_2023_spark.sources.manifest import (
        read_versioned,
        table_versions,
    )
    from vtb_datafusion_2023_spark.streaming.events import read_events_stream
    from vtb_datafusion_2023_spark.streaming.sinks import stream_to_versioned_table

    t = str(tmp_path / "vt")
    stream = read_events_stream(spark, sf_small).select("event_id", "user_id", "value")
    stream_to_versioned_table(stream, t, str(tmp_path / "ck1"))

    versions = table_versions(t)
    assert versions, "no versions committed"
    n = read_versioned(spark, t).count()
    assert n == spark.read.parquet(f"{sf_small}/events.parquet").count()

    # same checkpoint: offsets already committed -> no new versions
    stream_to_versioned_table(
        read_events_stream(spark, sf_small).select("event_id", "user_id", "value"),
        t,
        str(tmp_path / "ck1"),
    )
    assert table_versions(t) == versions

    # FRESH checkpoint (simulated reprocessing): batch ids repeat from 0,
    # the manifest guard makes each a no-op -> identical row count
    stream_to_versioned_table(
        read_events_stream(spark, sf_small).select("event_id", "user_id", "value"),
        t,
        str(tmp_path / "ck2"),
    )
    assert read_versioned(spark, t).count() == n
