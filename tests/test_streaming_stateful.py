"""Stateful streaming: the applyInPandasWithState sessionizer driven by a
real micro-batch query (file source -> memory sink), with sessions
flushed by processing-time timeout."""

from __future__ import annotations

import time

import pandas as pd
import pyspark.sql.functions as F

from vtb_datafusion_2023_spark.streaming import sessionize
from vtb_datafusion_2023_spark.streaming.events import EVENTS_STREAM_SCHEMA


def test_sessionize_emits_on_timeout(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")

    def write_file(name, rows):
        pdf = pd.DataFrame(
            {
                "event_id": range(len(rows)),
                # naive datetime64[us] -> TIMESTAMP(MICROS, adj=false)
                # parquet, the driver file's physical type (scans as
                # TIMESTAMP_NTZ)
                "ts": pd.Series(
                    [base + pd.Timedelta(seconds=s) for s, _u, _v in rows]
                ).astype("datetime64[us]"),
                "user_id": [u for _s, u, _v in rows],
                "event_type": "click",
                "value": [v for _s, _u, v in rows],
                "props": "{}",
            }
        )
        pdf.to_parquet(src / name)

    # batch 1: two users' activity.  User 1's two events are 10 s apart —
    # far beyond the 300 ms gap — so they are TWO sessions: the first
    # closes (and emits) as soon as the batch is processed, the second
    # flushes later by processing-time timeout.
    write_file("b1.parquet", [(0, 1, 1.0), (10, 1, 2.0), (5, 2, 7.0)])

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    sessions = sessionize(stream, gap_minutes=0.005)  # 300 ms inactivity gap
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # let batch 1 land, wait past the gap, then push batch 2 so the
        # next micro-batch fires the timeouts for users 1 and 2
        time.sleep(3)
        write_file("b2.parquet", [(1000, 3, 5.0)])
        deadline = time.time() + 60
        got = []
        while time.time() < deadline:
            got = spark.sql("select * from sess").collect()
            if len(got) >= 3:
                break
            time.sleep(1)
        # a LATE event far before user 3's session (t=900 vs t=1000)
        # must land as its own earlier session — the session_window_agg
        # split — never merge backwards into the t=1000 one
        write_file("b3.parquet", [(900, 3, 9.0)])
        while time.time() < deadline:
            got = spark.sql("select * from sess").collect()
            if sum(r.user_id == 3 for r in got) >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    u3 = sorted((r.n_events, r.total_value) for r in got if r.user_id == 3)
    assert u3 == [(1, 5.0), (1, 9.0)]
    u1 = sorted(
        ((r.session_start, r.n_events, r.total_value) for r in got if r.user_id == 1)
    )
    u2 = [(r.n_events, r.total_value) for r in got if r.user_id == 2]
    # event-time gap splitting: user 1's 10s-apart events are two
    # single-event sessions (the first emitted by the in-batch split,
    # the second by timeout), matching session_window_agg's answer
    assert [(n, v) for _s, n, v in u1] == [(1, 1.0), (1, 2.0)]
    assert u2 == [(1, 7.0)]
