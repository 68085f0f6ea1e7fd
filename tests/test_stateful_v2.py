"""transformWithStateInPandas running totals: the final per-user state of
a replayed stream must equal the batch aggregate over the same files."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vtb_datafusion_2023_spark.sources.readers import load_table
from vtb_datafusion_2023_spark.streaming.events import read_events_stream
from vtb_datafusion_2023_spark.streaming.stateful_v2 import running_user_totals


def _has_protobuf() -> bool:
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_gate_raises_clearly_without_protobuf(spark, sf_small):
    if _has_protobuf():
        pytest.skip("protobuf installed; gate inactive")
    with pytest.raises(NotImplementedError, match="protobuf"):
        running_user_totals(read_events_stream(spark, sf_small))


@pytest.mark.skipif(not _has_protobuf(), reason="google.protobuf not installed")
def test_running_totals_final_state_matches_batch(spark, sf_small):
    stream = read_events_stream(spark, sf_small)
    out = running_user_totals(stream)
    name = "rt_v2"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()
    # update-mode sink may hold several emissions per key (one per batch
    # that touched it); the LAST (max n_events) is the final state
    got = {}
    for r in spark.table(name).collect():
        cur = got.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            got[r.user_id] = (r.n_events, r.total_value)
    ev = load_table(spark, sf_small, "events")
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(got) == set(want) and len(got) > 0
    for uid, (n, tot) in want.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - tot) < 1e-6, (uid, got[uid], (n, tot))
