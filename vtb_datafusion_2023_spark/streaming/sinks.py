"""Streaming sinks beyond the memory-table replay harness.

``foreach_batch_parquet`` is the production-shaped sink: each micro-batch
lands in its own ``batch_id=N`` directory with overwrite semantics, so a
batch replayed after failure rewrites the same directory instead of
duplicating rows (idempotent per batch), and the checkpoint tracks which
source offsets are committed.  Readers get exactly-once-per-batch
contents from a plain ``spark.read.parquet(path)`` over the partitioned
layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def foreach_batch_parquet(
    sdf: DataFrame, path: str, checkpoint: str, timeout_sec: int = 300
) -> None:
    """Run a (finite-source) stream to completion, writing every
    micro-batch to ``path/batch_id=N`` parquet.  Re-invoking with the
    same checkpoint is a no-op for already-committed batches."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    q = (
        sdf.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()
