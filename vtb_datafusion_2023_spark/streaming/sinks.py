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

from ._util import await_or_raise


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
    await_or_raise(q, timeout_sec, "foreach_batch_parquet sink")


def upsert_snapshot(
    sdf: DataFrame,
    snapshot_path: str,
    checkpoint: str,
    key_cols: list[str],
    version_cols: list[str],
    timeout_sec: int = 300,
) -> None:
    """Streaming CDC -> keyed snapshot: each micro-batch merges into a
    latest-wins parquet snapshot (one row per key, greatest version).

    Merge = read current snapshot ∪ batch -> ``latest_by_key`` -> staged
    write -> two-rename swap (snapshot -> ``.old``, staged -> snapshot).
    The swap is NOT one atomic step on a local FS, so the commit protocol
    is crash-CONSISTENT rather than atomic: a crash between the renames
    leaves the snapshot missing with ``.old`` holding the only full copy,
    and the next batch (the failed batch's replay) RESTORES ``.old``
    before merging — no committed key is ever lost.  ``.old`` is deleted
    only after the new snapshot is fully in place.  Replaying a committed
    batch is a no-op by construction (same keys + versions -> same
    winners), which is what makes the sink exactly-once end-to-end on
    top of at-least-once batch delivery.  Single writer assumed (the
    streaming query); a reader racing the swap window may observe a
    brief ENOENT and should retry.

    Scale: the merge is one co-partitioned union + WindowGroupLimit pass
    over O(snapshot + batch) rows.  On an object store, swap the
    rename-based commit for a manifest/table-format commit (Delta- or
    Iceberg-style, or this repo's ``sources.manifest`` versioned tables
    whose one-object manifest publish IS atomic); the merge plan is
    unchanged.
    """
    import shutil

    from ..operators.cleaning import latest_by_key

    def merge_batch(df: DataFrame, batch_id: int) -> None:
        import os

        spark = df.sparkSession
        old = snapshot_path + ".old"
        # crash recovery: a failure between the two renames below (on a
        # prior run) leaves no snapshot but a complete .old — restore it
        # FIRST, or this batch would rebuild the snapshot from itself
        # alone and the rmtree below would destroy every other key
        if not os.path.exists(snapshot_path) and os.path.exists(old):
            os.rename(old, snapshot_path)
        if os.path.exists(snapshot_path):
            cur = spark.read.parquet(snapshot_path)
            merged = latest_by_key(
                cur.unionByName(df.select(cur.columns)), key_cols, version_cols
            )
        else:
            merged = latest_by_key(df, key_cols, version_cols)
        staged = snapshot_path + f".staging-{batch_id}"
        merged.write.mode("overwrite").parquet(staged)
        if os.path.exists(old):  # leftover from a COMPLETED prior swap
            shutil.rmtree(old)
        if os.path.exists(snapshot_path):
            os.rename(snapshot_path, old)
        os.rename(staged, snapshot_path)
        if os.path.exists(old):
            shutil.rmtree(old)

    q = (
        sdf.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, timeout_sec, "upsert_snapshot sink")


def stream_to_versioned_table(
    sdf: DataFrame,
    table_dir: str,
    checkpoint: str,
    stats_cols: list[str] | None = None,
    timeout_sec: int = 300,
) -> None:
    """Stream -> manifest-committed versioned table, EXACTLY-ONCE per
    micro-batch: each batch append-commits one new table version whose
    manifest records the source ``batch_id``; a batch replayed after a
    checkpoint/commit race (Structured Streaming is at-least-once into
    foreachBatch) finds its id already committed and no-ops instead of
    appending duplicates.  This is the standard idempotent-sink contract
    (the same txn-version guard Delta's streaming sink uses), on top of
    the atomic one-object manifest publish — so a crash between data
    staging and manifest publish also leaves no visible partial batch.

    Every version stays time-travel readable; ``compact_versioned`` +
    ``vacuum_versioned`` manage the file count as batches accumulate.
    """
    from ..sources.manifest import (
        _read_manifest,
        commit_versioned,
        table_versions,
    )

    # incremental committed-batch cache: scan each manifest once per
    # process, not once per micro-batch (a 10k-batch stream would
    # otherwise re-parse 10k JSON files before every commit)
    seen_versions: set[int] = set()
    committed: set[int] = set()

    def write_batch(df: DataFrame, batch_id: int) -> None:
        for v in table_versions(table_dir):
            if v in seen_versions:
                continue
            seen_versions.add(v)
            m = _read_manifest(table_dir, v)
            if "batch_id" in m:
                committed.add(m["batch_id"])
        if batch_id in committed:
            return  # replay of an already-committed batch: exactly-once no-op
        # the batch id rides the atomic manifest publish itself, so there
        # is no crash window between data commit and id stamp
        commit_versioned(
            df,
            table_dir,
            mode="append",
            stats_cols=stats_cols,
            manifest_extra={"batch_id": batch_id},
        )
        committed.add(batch_id)

    q = (
        sdf.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, timeout_sec, "stream_to_versioned_table sink")
