"""Bucketed storage: shuffle-free co-located joins (SCALE.md knob).

At 100 TB the per-user joins (feature assembly J2, label join J1, repeated
pipelines over the same fact table) dominate shuffle volume.  Writing the
fact and feature tables bucketed + sorted by the join key makes Spark plan
a sort-merge join with ZERO exchanges (verified in
tests/test_plan_shapes.py): each task reads matching bucket files from
both sides.

Bucket count guidance: ~(total size / 256 MB) rounded to a power of two;
both sides must use the same count (or a multiple, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Write an external parquet table bucketed (and sorted) by key."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols is None:
        sort_cols = bucket_cols
    w.sortBy(*sort_cols).saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_checkpoint(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """S4 checkpoint with a bucketed layout: materialize an intermediate
    bucketed (and sorted) by its downstream grouping/join key, then read
    it back.  Every subsequent per-key groupBy / window / join over the
    returned frame plans WITHOUT an exchange on that key — the payoff when
    one expensive intermediate (e.g. cleaned transactions) feeds many
    per-user aggregations across a pipeline or repeated runs.
    """
    write_bucketed(df, table, path, bucket_cols, n_buckets, sort_cols)
    return read_bucketed(df.sparkSession, table)
