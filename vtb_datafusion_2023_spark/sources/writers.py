"""Sinks (SURVEY §2.1 S3/S4).

The reference writes CSV submissions (``/root/reference/run.py:85,486``).
At scale, CSV single-file output is a driver bottleneck — ``coalesce(1)``
is only acceptable for small result tables (submissions are one row per
user).  Internal checkpoints go to parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_jsonl(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Newline-delimited JSON sink (document-corpus interchange).  One
    file only for small exports; at scale keep one file per task."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def checkpoint_parquet(df: DataFrame, path: str) -> DataFrame:
    """Materialize-and-reread (S4): the Spark version of the reference's
    write-then-re-read of its cleaned intermediate (run.py:84-90).

    Truncates lineage — useful before wide fan-out reuse when ``.cache()``
    memory pressure would cause recomputation at 100 TB.
    """
    write_parquet(df, path)
    return df.sparkSession.read.parquet(path)


def write_sorted_parquet(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int | None = None
) -> None:
    """Range-partitioned, sorted parquet layout for data skipping: rows
    are range-partitioned on ``sort_cols`` (each file owns a contiguous,
    near-disjoint key range) and sorted within each file, so parquet
    row-group min/max statistics prune whole files/row-groups for
    point and range predicates on those columns — the poor-man's
    clustering key, free at read time.

    Use for fact tables queried by selective ranges (time, id) when
    directory partitioning (``partition_by``) would create too many tiny
    directories (high-cardinality keys).
    """
    cols = [df[c] for c in sort_cols]
    out = (
        df.repartitionByRange(n_files, *cols) if n_files else df.repartitionByRange(*cols)
    )
    out.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink (columnar interchange with Hive-ecosystem consumers; same
    pushdown/pruning properties as parquet in Spark's scan)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def compact_parquet(
    spark: SparkSession, path: str, out_path: str, target_file_mb: int = 512
) -> int:
    """Small-files compaction: rewrite a parquet dataset into files of
    ~``target_file_mb`` each (computed from the actual on-disk size, no
    data scan).  The operational fix for streaming sinks and over-
    partitioned writes — at 100 TB, listing/footers of millions of tiny
    files dominate query startup; nightly compaction keeps scans
    footer-bound, not listing-bound.  Returns the output file count.
    """
    import glob
    import os

    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    total = sum(os.path.getsize(f) for f in files)
    n = max(1, -(-total // (target_file_mb * 1024 * 1024)))  # ceil
    spark.read.parquet(path).repartition(int(n)).write.mode("overwrite").parquet(out_path)
    return int(n)
