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
