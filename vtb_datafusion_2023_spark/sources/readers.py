"""Sources: schema-pinned CSV/parquet scans (SURVEY §2.1 S1/S2/S4).

The reference scans one CSV with parse_dates + dtype map
(``/root/reference/model.py:208-213``) and re-reads a materialized
intermediate three times (``run.py:84-90,185`` — S4).  Spark-first:

- CSV scans carry an explicit ``StructType`` (no schema inference pass —
  inference would be a full extra read of 100 TB).
- Parquet is the internal format: columnar, predicate-pushdown- and
  column-pruning-friendly; ``.explain`` shows PushedFilters/ReadSchema.
- Re-used intermediates are ``.cache()``-ed or checkpointed to parquet
  instead of re-parsed (S4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic parquet table (TESTDATA.md).

    ``events.ts`` is stored as TIMESTAMP(MICROS, isAdjustedToUTC=false);
    Spark 4 scans that as TIMESTAMP_NTZ — bit-identical to DuckDB's read
    of the same file.  We normalize to a session-UTC TIMESTAMP so every
    downstream operator (``unix_micros``, windows, watermarks) sees one
    type regardless of reader mode.  The ``bigint`` branch covers
    nanos-typed variants read under the legacy ``nanosAsLong`` conf.
    The conversion is a narrow projection; filter pushdown on the
    column still works.
    """
    from ..session import tune_session

    tune_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_transactions_csv(
    spark: SparkSession, path: str, drop_null: bool = True, stamp_ord: bool = False
) -> DataFrame:
    """S1+S2: schema-pinned CSV scan of the canonical transactions table.

    ``drop_null`` mirrors ``.dropna()`` on ingest
    (/root/reference/model.py:214).  ``stamp_ord=True`` adds a
    monotonically-increasing order stamp when the file lacks an explicit
    ``ord`` column; note monotonic ids are only unique+increasing, not
    dense, and are assigned per input split — adequate as a deterministic
    tie-break for a single ordered file read (SURVEY §7.4.1).
    """
    ddl = (
        "user_id long, mcc_code int, currency_rk int, "
        "transaction_amt double, transaction_dttm timestamp"
        + ("" if stamp_ord else ", ord long")
    )  # string DDL of TX_SCHEMA — keeps CSV column-order binding explicit
    df = spark.read.schema(ddl).option("header", True).csv(path)
    if stamp_ord:
        df = df.withColumn("ord", F.monotonically_increasing_id())
    if drop_null:
        df = df.na.drop()
    return df


def read_jsonl(
    spark: SparkSession, path: str, schema: str, drop_corrupt: bool = True
) -> DataFrame:
    """Schema-pinned newline-delimited JSON scan — the common wire format
    for document/training-data corpora.

    The explicit schema (DDL string) skips Spark's inference pass (a full
    extra read at 100 TB) and pins types against drifting producers.
    ``drop_corrupt`` routes unparseable lines to a ``_corrupt_record``
    column and filters them instead of failing the scan (PERMISSIVE mode).
    """
    from ..session import tune_session

    tune_session(spark)
    full = schema + (", _corrupt_record string" if drop_corrupt else "")
    df = spark.read.schema(full).option("mode", "PERMISSIVE").json(path)
    if drop_corrupt:
        df = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return df


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — predicate pushdown and column pruning work as for
    parquet (tested in test_plan_shapes)."""
    return spark.read.orc(path)


def read_csv_robust(
    spark: SparkSession, path: str, schema: str, drop_corrupt: bool = True
) -> DataFrame:
    """Schema-pinned CSV scan that survives malformed rows: PERMISSIVE
    mode routes unparseable lines into ``_corrupt_record`` and we drop
    (or surface) them instead of failing the scan — at 100 TB a handful
    of mangled rows must never kill the job.  Set ``drop_corrupt=False``
    to keep the corrupt column for a quarantine sink."""
    from ..session import tune_session

    tune_session(spark)
    full = schema + ", _corrupt_record string"
    df = (
        spark.read.schema(full)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    if drop_corrupt:
        df = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return df


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written at different schema versions as one DataFrame.

    ``mergeSchema`` unions the footer schemas at planning time (columns
    added over a dataset's lifetime appear as NULL in files that predate
    them) — the normal state of a 100 TB dataset that has been appended
    to for years.  Column pruning and predicate pushdown still apply
    per-file against each file's physical schema, so old files are not
    penalized.  Type WIDENING across versions (int -> long etc.) is not
    handled here — evolve by adding columns, or migrate with an explicit
    cast-and-rewrite pass.
    """
    return spark.read.option("mergeSchema", True).parquet(*paths)
