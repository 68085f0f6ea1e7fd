"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual registry lives in ``vtb_datafusion_2023_spark.suite`` — one
entry per operator from SURVEY.md §2 plus the training-data-pipeline
extensions; this module is a thin re-export.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vtb_datafusion_2023_spark import suite as _suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The END-TO-END submission pipeline — the engine's equivalent of the
    reference's production entry point (``python run.py src out``,
    /root/reference/run.py:17): branch-A ensemble -> A7-A9 robust
    cleaning -> branch-C wide feature matrix -> assembly -> scoring ->
    J4 global-max imputation -> W6 sort (suite/submission_e2e.py,
    hash-certified vs DuckDB as ``pipeline_submission``).
    """
    qs = _suite.queries()
    return qs["pipeline_submission"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _suite.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted => rows-only check)."""
    return _suite.oracle_sql()
