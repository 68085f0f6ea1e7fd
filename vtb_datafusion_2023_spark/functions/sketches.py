"""Sketch / approximate aggregates — the 100 TB answer to "how many
distinct X" and "what's the p99" when exact answers would shuffle every
row.

The reference computes only exact aggregates on single-node pandas
(/root/reference/run.py:238-430); at cluster scale the engine needs
bounded-memory alternatives:

- ``approx_distinct``: HyperLogLog++ (Spark's ``approx_count_distinct``),
  relative error ``rsd``, constant memory per group, partial-aggregable
  (map-side combine, one shuffle of tiny sketch buffers).
- ``approx_quantiles``: Greenwald-Khanna (``percentile_approx``) —
  mergeable summaries, vs the exact ``percentile`` used by the oracle
  suite which must sort each group.
- ``heavy_hitters``: EXACT frequency cut by group share.  Two hash
  aggregations, both partial-aggregable; no sketch needed because the
  (group, value) domain is already bounded by the cut.

Approximate results are deterministic for a given input set (HLL++ and GK
merges are order-insensitive), so re-runs at any partitioning reproduce
the same numbers — but they are engine-specific, so the suite registers
them rows-only (no DuckDB value-hash) and pytest asserts the error bound
against the exact answer instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, rsd: float = 0.05
) -> DataFrame:
    """Per-group HLL++ distinct count of ``value_col`` with standard
    deviation ``rsd`` relative error.  Output: group cols + ``approx_nd``."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias("approx_nd")
    )


def approx_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group Greenwald-Khanna quantiles.  Output: group cols +
    ``q_<prob>`` per requested probability (dots stripped for valid
    column names)."""
    aggs = [
        F.percentile_approx(value_col, p, accuracy).alias(f"q_{str(p).replace('.', '_')}")
        for p in probs
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def heavy_hitters(
    df: DataFrame, group_cols: list[str], value_col: str, min_share: float = 0.1
) -> DataFrame:
    """Exact per-group heavy hitters: values of ``value_col`` whose
    in-group frequency share is >= ``min_share``.

    Plan: one (group, value) hash count, then a group-keyed window total —
    both reuse the same partitioning, so the second pass piggybacks on the
    first shuffle's layout.  Share is computed with textually stable SQL
    (bigint / cast double) so it bitwise-matches the DuckDB oracle.
    """
    counts = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("cnt"))
    shared = counts.withColumn(
        "share",
        F.expr(
            "cast(cnt as double) / cast(sum(cnt) over (partition by "
            + ", ".join(group_cols)
            + ") as double)"
        ),
    )
    return shared.filter(F.col("share") >= min_share).select(
        *group_cols, value_col, "cnt", "share"
    )
