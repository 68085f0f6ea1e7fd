"""Time-series joins Spark lacks as builtins: as-of join and range join.

These extend the engine beyond the reference's operator set (north-star
"operators the reference has that Spark lacks — or vice versa"): every
event-time pipeline eventually needs "latest prior fact per key" (as-of)
and "facts within a window" (range).

Scale shapes:
- ``asof_join`` uses the union + ordered-window trick: tag both sides,
  union on the key, one window per key carries the last right-side row
  forward.  ONE shuffle+sort on (key) total — no per-row lookups, no
  broadcast requirement, no skew beyond the key distribution (vs the
  naive approach: a non-equi join producing a per-left-row scan of the
  right side).
- ``range_join`` keeps the equi key in the join condition so Spark plans
  a hash/sort-merge join with the range predicate as a post-filter —
  linear in matches, never a cartesian.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    tie_break: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row with
    the greatest ``right_ts`` <= ``left_ts`` for the same key (NULLs when
    no prior right row exists) — DuckDB ``ASOF LEFT JOIN`` semantics.

    ``tie_break``: optional unique right-side column ordering equal right
    timestamps deterministically.
    """
    left_other = [c for c in left.columns if c not in key_cols]
    rv = [f"{prefix}{c}" for c in right_value_cols]

    l_side = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_r"),
        *[F.lit(None).alias(c) for c in rv],
        *[F.col(c).alias(f"_l_{c}") for c in left_other],
    )
    r_side = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_r"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_value_cols],
        *[F.lit(None).alias(f"_l_{c}") for c in left_other],
    )
    unioned = l_side.unionByName(r_side)

    # right rows sort BEFORE left rows at equal ts (as-of includes
    # ts-equal matches); tie_break orders duplicate right timestamps
    order = [F.col("_ts").asc(), F.col("_is_r").desc()]
    if tie_break:
        order.append(F.col(f"{prefix}{tie_break}").asc_nulls_last())
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("_is_r") == 1, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_carry{c}")
            for c in rv
        ],
    )
    return carried.filter(F.col("_is_r") == 0).select(
        *key_cols,
        *[F.col(f"_l_{c}").alias(c) for c in left_other],
        *[F.col(f"_carry{c}").alias(c) for c in rv],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    condition: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-key join + range predicate: the equi keys keep the plan a
    hash/sort-merge join (the range condition applies as a post-filter),
    never a broadcast-nested-loop cartesian."""
    return left.join(right, on=key_cols, how=how).filter(condition)
