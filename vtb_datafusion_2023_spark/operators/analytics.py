"""Product-analytics operators over event logs: funnels and retention
cohorts.  Natural extensions of the reference's per-user temporal
aggregations (/root/reference/run.py:335-430 buckets event time per
user); these compose the same groupBy/join primitives into the two
standard event-analytics questions.

Scale: every stage keys on ``user_id`` — the same partitioning reused
across steps (co-partitioned joins, no new shuffle key); counts are
plain partial-aggregable hash aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    within: str = "7 days",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel completion counts: users whose first ``steps[0]``
    is followed by the other steps IN ORDER, each strictly later than the
    previous step's completion time and all within ``within`` of step 1.

    Returns (step, step_name, n_users).  Each step is a per-user min-ts
    aggregation joined back on ``user_col`` — all stages share one
    partitioning; at 100 TB this is len(steps) co-partitioned hash aggs,
    no wide state.
    """
    spark = events.sparkSession
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_0"))
        .withColumn("deadline", F.expr(f"t_0 + interval {within}"))
    )
    rows = [(1, steps[0], cur)]
    for i, step in enumerate(steps[1:], start=2):
        prev_t = f"t_{i - 2}"
        cur = (
            events.filter(F.col(type_col) == step)
            .join(cur, user_col)
            .filter((F.col(ts_col) > F.col(prev_t)) & (F.col(ts_col) <= F.col("deadline")))
            .groupBy(user_col, "deadline")
            .agg(F.min(ts_col).alias(f"t_{i - 1}"))
        )
        rows.append((i, step, cur))
    counts = [
        df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step"), F.lit(name).alias("step_name"), "n_users"
        )
        for i, name, df in rows
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen week
    (cohort), counted per subsequent active week.

    Returns (cohort_week, weeks_since, n_active).  Two hash aggs and one
    user-keyed join — the cohort table is 1 row/user and joins
    co-partitioned with the distinct-activity table.
    """
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    active = (
        events.select(user_col, F.date_trunc("week", F.col(ts_col)).alias("week"))
        .distinct()
    )
    return (
        active.join(first, user_col)
        .withColumn(
            "weeks_since",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("int"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count_distinct(F.col(user_col)).alias("n_active"))
    )
