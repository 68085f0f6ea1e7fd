"""Hypertable-style time rollups: one pass, every granularity.

The reference buckets event time at a single granularity per pivot
(hour/dow/dom — /root/reference/run.py:335-424).  At 100 TB a dashboard
pipeline wants day totals AND hour detail AND the grand total without
three scans: ``ROLLUP`` grouping sets compute all levels in ONE shuffle
(Spark plans a single hash aggregate over the expanded grouping-set keys),
and ``grouping_id`` labels each output row's level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import sqlgen


def time_rollup(
    events: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Multi-granularity event rollup: (day, hour) detail, per-day
    subtotals, and the grand total, labeled by ``lvl`` (grouping_id:
    0 = day+hour, 1 = day subtotal, 3 = grand total).

    The value total uses the decimal-exact sum (``sqlgen.dsum``) so every
    level is bitwise reproducible regardless of partitioning.
    """
    return (
        events.select(
            F.date_trunc("day", F.col(ts_col)).alias("day"),
            F.hour(F.col(ts_col)).alias("hour"),
            F.col(value_col).alias("_v"),
        )
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(sqlgen.dsum("_v")).alias("total"),
            F.grouping_id().alias("lvl"),
        )
    )


def cube_agg(
    df: DataFrame,
    dims: list[str],
    value_col: str,
) -> DataFrame:
    """CUBE over ``dims``: every dimension-subset subtotal (2^|dims|
    grouping sets) in ONE shuffle — Spark expands the grouping sets and
    hash-aggregates once, vs 2^n separate scans.  ``lvl`` =
    ``grouping_id`` labels each row's subset.  Decimal-exact totals.
    """
    return (
        df.cube(*dims)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(sqlgen.dsum(value_col)).alias("total"),
            F.grouping_id().alias("lvl"),
        )
    )


def partial_agg(
    df: DataFrame,
    keys: list,
    value_col: str,
    prefix: str = "total",
) -> DataFrame:
    """Per-key mergeable aggregation state: row count plus the fixed-point
    hi/lo integer sums of ``value_col`` (``sqlgen.fsum_state``).

    This is incremental-rollup building block #1: aggregate each new
    ingest batch/partition to its partial state and persist it — history
    never rescans.  The state is exact integers, so merge order and
    partitioning cannot change the finished total by even one bit.
    """
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.expr(e) for e in sqlgen.fsum_state(value_col, prefix)],
    )


def merge_partials(parts: list[DataFrame], keys: list[str], prefix: str = "total") -> DataFrame:
    """Merge any number of partial-state tables (exact, associative):
    union -> one re-aggregation on the same keys.  O(groups), not O(rows)
    — the 100 TB lever for maintained dashboards: merging a day's partial
    into a year's rollup touches only group cardinality."""
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(*keys).agg(
        F.expr("cast(sum(n) as bigint) as n"),
        *[F.expr(e) for e in sqlgen.fsum_merge(prefix)],
    )


def finalize_partials(df: DataFrame, prefix: str = "total") -> DataFrame:
    """Finish merged state into the double total; drops the state cols.
    Bitwise identical to a single global aggregate over all rows."""
    return df.withColumn(prefix, F.expr(sqlgen.fsum_final(prefix))).drop(
        f"{prefix}_hi", f"{prefix}_lo"
    )


def partial_distinct(
    df: DataFrame, keys: list, value_col: str, lgk: int = 12, prefix: str = "nd"
) -> DataFrame:
    """Per-key mergeable DISTINCT-COUNT state: an Apache DataSketches HLL
    sketch (``hll_sketch_agg``, binary column ``{prefix}_sk``) — the
    distinct-count analogue of :func:`partial_agg`'s exact sums.

    Incremental-rollup building block: sketch each ingest batch once,
    persist the bytes, merge forever after in O(groups) — history never
    rescans for a distinct count.  Sketches are EXACT while the key set
    fits the sketch's list/set mode (hundreds of values at lgk=12) and
    within ~1.6%/sqrt(2^lgk) beyond it; both bounds hold regardless of
    merge order.
    """
    return df.groupBy(*keys).agg(
        F.expr(f"hll_sketch_agg({value_col}, {lgk})").alias(f"{prefix}_sk")
    )


def merge_distinct_partials(
    parts: list[DataFrame], keys: list[str], prefix: str = "nd"
) -> DataFrame:
    """Union any number of sketch tables -> one ``hll_union_agg`` per key
    (associative, order-insensitive)."""
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(*keys).agg(
        F.expr(f"hll_union_agg({prefix}_sk, true)").alias(f"{prefix}_sk")
    )


def finalize_distinct(df: DataFrame, prefix: str = "nd") -> DataFrame:
    """Finish merged sketches into bigint distinct-count estimates."""
    return df.withColumn(
        prefix, F.expr(f"cast(hll_sketch_estimate({prefix}_sk) as bigint)")
    ).drop(f"{prefix}_sk")


def partial_cms(
    df: DataFrame,
    keys: list,
    value_col: str,
    depth: int = 3,
    width: int = 4096,
    prefix: str = "cms",
) -> DataFrame:
    """Per-key mergeable FREQUENCY state: a count-min sketch (Cormode &
    Muthukrishnan 2005) stored sparsely as ``(keys, {prefix}_d,
    {prefix}_p, {prefix}_n)`` rows — depth hash rows x width buckets,
    only touched cells materialized.  Completes the mergeable-state
    family: exact sums (``partial_agg``), distinct counts
    (``partial_distinct``), now item frequencies.

    Build = explode ``depth`` JVM-side hash positions per row + one hash
    agg; merge = re-aggregate (associative, order-free); estimates are
    upper bounds that overshoot a true count only when the item collides
    in EVERY depth row (p ~ (n_distinct/width)^depth).
    """
    pos = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("_d"),
                    F.pmod(F.xxhash64(F.col(value_col), F.lit(d)), F.lit(width)).alias("_p"),
                )
                for d in range(depth)
            ]
        )
    ).alias("_dp")
    return (
        df.select(*keys, pos)
        .select(*keys, F.col("_dp._d").alias(f"{prefix}_d"), F.col("_dp._p").alias(f"{prefix}_p"))
        .groupBy(*keys, f"{prefix}_d", f"{prefix}_p")
        .agg(F.count(F.lit(1)).alias(f"{prefix}_n"))
    )


def merge_cms_partials(parts: list[DataFrame], keys: list[str], prefix: str = "cms") -> DataFrame:
    """Union sketch tables -> one exact integer re-aggregation per cell."""
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(*keys, f"{prefix}_d", f"{prefix}_p").agg(
        F.expr(f"cast(sum({prefix}_n) as bigint) as {prefix}_n")
    )


def cms_estimate(
    state: DataFrame,
    probes: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    depth: int = 3,
    width: int = 4096,
    prefix: str = "cms",
) -> DataFrame:
    """Point-query frequencies for ``probes[value_col]`` against a CMS
    state: recompute each probe's ``depth`` positions, join the touched
    cells (broadcast the probe side — it is the small side by
    construction), take the per-probe MIN over depths; absent cells are
    zero.  Returns the probe columns + ``est``."""
    keys = keys or []
    pos = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("_d"),
                    F.pmod(F.xxhash64(F.col(value_col), F.lit(d)), F.lit(width)).alias("_p"),
                )
                for d in range(depth)
            ]
        )
    ).alias("_dp")
    probe_pos = probes.select("*", pos).select(
        *probes.columns, F.col("_dp._d").alias(f"{prefix}_d"), F.col("_dp._p").alias(f"{prefix}_p")
    )
    # the state is the broadcastable side by construction (<= width*depth
    # cells per key group); probes LEFT-join it so missing cells read as 0
    joined = probe_pos.join(
        F.broadcast(state), on=[*keys, f"{prefix}_d", f"{prefix}_p"], how="left"
    )
    # keyed probes carry the key columns themselves — group each name once
    group_cols = list(dict.fromkeys([*probes.columns, *keys]))
    return joined.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.min(F.coalesce(F.col(f"{prefix}_n"), F.lit(0))).alias("est")
    )


def partial_quantiles(
    df: DataFrame, keys: list, value_col: str, k: int = 32768, prefix: str = "kq"
) -> DataFrame:
    """Per-key mergeable QUANTILE state: an Apache DataSketches KLL
    sketch (``kll_sketch_agg_double``, binary column ``{prefix}_sk``) —
    completing the mergeable-state family: exact sums (``partial_agg``),
    distinct counts (``partial_distinct``), item frequencies
    (``partial_cms``), now order statistics.

    This is the 100 TB shape for percentile thresholds
    (``dp_quality_percentile``'s exact ``percentile`` needs a full sort
    per key; the sketch needs one pass and O(k) memory): sketch each
    ingest batch once, persist the bytes, merge forever after — history
    never rescans for a quantile.  EXACT while a key's count stays
    within the sketch's retained capacity (~``k`` values before the
    first compaction; k=32768 holds a 20k-row key exact, verified vs the
    order-statistic SQL at sf0.1) and within the KLL normalized rank
    error (~1.65% at the default k=200, shrinking ~1/k) beyond; both
    regimes are merge-order-insensitive.  NULLs are ignored, matching
    ``percentile``'s contract.
    """
    return df.groupBy(*keys).agg(
        F.expr(f"kll_sketch_agg_double({value_col}, {k})").alias(f"{prefix}_sk")
    )


def merge_quantile_partials(
    parts: list[DataFrame], keys: list[str], prefix: str = "kq"
) -> DataFrame:
    """Union any number of sketch tables -> one ``kll_merge_agg_double``
    per key (associative; exact-regime merges concatenate the retained
    values, so merged == single-pass bitwise there)."""
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(*keys).agg(
        F.expr(f"kll_merge_agg_double({prefix}_sk)").alias(f"{prefix}_sk")
    )


def quantile_estimate(
    df: DataFrame, fractions: list[float], prefix: str = "kq"
) -> DataFrame:
    """Finish merged sketches into one double column per requested
    fraction (``{prefix}_250`` for 0.25, etc.).  DataSketches inclusive
    rank rule: the returned value is the retained item at sorted
    position ``ceil(q * n)`` (1-based; q=0 -> the minimum), so in the
    exact regime this IS the order statistic — every estimate is an
    actual data value, no interpolation arithmetic to diverge between
    engines."""
    cols = [
        F.expr(
            f"kll_sketch_get_quantile_double({prefix}_sk, cast({f!r} as double))"
        ).alias(f"{prefix}_{int(round(f * 1000)):03d}")
        for f in fractions
    ]
    return df.select(*[c for c in df.columns if c != f"{prefix}_sk"], *cols)


def partial_ols(
    df: DataFrame,
    keys: list,
    x_col: str,
    y_col: str,
    prefix: str = "ols",
) -> DataFrame:
    """Per-key mergeable OLS state: pair count plus the fixed-point hi/lo
    integer sums of x, y, x*y, x*x (``sqlgen.fsum_state``) — the
    incremental building block for maintained regression/trend rollups.
    Each ingest batch aggregates independently; merging the integer
    states is exact in any order, so the finished fit is bitwise
    identical to a full recompute.  Rows with a NULL x or y are dropped
    (the OLS pair contract)."""
    pairs = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        *keys,
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    )
    return pairs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.expr(e) for e in sqlgen.fsum_state("_x", f"{prefix}x")],
        *[F.expr(e) for e in sqlgen.fsum_state("_y", f"{prefix}y")],
        *[F.expr(e) for e in sqlgen.fsum_state("(_x) * (_y)", f"{prefix}xy")],
        *[F.expr(e) for e in sqlgen.fsum_state("(_x) * (_x)", f"{prefix}xx")],
    )


def merge_ols_partials(
    parts: list[DataFrame], keys: list[str], prefix: str = "ols"
) -> DataFrame:
    """Merge OLS partial-state tables (exact, associative): union -> one
    re-aggregation on the keys.  O(groups), not O(rows)."""
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merges = []
    for comp in ("x", "y", "xy", "xx"):
        merges += sqlgen.fsum_merge(f"{prefix}{comp}")
    return u.groupBy(*keys).agg(
        F.expr("cast(sum(n) as bigint) as n"),
        *[F.expr(e) for e in merges],
    )


def ols_estimate(df: DataFrame, prefix: str = "ols") -> DataFrame:
    """Finish merged OLS state into ``(slope, intercept)`` doubles —
    bitwise identical to a single global fit over all rows (the final
    scalar arithmetic is ``sqlgen.ols_from_sums`` over the recombined
    sums, whose values equal a from-scratch ``fsum``).  Drops the state
    columns."""
    sums = {c: sqlgen.fsum_final(f"{prefix}{c}") for c in ("x", "y", "xy", "xx")}
    slope, intercept = sqlgen.ols_from_sums(
        "n", sums["x"], sums["y"], sums["xy"], sums["xx"]
    )
    out = df.withColumn("slope", F.expr(slope)).withColumn(
        "intercept", F.expr(intercept)
    )
    drop = [f"{prefix}{c}_{h}" for c in ("x", "y", "xy", "xx") for h in ("hi", "lo")]
    return out.drop(*drop)
