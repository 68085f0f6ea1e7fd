"""Shared SQL fragments used by BOTH engines.

The driver's t2 gate hash-compares Spark results against DuckDB results.
Plain double aggregates (sum/avg/stddev) are order-dependent, so two
correct engines produce last-ulp-different answers.  Strategy:

- Sums route through an exact DECIMAL(38,6): associative, partitioning-
  independent, bit-identical in any engine (``dsum``).
- Derived statistics (mean/var/std/sem/skew) are computed from those exact
  moment sums with *textually identical* scalar SQL in both engines —
  identical parse tree => identical IEEE-754 double ops => identical bits.
- Exact ``percentile`` (Spark) and ``quantile_cont`` (DuckDB) were verified
  bitwise-equal (both sort + linearly interpolate), so medians/percentiles
  with constant fractions use the builtins.

These fragments are not just test plumbing: decimal-exact sums are the
engine's scale-stable aggregation mode (run-to-run reproducible at 100 TB
regardless of task scheduling), mirrored in ``functions.stats``.
"""

from __future__ import annotations

DEC = "decimal(38,6)"


def dsum(x: str, alias: str | None = None) -> str:
    e = f"cast(sum(cast(({x}) as {DEC})) as double)"
    return f"{e} as {alias}" if alias else e


def davg(x: str, alias: str | None = None) -> str:
    e = f"({dsum(x)} / count({x}))"
    return f"{e} as {alias}" if alias else e


def moment_stats(x: str, prefix: str, percentile_fn: str) -> list[str]:
    """n/mean/median/min/max/std/sem/skew/var/total/amplitude over ``x``.

    pandas semantics (SURVEY §7.4.2): ddof=1 for std/var/sem, adjusted
    Fisher-Pearson G1 skew (the reference's ``.agg(['mean','std',...])`` at
    /root/reference/run.py:428-430).  All float math derives from exact
    decimal moment sums so both engines agree bitwise.

    ``percentile_fn``: "percentile" (Spark) or "quantile_cont" (DuckDB).
    """
    n = f"count({x})"
    s1 = dsum(x)
    s2 = dsum(f"({x})*({x})")
    s3 = dsum(f"({x})*({x})*({x})")
    mean = f"({s1} / {n})"
    # sample variance via exact sums; nullif guards n=1 (pandas: NaN);
    # the case-clamp guards a cancellation-negative tiny variance so sqrt
    # never sees a negative (engines disagree on sqrt(<0)).
    var = f"(({s2} - {s1} * {s1} / {n}) / nullif({n} - 1, 0))"
    var_c = f"(case when {var} < 0 then 0.0 else {var} end)"
    std = f"sqrt({var_c})"
    sem = f"({std} / sqrt({n}))"
    m2 = f"({s2} / {n} - {mean} * {mean})"
    m3 = f"({s3} / {n} - 3 * {mean} * {s2} / {n} + 2 * {mean} * {mean} * {mean})"
    skew = (
        f"(case when {n} >= 3 and {m2} > 0 then "
        f"({m3} / ({m2} * sqrt({m2}))) * sqrt(cast({n} * ({n} - 1) as double)) / ({n} - 2) "
        f"end)"
    )
    return [
        f"{n} as {prefix}_n",
        f"{mean} as {prefix}_mean",
        f"{percentile_fn}({x}, 0.5) as {prefix}_median",
        f"min({x}) as {prefix}_min",
        f"max({x}) as {prefix}_max",
        f"{std} as {prefix}_std",
        f"{sem} as {prefix}_sem",
        f"{skew} as {prefix}_skew",
        f"{var} as {prefix}_var",
        f"{dsum(x)} as {prefix}_sum",
        f"(max({x}) - min({x})) as {prefix}_amplitude",
    ]


def wcumsum(x: str, partition: str, order: str) -> str:
    """Deterministic running sum (W1): decimal window sum cast to double."""
    return (
        f"cast(sum(cast(({x}) as {DEC})) over "
        f"(partition by {partition} order by {order} "
        f"rows between unbounded preceding and current row) as double)"
    )


def wdsum(x: str, partition: str) -> str:
    """Whole-partition deterministic sum as a window (A12/A13 pre-pivot)."""
    return f"cast(sum(cast(({x}) as {DEC})) over (partition by {partition}) as double)"
