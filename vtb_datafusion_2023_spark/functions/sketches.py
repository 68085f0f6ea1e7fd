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

from pyspark.sql import DataFrame, Window
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


def kmv_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV (k-minimum-values) distinct-count sketch
    (Bar-Yossef et al. 2002), md5-hashed so the estimate is exactly
    replayable by ANY engine — the hash-certifiable twin of the HLL++
    ``approx_distinct`` (same pattern that certified the minhash/simhash
    families: engine-specific sketch for production, md5 twin for the
    oracle gate).

    Estimator: hash each distinct value to a 32-bit integer via md5; with
    ``nd`` distinct hashes the estimate is ``nd`` itself when ``nd < k``
    (exact regime), else ``(k-1) * 2^32 / h_k`` where ``h_k`` is the k-th
    smallest hash.  Relative error ~ 1/sqrt(k-2).

    Scale shape: one (group, hash) distinct (map-side partial), one
    group-partitioned window rank over at most the distinct set, one
    aggregate.  State per group is the distinct set — for a true bounded-
    memory streaming variant keep only the k smallest per partition and
    merge (the estimator only reads the k smallest, so pre-pruning
    partials to k values each is lossless).
    """
    g = list(group_cols)
    h = F.expr(
        f"cast(conv(substring(md5((({value_col}) || '')), 1, 8), 16, 10) as bigint)"
    )
    hashed = df.select(*g, h.alias("_h")).distinct()
    w_rank = Window.partitionBy(*g).orderBy(F.col("_h").asc())
    w_all = Window.partitionBy(*g)
    ranked = hashed.select(
        *g,
        F.col("_h"),
        F.row_number().over(w_rank).alias("_rk"),
        F.count(F.lit(1)).over(w_all).alias("_nd"),
    )
    agg = ranked.groupBy(*g).agg(
        F.max("_nd").alias("_nd"),
        F.max(F.when(F.col("_rk") == k, F.col("_h"))).alias("_hk"),
    )
    est = (
        f"case when _nd < {k} then cast(_nd as double) "
        f"else cast({k - 1} as double) * cast(4294967296 as double) / cast(_hk as double) end"
    )
    return agg.select(*g, F.expr(est).alias("kmv_nd"))


def kmv_set_ops_final_sql(k: int) -> list[str]:
    """The shared float grammar for the KMV set-operation estimators —
    ONE text both engines evaluate over the combined-sketch aggregate
    columns ``(_nl, _hk, _both)``, so equal operand bits give equal
    result bits (the engine's cross-engine float contract).  Returns the
    three aliased select expressions."""
    union = (
        f"case when _nl < {k} then cast(_nl as double) "
        f"else cast({k - 1} as double) * cast(4294967296 as double) "
        f"/ cast(_hk as double) end"
    )
    rho = f"(cast(_both as double) / cast(least(_nl, {k}) as double))"
    return [
        f"{union} as union_est",
        f"({rho} * ({union})) as inter_est",
        f"{rho} as jaccard_est",
    ]


def kmv_set_ops(
    df: DataFrame, set_col: str, value_col: str, k: int = 64,
    max_sets: int | None = 1_000,
) -> DataFrame:
    """KMV set-operation estimates for every unordered pair of sets
    (Beyer et al., SIGMOD'07 "On synopses for distinct-value estimation
    under multiset operations"): from each set's k-minimum-values sketch,
    the k smallest hashes of the COMBINED sketch estimate |A∪B| (same
    estimator as :func:`kmv_distinct`), and the fraction ρ of those that
    appear in BOTH sketches estimates Jaccard — so |A∩B| ≈ ρ·|A∪B|.
    The corpus-curation use: estimating user/document overlap between
    sources, snapshots, or shards WITHOUT a pairwise distinct join over
    the raw data.

    Scale shape: the only corpus-sized work is one (set, hash) distinct
    with map-side partials and one per-set group-limit window; everything
    pairwise runs on the sketch table — |sets|·k rows, broadcastable.
    Exact regime: when the combined sketch holds fewer than k hashes both
    inputs were exact, and the estimators return exact counts.

    md5-hashed like :func:`kmv_distinct`, so the whole result is exactly
    replayable by the DuckDB oracle (deterministic, hash-certifiable).
    Returns ``(set_a, set_b, union_est, inter_est, jaccard_est)``.

    ``max_sets`` guards the pair stage (VERDICT r6 item 5): all-pairs
    over the SET KEYS is the operator's design point for source / shard
    / snapshot grade keys (tens to hundreds of sets — the pair table is
    |sets|²/2 × k sketch rows, broadcastable), but quadratic poison if
    pointed at a user-grade key.  The sketch table is pinned (it feeds
    three plan branches) and the set count — a 1-row aggregate over it —
    is checked eagerly; past the bound the call raises with the remedy
    instead of silently planning |users|² pairs.

    CONTRACT NOTE — this function is EAGER, not a pure plan builder: it
    always localCheckpoints the sketch table (it feeds three plan
    branches), and with ``max_sets`` set it additionally runs a 1-row
    count action at build time to enforce the guard.  Pass
    ``max_sets=None`` when the caller already knows the set-key
    cardinality (e.g. an enumerated source list, or an oracle replay of
    a pinned input) to skip the guard count; the checkpoint remains.
    """
    h = F.expr(
        f"cast(conv(substring(md5((({value_col}) || '')), 1, 8), 16, 10) as bigint)"
    )
    hashed = df.select(F.col(set_col).alias("_s"), h.alias("_h")).distinct()
    w = Window.partitionBy("_s").orderBy(F.col("_h").asc())
    sk = (
        hashed.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("_s", "_h")
        # pinned: feeds the set list (twice, via the pair build) and the
        # combined-sketch join — and the eager guard count below
        .localCheckpoint(eager=True)
    )
    if max_sets is not None:
        n_sets = sk.select(F.countDistinct("_s").alias("_n")).first()["_n"]
        if n_sets > max_sets:
            raise ValueError(
                f"kmv_set_ops: {n_sets} distinct sets exceeds max_sets="
                f"{max_sets}; the pairwise estimate stage is all-pairs over "
                "set keys (meant for source/shard/snapshot-grade keys). "
                "Group the key coarser, raise max_sets only if "
                "|sets|^2 * k sketch rows is genuinely the workload, or "
                "pass max_sets=None to skip this guard count when the "
                "cardinality is already known."
            )
    sets = sk.select("_s").distinct()
    pairs = sets.select(F.col("_s").alias("set_a")).join(
        sets.select(F.col("_s").alias("set_b")), F.col("set_a") < F.col("set_b")
    )
    # per pair, the union of both sketches with membership flags; the
    # OR-join is a broadcast nested loop over the TINY sketch table
    # (|sets|·k rows) — never the corpus
    comb = (
        pairs.join(
            sk, (F.col("_s") == F.col("set_a")) | (F.col("_s") == F.col("set_b"))
        )
        .groupBy("set_a", "set_b", "_h")
        .agg(
            F.max(F.when(F.col("_s") == F.col("set_a"), 1).otherwise(0)).alias("_ina"),
            F.max(F.when(F.col("_s") == F.col("set_b"), 1).otherwise(0)).alias("_inb"),
        )
    )
    w2 = Window.partitionBy("set_a", "set_b").orderBy(F.col("_h").asc())
    w2a = Window.partitionBy("set_a", "set_b")
    r2 = comb.select(
        "set_a",
        "set_b",
        "_h",
        "_ina",
        "_inb",
        F.row_number().over(w2).alias("_rk"),
        F.count(F.lit(1)).over(w2a).alias("_nl"),
    )
    agg = r2.groupBy("set_a", "set_b").agg(
        F.max("_nl").alias("_nl"),
        F.max(F.when(F.col("_rk") == k, F.col("_h"))).alias("_hk"),
        F.sum(
            F.when(
                (F.col("_rk") <= F.least(F.lit(k), F.col("_nl")))
                & (F.col("_ina") == 1)
                & (F.col("_inb") == 1),
                1,
            ).otherwise(0)
        ).alias("_both"),
    )
    return agg.selectExpr("set_a", "set_b", *kmv_set_ops_final_sql(k))
