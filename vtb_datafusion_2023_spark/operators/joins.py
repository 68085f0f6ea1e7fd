"""Join / assembly operators J1-J5, SO1-SO2, A14-A15 (SURVEY §2.4/§2.5/§2.7).

Join strategy at 100 TB: per-user feature blocks are all keyed by user_id
with ~1 row/user, so the assembly joins are same-key and AQE picks
shuffled-hash/sort-merge with co-partitioning; the label/dimension joins
broadcast the small side explicitly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.stats import dsum


def assemble_features(
    blocks: list[DataFrame], key: str = "user_id", how: str = "outer", fill: float | None = 0.0
) -> DataFrame:
    """J2: multi-way aligned join of per-user feature blocks
    (/root/reference/run.py:435-461 ``pd.concat(axis=1)``).

    ``fill`` mirrors the index-aligned concat's NaN->0 conventions; pass
    None to keep nulls (then ``.na.drop()`` for the reference's strict
    ``dropna`` at run.py:465).
    """
    out = reduce(lambda a, b: a.join(b, on=key, how=how), blocks)
    return out if fill is None else out.na.fill(fill)


def join_labels(features: DataFrame, labels: DataFrame, key: str = "user_id") -> DataFrame:
    """J1: inner equi-join features<->labels with the small side broadcast
    (/root/reference/model.py:151)."""
    return features.join(broadcast(labels), on=key, how="inner")


def anti_join_missing(universe: DataFrame, present: DataFrame, key: str) -> DataFrame:
    """J3/SO2: keys in ``universe`` that vanished from ``present``
    (/root/reference/run.py:200-202 ``np.setdiff1d``)."""
    return (
        universe.select(key).distinct().join(present.select(key).distinct(), on=key, how="left_anti")
    )


def union_fill_max(
    preds: DataFrame, dropped_keys: DataFrame, key: str = "user_id", score_col: str = "target"
) -> DataFrame:
    """J4+A14: re-append dropped users with the GLOBAL Max score
    (/root/reference/run.py:480-482 — conservative imputation for users
    eliminated by cleaning).

    The global max is a scalar subquery (tiny agg broadcast by Catalyst),
    not a driver-side collect.
    """
    mx = preds.agg(F.max(score_col).alias("_mx"))
    filled = dropped_keys.crossJoin(broadcast(mx)).select(
        F.col(key), F.col("_mx").alias(score_col)
    )
    return preds.select(key, score_col).unionByName(filled)


def ensemble_mean(
    runs: list[DataFrame], key: str = "user_id", score_col: str = "target"
) -> DataFrame:
    """A15: mean score across bootstrap repetitions
    (/root/reference/model.py:293).

    Union-all + one hash aggregate: the 50 reference repetitions execute
    as parallel branches of a single job instead of a sequential loop.
    """
    tagged = [df.select(key, score_col) for df in runs]
    unioned = reduce(lambda a, b: a.unionByName(b), tagged)
    return unioned.groupBy(key).agg(
        (dsum(score_col) / F.count(score_col)).alias(f"{score_col}_mean")
    )


def bootstrap_runs(
    df: DataFrame, n_reps: int, fraction: float = 0.95, seed: int = 42
) -> list[DataFrame]:
    """SO3: seeded bootstrap samples with replacement
    (/root/reference/model.py:279-281).  Same distribution, not bitwise
    the same draws as numpy (SURVEY §7.4.5)."""
    return [
        df.sample(withReplacement=True, fraction=fraction, seed=seed + i)
        for i in range(n_reps)
    ]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Skew-mitigated equi-join: spread each hot ``on``-key of the large
    ``left`` side over ``salt`` shuffle partitions by joining on
    ``(on, salt)``, with the small ``right`` side replicated across all
    salt values.

    AQE's skew-join split handles moderate skew on sort-merge joins; this
    is for EXTREME single-key skew (one key larger than a partition) or
    plans AQE can't split.  ``salt`` multiplies the right side's shuffle
    volume — keep the right side small.

    The salt is ``pmod(hash(row), salt)`` — deterministic, so speculative
    re-execution and task retries at cluster scale reproduce identical
    partition contents (``rand()`` would not).  ``salt_from`` defaults to
    every non-map left column (maps aren't hashable in Spark).

    Only inner/left joins: replicating the right side would duplicate its
    unmatched rows under right/full semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_from is None:
        salt_from = [c for c, t in left.dtypes if not t.startswith("map<")]
    sc = "_salt"
    salted = left.withColumn(sc, F.pmod(F.hash(*[F.col(c) for c in salt_from]), F.lit(salt)))
    replicated = right.withColumn(
        sc, F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    return salted.join(replicated, on=[on, sc], how=how).drop(sc)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS-style filter: rows of ``left`` with at least one match in
    ``right`` (the dual of J3's anti join — /root/reference/run.py:200-202
    membership tests).  A left-semi join returns only left columns, never
    multiplies rows, and ships only the join keys of the probe side — at
    100 TB it is strictly cheaper than inner-join + distinct.
    """
    return left.join(right, on=on, how="left_semi")
