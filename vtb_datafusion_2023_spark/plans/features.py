"""Branch C: the wide per-user feature matrix
(/root/reference/run.py:185-430), composed from the operator library.

Input contract: a transactions DataFrame with columns
(user_id, cat [category code], amt [signed], ts, ord).

Output: (features_df keyed by user_id, dropped_users_df) — users whose
rows all vanished under trim+blacklist are tracked for the J3/J4
imputation path, exactly like run.py:200-202.

Plan shape at scale: one user-window (trim), one (user, cat) hash
aggregate feeding every category block, one user hash aggregate for the
temporal blocks — the wide matrix appears only in the final joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.temporal import with_time_parts
from ..operators.filtering import blacklist as _blacklist
from ..operators.filtering import positional_trim
from ..operators.gstats import horizontal_stats, vertical_stats
from ..operators.joins import anti_join_missing, assemble_features
from ..operators.pivots import pivot_agg, row_normalize
from ..schema import DAYS_OF_MONTH, DAYS_OF_WEEK, HOURS


def branch_c_features(
    tx: DataFrame,
    cat_vocab: Sequence,
    trim: int = 20,
    blacklist_cats: Sequence = (6012,),
    freq_divisor: int = 20,
    materialize: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """``materialize``: pin the trimmed+blacklisted row set once
    (block-manager localCheckpoint) before the ~7 downstream blocks —
    otherwise each block replays the trim window (measured: recompute
    0.36 s/block vs 0.15 s/block off the checkpoint at sf0.1).  Off by
    default: a 3-block composition (pipeline_user_profile shape) is
    cheaper recomputed; the 8-block submission pipeline flips it on."""
    tx = with_time_parts(tx.withColumnRenamed("ts", "transaction_dttm"))
    trimmed = positional_trim(tx, "user_id", ["transaction_dttm", "ord"], trim, trim)
    users_before = trimmed.select("user_id").distinct()
    kept = _blacklist(trimmed, "cat", *blacklist_cats)
    if materialize:
        kept = kept.localCheckpoint(eager=True)
    dropped = anti_join_missing(users_before, kept, "user_id")

    # category blocks from ONE long aggregate
    long = kept.groupBy("user_id", "cat").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.expr(
            "(cast(cast(sum(cast(amt as decimal(38,6))) - (sum(cast(amt as decimal(38,6))) % 1) as decimal(38,0)) as double)"
            " + cast(sum(cast(amt as decimal(38,6))) % 1 as double)) as amt_sum"
        ),
        F.expr(
            "count(case when amt > 0 then amt end) as debit_cnt"
        ),
    )
    # P6: bucketed counts (`//= 20`, run.py:248-249) feed the stats blocks
    long = long.withColumn("cnt_b", F.floor(F.col("cnt") / freq_divisor))
    freq_long = row_normalize(long, "user_id", "cnt", out_col="freq")

    cat_count = pivot_agg(kept, "user_id", "cat", cat_vocab, agg="count", prefix="mcc_freq")
    cat_sum = pivot_agg(
        kept, "user_id", "cat", cat_vocab, agg="sum", value_col="amt", prefix="mcc_sum", fill=0.0
    )
    freq_stats = horizontal_stats(long, "user_id", "cnt_b", "mcc_freq_stats")
    proc_stats = horizontal_stats(freq_long, "user_id", "freq", "mcc_freq_proc_stats")

    # temporal pivot blocks A2-A4
    dom = pivot_agg(kept, "user_id", "day_of_month", DAYS_OF_MONTH, agg="count", prefix="dom")
    dow = pivot_agg(kept, "user_id", "day_of_week", DAYS_OF_WEEK, agg="count", prefix="dow")
    hod = pivot_agg(kept, "user_id", "hour", HOURS, agg="count", prefix="hod")

    # A10 vertical time-of-day stats
    td = vertical_stats(kept, ["user_id"], "time_day", "time_day")

    feats = assemble_features(
        [cat_count, cat_sum, freq_stats, proc_stats, dom, dow, hod, td],
        key="user_id",
        how="outer",
        fill=0.0,
    )
    return feats, dropped
