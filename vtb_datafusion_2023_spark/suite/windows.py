"""Suite: window / sequence operators W1-W7 (SURVEY §2.6).

Order contract: (ts, event_id) — timestamp plus the unique file-order
stamp, replacing pandas positional semantics (SURVEY §7.4.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import sqlgen
from ..operators.windows import assemble_sequences, keep_last_n, with_cumsum
from . import register
from ._util import T

_ORD = "ts, event_id"


@register(
    "w1_cumsum",
    oracle=f"select event_id, {sqlgen.wcumsum('value', 'user_id', _ORD)} as value_cum from events",
    survey_ref="W1",
    doc="running per-user sum in row order (run.py:116-118), decimal-exact.",
)
def w1_cumsum(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return with_cumsum(ev, "user_id", ["ts", "event_id"], ["value"]).select(
        "event_id", "value_cum"
    )


@register(
    "w2_reanchor_first",
    oracle=f"""
select event_id,
       (value - first_value(value) over (partition by user_id order by {_ORD})) as value_re
from events
""",
    survey_ref="W2",
    doc="re-anchor to the group's first value in row order (run.py:120).",
)
def w2_reanchor_first(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr(
            f"(value - first_value(value) over (partition by user_id order by {_ORD}))"
        ).alias("value_re"),
    )


@register(
    "w3_zscore_per_user",
    oracle=f"select event_id, {sqlgen.zscore_pop('value', 'user_id')} as value_z from events",
    survey_ref="W3",
    doc="per-user z-score, POPULATION std (sklearn StandardScaler ddof=0, run.py:113-115).",
)
def w3_zscore_per_user(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.expr(sqlgen.zscore_pop("value", "user_id")).alias("value_z")
    )


@register(
    "w4_keep_last_n",
    oracle=f"""
with r as (select user_id, value,
                  row_number() over (partition by user_id order by ts desc, event_id desc) as rn
           from events)
select user_id, count(*) as n_last, {sqlgen.dsum('value', 'value_sum')}
from r where rn <= 50 group by user_id
""",
    survey_ref="W4",
    doc="last-N truncation per user (model.py:185-196 `x[:, -300:]`), N=50.",
)
def w4_keep_last_n(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    last = keep_last_n(ev, "user_id", ["ts", "event_id"], 50)
    return last.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_last"), F.expr(sqlgen.dsum("value", "value_sum"))
    )


@register(
    "w6_w7_sequence_assembly",
    oracle="""
with s as (select user_id, list(value order by ts, event_id) as seq from events group by user_id)
select user_id, cast(len(seq) as int) as seq_len,
       seq[1] as first_val, seq[len(seq)] as last_val
from s order by user_id
""",
    survey_ref="W6,W7",
    doc="per-user ordered sequence assembly (run.py:110-126) + final sort (run.py:485); "
    "scalar projections keep the oracle hashable.",
)
def w6_w7_sequence_assembly(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    seqs = assemble_sequences(ev, "user_id", ["ts", "event_id"], ["value"])
    return seqs.select(
        "user_id",
        F.expr("cast(size(seq) as int) as seq_len"),
        F.expr("element_at(element_at(seq, 1), 1) as first_val"),
        F.expr("element_at(element_at(seq, size(seq)), 1) as last_val"),
    ).orderBy("user_id")


@register(
    "w8_rolling_stats",
    oracle=f"""
select event_id,
       {sqlgen.wrollsum('value', 'user_id', _ORD, 5)} as value_roll5_sum,
       ({sqlgen.wrollsum('value', 'user_id', _ORD, 5)}
        / {sqlgen.wrollcount('value', 'user_id', _ORD, 5)}) as value_roll5_mean
from events
""",
    survey_ref="rolling-window",
    doc="trailing 5-row sum/mean per user (decimal-exact sliding window).",
)
def w8_rolling_stats(spark, sf_dir):
    from ..operators.windows import with_rolling

    ev = T(spark, sf_dir, "events")
    return with_rolling(ev, "user_id", ["ts", "event_id"], "value", 5).select(
        "event_id", "value_roll5_sum", "value_roll5_mean"
    )


@register(
    "w9_event_deltas",
    oracle=f"""
select event_id,
       epoch_us(ts) - epoch_us(lag(ts) over (partition by user_id order by {_ORD}))
         as delta_us
from events
""",
    survey_ref="event-deltas",
    doc="inter-event microseconds per user (integer on both engines).",
)
def w9_event_deltas(spark, sf_dir):
    from ..operators.windows import with_event_deltas

    ev = T(spark, sf_dir, "events")
    return with_event_deltas(ev, "user_id", ["ts", "event_id"], "ts").select(
        "event_id", "delta_us"
    )


@register(
    "w10_quantile_bin",
    oracle="""
select event_id,
       ntile(4) over (partition by user_id order by value, event_id) as qbin
from events
""",
    survey_ref="quantile-bin",
    doc="per-user equi-depth binning (ntile with unique tie-break).",
)
def w10_quantile_bin(spark, sf_dir):
    from ..operators.windows import quantile_bin

    ev = T(spark, sf_dir, "events")
    return quantile_bin(ev, ["user_id"], ["value", "event_id"], 4).select(
        "event_id", "qbin"
    )


@register(
    "w11_minmax_scale",
    oracle=f"""
select event_id, {sqlgen.minmax_window('value', 'user_id')} as value_mm
from events
""",
    survey_ref="minmax-scale",
    doc="per-user min-max scaling to [0,1]; constant groups -> NULL.",
)
def w11_minmax_scale(spark, sf_dir):
    from ..operators.windows import minmax_scale

    ev = T(spark, sf_dir, "events")
    return minmax_scale(ev, "user_id", ["value"]).select("event_id", "value_mm")


@register(
    "w12_rank_functions",
    oracle="""
select event_id, user_id,
       rank()         over w as rnk,
       dense_rank()   over w as drnk,
       percent_rank() over w as prnk,
       cume_dist()    over w as cd,
       lead(event_id) over w as next_id,
       lag(event_id)  over w as prev_id
from events
window w as (partition by user_id order by ts, event_id)
""",
    survey_ref="w-rank-family",
    doc="full rank-function family over the per-user event order — one "
    "window spec, one exchange+sort for all six functions.",
)
def w12_rank_functions(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cd"),
        F.lead("event_id").over(w).alias("next_id"),
        F.lag("event_id").over(w).alias("prev_id"),
    )


_TW_EPOCH = "cast(floor(epoch(ts)) as bigint)"


@register(
    "w13_rolling_time_window",
    oracle=f"""
select event_id, user_id,
       {sqlgen.wrangesum("value", "user_id", _TW_EPOCH, 86400)} as tw_sum,
       {sqlgen.wrangecount("value", "user_id", _TW_EPOCH, 86400)} as tw_n,
       ({sqlgen.wrangesum("value", "user_id", _TW_EPOCH, 86400)}
        / {sqlgen.wrangecount("value", "user_id", _TW_EPOCH, 86400)}) as tw_mean
from events
""",
    survey_ref="w-time-range-frame",
    doc="trailing 24h event-time window per user (numeric RANGE frame "
    "over epoch seconds): spend-in-last-day at every event.",
)
def w13_rolling_time_window(spark, sf_dir):
    from ..operators.windows import with_rolling_time

    return with_rolling_time(
        T(spark, sf_dir, "events"), "user_id", "ts", "value", "24 hours"
    ).select("event_id", "user_id", "tw_sum", "tw_n", "tw_mean")


@register(
    "w14_ewma",
    oracle=f"""
with t as (
  select event_id,
         list_filter(
           list(cast(value as double))
             over (partition by user_id order by {_ORD}
                   rows between 31 preceding and current row),
           x -> x is not null
         ) as _arr
  from events
)
select event_id,
       case when len(_arr) = 0 then null
            else list_reduce(
              _arr,
              (acc, x) -> acc * cast(0.9 as double) + x * cast(0.1 as double)
            ) end as value_ewma
from t
""",
    survey_ref="w-ewma",
    doc="per-user EWMA (alpha=0.1) over the trailing 32-row frame; both "
    "engines left-fold oldest->newest over the frame's NON-NULL values "
    "with the identical double recurrence (NULL when the frame has "
    "none), so values are bitwise-reproducible.",
)
def w14_ewma(spark, sf_dir):
    from ..operators.windows import with_ewma

    return with_ewma(
        T(spark, sf_dir, "events"), "user_id", ["ts", "event_id"], "value",
        alpha=0.1, n=32,
    ).select("event_id", "value_ewma")


@register(
    "w15_gap_fill",
    oracle=f"""
with b as (
  select user_id, date_trunc('day', ts) as bucket,
         count(*) as n, {sqlgen.dsum('value')} as s
  from events
  group by user_id, date_trunc('day', ts)
),
spans as (select user_id, min(bucket) as mn, max(bucket) as mx from b group by user_id),
grid as (
  select user_id, unnest(generate_series(mn, mx, interval 1 day)) as bucket
  from spans
),
j as (
  select g.user_id, g.bucket, coalesce(b.n, 0) as n, b.s
  from grid g left join b on b.user_id = g.user_id and b.bucket = g.bucket
)
select user_id, bucket as bucket_ts,
       cast(n as bigint) as gf_n, s as gf_sum,
       last_value(s ignore nulls)
         over (partition by user_id order by bucket
               rows between unbounded preceding and current row) as gf_ffill
from j
""",
    survey_ref="w-gap-fill",
    doc="time-series regularization: per-user daily buckets densified over "
    "each user's [first, last] span (sequence explode, no cross join), "
    "zero-filled counts, decimal-exact sums, forward-filled values.",
)
def w15_gap_fill(spark, sf_dir):
    from ..operators.windows import ts_gap_fill

    return ts_gap_fill(T(spark, sf_dir, "events"), "user_id", "ts", "value", bucket="day")
