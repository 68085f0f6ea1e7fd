"""Suite: scans, projections P1-P10, filters F1-F5, nulls M1-M2, set ops
SO1-SO3 (SURVEY §2.1-2.3, §2.7, §2.8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import sqlgen
from ..functions.temporal import hours_since, pandas_dayofweek, seconds_since_midnight
from ..operators.filtering import blacklist, frequency_filter, positional_trim
from ..operators.projections import bin_by_edges, conform_columns, one_hot
from . import register
from ._util import BLACKLIST_TYPE, SIGNED_AMT, T

# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped pricing summary (S1 scan + P filters + A aggs).
# Scale notes: filter + projection push into the parquet scan; one hash
# aggregate on a 6-group key; decimal-exact sums keep the result bit-stable
# under any partitioning.


# NOTE: q1_pricing_summary is registered in suite.tpch2 (the fsum-based
# variant measured 5x faster at scale — SCALE.md §23); the dsum-based
# duplicate that used to live here was removed so registration order is
# import-order-deterministic.

# ---------------------------------------------------------------------------
# P1/P2: datetime part extraction with pandas conventions.


@register(
    "p1_time_parts",
    oracle="""
select event_id, hour(ts) as hour, (dayofweek(ts)+6)%7 as day_of_week,
       dayofmonth(ts) as day_of_month, month(ts) as month
from events
""",
    survey_ref="P1",
    doc="hour/dayofweek(Mon=0)/day/month from event time (run.py:91-94).",
)
def p1_time_parts(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.hour("ts").cast("bigint").alias("hour"),
        pandas_dayofweek(F.col("ts")).cast("bigint").alias("day_of_week"),
        F.dayofmonth("ts").cast("bigint").alias("day_of_month"),
        F.month("ts").cast("bigint").alias("month"),
    )


@register(
    "p2_seconds_since_midnight",
    oracle="select event_id, hour(ts)*3600 + minute(ts)*60 + second(ts) as time_day from events",
    survey_ref="P2",
    doc="seconds since midnight (run.py:97).",
)
def p2_seconds_since_midnight(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id", seconds_since_midnight(F.col("ts")).cast("bigint").alias("time_day")
    )


@register(
    "p3_hours_since_anchor",
    oracle="""
with anchor as (select cast(floor(epoch(arg_min(ts, event_id))) as bigint) as a0 from events)
select event_id,
       cast(floor((cast(floor(epoch(ts)) as bigint) - a0) / 3600) as bigint) as hours_anchor
from events, anchor
""",
    survey_ref="P3",
    doc="whole hours since the first-row timestamp (run.py:96; anchor = min-ord row, SURVEY §7.4.1).",
)
def p3_hours_since_anchor(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    # anchor resolved driver-side: one tiny min_by aggregate -> literal,
    # so the projection is a narrow map (no join/shuffle at scale).
    anchor = ev.agg(F.expr("unix_timestamp(min_by(ts, event_id))")).first()[0]
    return ev.select(
        "event_id", hours_since(F.col("ts"), int(anchor)).alias("hours_anchor")
    )


# ---------------------------------------------------------------------------
# P4 + P10: conditional debit/credit split and ratio-of-aggregates.


@register(
    "p4_p10_debit_credit_ratio",
    oracle=f"""
with s as (
  select user_id, {SIGNED_AMT} as amt from events
)
select user_id,
       {sqlgen.dsum('case when amt > 0 then amt end', 'debit_sum')},
       {sqlgen.dsum('case when amt < 0 then amt end', 'credit_sum')},
       ({sqlgen.dsum('case when amt > 0 then amt end')} /
        ({sqlgen.dsum('case when amt > 0 then amt end')} + {sqlgen.dsum('case when amt < 0 then amt end')})) as debit_ratio
from s group by user_id
""",
    survey_ref="P4,P10",
    doc="debit/credit NULL-split (run.py:98-99) + ratio of aggregates (run.py:330-331).",
)
def p4_p10_debit_credit_ratio(spark, sf_dir):
    ev = T(spark, sf_dir, "events").withColumn("amt", F.expr(SIGNED_AMT))
    debit = sqlgen.dsum("case when amt > 0 then amt end")
    credit = sqlgen.dsum("case when amt < 0 then amt end")
    return ev.groupBy("user_id").agg(
        F.expr(f"{debit} as debit_sum"),
        F.expr(f"{credit} as credit_sum"),
        F.expr(f"({debit} / ({debit} + {credit})) as debit_ratio"),
    )


# ---------------------------------------------------------------------------
# P5 + P9: one-hot over a frozen vocabulary incl. an absent category.

_ONEHOT_VOCAB = ["click", "error", "purchase", "refund", "signup", "view"]  # 'refund' absent


@register(
    "p5_p9_onehot_conform",
    oracle="select event_id, "
    + ", ".join(
        f"(case when event_type = '{v}' then 1 else 0 end) as is_{v}" for v in _ONEHOT_VOCAB
    )
    + " from events",
    survey_ref="P5,P9",
    doc="one-hot with closed vocab; absent category present as zeros (run.py:103-108).",
)
def p5_p9_onehot_conform(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    oh = one_hot(ev, "event_type", _ONEHOT_VOCAB, prefix="is")
    return conform_columns(oh, ["event_id"] + [f"is_{v}" for v in _ONEHOT_VOCAB])


@register(
    "p6_bucket_floor_div",
    oracle="select event_id, cast(floor(value / 20) as bigint) as bucket from events",
    survey_ref="P6",
    doc="fixed-width integer bucketing `x //= 20` (run.py:248-249).",
)
def p6_bucket_floor_div(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return ev.select("event_id", F.floor(F.col("value") / 20).alias("bucket"))


_EDGES = [0.0, 5.0, 20.0, 50.0, 100.0, 250.0, 1000.0]


@register(
    "p7_bin_by_edges",
    oracle="select event_id, "
    + "(case "
    + " ".join(
        f"when value > {_EDGES[i - 1]} and value <= {_EDGES[i]} then {i - 1}"
        for i in range(1, len(_EDGES))
    )
    + " end) as bin from events",
    survey_ref="P7",
    doc="pd.cut by precomputed edges, labels=False (model.py:172-181).",
)
def p7_bin_by_edges(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return ev.select("event_id", bin_by_edges("value", _EDGES).alias("bin"))


# ---------------------------------------------------------------------------
# Filters.


@register(
    "f1_f2_filters",
    oracle=f"""
select l_linestatus, count(*) as n
from lineitem
where nullif(l_discount, 0.0) is not null
  and (l_returnflag is null or l_returnflag <> 'A')
group by l_linestatus
""",
    survey_ref="F1,F2",
    doc="not-null predicate (model.py:168) + category blacklist (run.py:201).",
)
def f1_f2_filters(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return (
        blacklist(li.filter(F.expr("nullif(l_discount, 0.0) is not null")), "l_returnflag", "A")
        .groupBy("l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "f3_frequency_filter",
    oracle="""
with c as (select user_id, event_type, count(*) over (partition by user_id, event_type) as cnt
           from events)
select event_id from events
where (user_id, event_type) in (select (user_id, event_type) from c where cnt > 10)
""",
    survey_ref="F3",
    doc="keep rows whose (user,category) count > 10 (run.py:41-44).",
)
def f3_frequency_filter(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return frequency_filter(ev, ["user_id", "event_type"], 10).select("event_id")


@register(
    "f4_positional_trim",
    oracle=f"""
with r as (
  select user_id, value,
         row_number() over (partition by user_id order by ts asc, event_id asc) as rn_a,
         row_number() over (partition by user_id order by ts desc, event_id desc) as rn_d
  from events
)
select user_id, count(*) as n_kept, {sqlgen.dsum('value', 'value_sum')}
from r where rn_a > 20 and rn_d > 20
group by user_id
""",
    survey_ref="F4,W5",
    doc="drop first/last 20 rows per user in row order (run.py:196-198).",
)
def f4_positional_trim(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    trimmed = positional_trim(ev, "user_id", ["ts", "event_id"], 20, 20)
    return trimmed.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.expr(sqlgen.dsum("value", "value_sum")),
    )


@register(
    "m1_m2_null_handling",
    oracle=f"""
select l_linestatus,
       count(nullif(l_discount, 0.0)) as n_nonnull,
       count(*) as n_all,
       {sqlgen.dsum('coalesce(nullif(l_discount, 0.0), -1.0)', 'filled_sum')}
from lineitem group by l_linestatus
""",
    survey_ref="M1,M2",
    doc="dropna/fillna conventions (model.py:214; run.py:108 etc.).",
)
def m1_m2_null_handling(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").withColumn(
        "disc0", F.expr("nullif(l_discount, 0.0)")
    )
    filled = li.na.fill({"disc0": -1.0})
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.count("disc0").alias("n_nonnull"),
            F.count(F.lit(1)).alias("n_all"),
        )
        .join(
            filled.groupBy("l_linestatus").agg(F.expr(sqlgen.dsum("disc0", "filled_sum"))),
            "l_linestatus",
        )
    )


# ---------------------------------------------------------------------------
# Set operations.


@register(
    "so1_distinct_users",
    oracle="select distinct user_id from events",
    survey_ref="SO1",
    doc="distinct ids (run.py:36).",
)
def so1_distinct_users(spark, sf_dir):
    return T(spark, sf_dir, "events").select("user_id").distinct()


@register(
    "so2_set_difference",
    oracle=f"""
select user_id from (select user_id, count(*) c from events where event_type = 'click' group by 1) where c > 15
except
select user_id from (select user_id, count(*) c from events where event_type = '{BLACKLIST_TYPE}' group by 1) where c > 15
""",
    survey_ref="SO2,J3",
    doc="np.setdiff1d of id sets (run.py:202) as EXCEPT/anti-join.",
)
def so2_set_difference(spark, sf_dir):
    ev = T(spark, sf_dir, "events")

    def heavy(t):
        return (
            ev.filter(F.col("event_type") == t)
            .groupBy("user_id")
            .count()
            .filter(F.col("count") > 15)
            .select("user_id")
        )

    return heavy("click").exceptAll(heavy(BLACKLIST_TYPE))


@register(
    "so3_bootstrap_sample",
    oracle=None,  # nondeterministic draws vs numpy — distributional contract (SURVEY §7.4.5)
    survey_ref="SO3",
    doc="seeded bootstrap sample with replacement, frac 0.95 (model.py:279-281); rows-only check.",
)
def so3_bootstrap_sample(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    # Pin partition layout + row order before sampling: Poisson draws are
    # seeded per (partition, row position), so the driver's session (with
    # different parallelism => different file splits) would otherwise see
    # a different sampled row set.  The engine operator (joins.
    # bootstrap_runs) keeps the distributed form — the contract there is
    # distributional, not positional (SURVEY §7.4.5); this suite entry
    # pins determinism for the rows-only check.
    pinned = ev.repartition(1).sortWithinPartitions("event_id")
    return pinned.sample(withReplacement=True, fraction=0.95, seed=42).select(
        "event_id", "user_id"
    )


_SO3_M = sqlgen.md5_multiplicity("event_id", draws=3, threshold_hex="50")


@register(
    "so3_md5_sample",
    oracle=f"""
with drawn as (select user_id, value, {_SO3_M} as m from events)
select user_id, cast(sum(m) as bigint) as n_drawn,
       {sqlgen.dsum('value * m', 'value_sum')}
from drawn group by user_id
""",
    survey_ref="SO3",
    doc="deterministic-replay bootstrap twin of so3_bootstrap_sample: "
    "per-row multiplicity = 3 md5-seeded Bernoulli draws (mean ~0.949 "
    "mass, matching frac=0.95 with replacement), aggregated as weights — "
    "zero RNG state, exactly replayable by the oracle, and the scale "
    "form (weighted aggregation, no row duplication).",
)
def so3_md5_sample(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    drawn = ev.select("user_id", "value", F.expr(_SO3_M).alias("m"))
    return drawn.groupBy("user_id").agg(
        F.expr("cast(sum(m) as bigint) as n_drawn"),
        F.expr(sqlgen.dsum("value * m", "value_sum")),
    )


_PROFILE_COLS = {
    "event_id": True, "ts": False, "user_id": True,
    "event_type": False, "value": True, "props": False,
}


def _profile_oracle() -> str:
    parts = []
    for c, numeric in _PROFILE_COLS.items():
        mn = f"cast(min({c}) as double)" if numeric else "cast(null as double)"
        mx = f"cast(max({c}) as double)" if numeric else "cast(null as double)"
        parts.append(
            f"select '{c}' as \"column\", count(*) as n, "
            f"count(*) filter (where {c} is null) as n_null, "
            f"count(distinct {c}) as n_distinct, "
            f"{mn} as min_num, {mx} as max_num from events"
        )
    return "\nunion all\n".join(parts)


@register(
    "tbl_profile",
    oracle=_profile_oracle(),
    survey_ref="profile",
    doc="single-scan table profile: per-column null rate, exact "
    "cardinality, numeric min/max — one agg job, stack-unpivoted.",
)
def tbl_profile(spark, sf_dir):
    from ..operators.profile import profile

    return profile(T(spark, sf_dir, "events"))


@register(
    "p_melt_unpivot",
    oracle="""
select l_orderkey, l_linenumber, variable, val from (
  select l_orderkey, l_linenumber, 'l_quantity' as variable,
         cast(l_quantity as double) as val from lineitem
  union all
  select l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice from lineitem
  union all
  select l_orderkey, l_linenumber, 'l_discount', l_discount from lineitem
  union all
  select l_orderkey, l_linenumber, 'l_tax', l_tax from lineitem
)
""",
    survey_ref="p-melt",
    doc="wide->long unpivot (inverse of A1-A6 pivots): single stack "
    "projection, one scan, map-only.",
)
def p_melt_unpivot(spark, sf_dir):
    from ..operators.projections import melt

    return melt(
        T(spark, sf_dir, "lineitem"),
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        var_name="variable",
        value_name="val",
    )


@register(
    "p_json_extract",
    oracle="""
select event_id, cast(json_extract_string(props, '$.k') as bigint) as k
from events
""",
    survey_ref="p-json",
    doc="schema-bound JSON field extraction from the props sidecar "
    "(from_json with declared schema: one parse, no inference pass).",
)
def p_json_extract(spark, sf_dir):
    from ..operators.projections import json_col

    return json_col(T(spark, sf_dir, "events"), "props", "k bigint").select(
        "event_id", "k"
    )


@register(
    "p_variant_extract",
    oracle="""
with j as (
  select event_id,
         '{"meta": {"type": "' || event_type || '", "k": '
           || json_extract_string(props, '$.k')
           || '}, "arr": [' || cast(user_id % 3 as varchar) || ', 2, 3]}' as doc
  from events
)
select event_id,
       json_extract_string(doc, '$.meta.type') as vtype,
       cast(json_extract(doc, '$.meta.k') as bigint) as vk,
       cast(json_extract(doc, '$.arr[0]') as bigint) as a0,
       cast(json_extract(doc, '$.missing') as bigint) as miss
from j
""",
    survey_ref="p-variant",
    doc="Spark 4 VARIANT semi-structured path: synthesize a nested JSON "
    "doc from typed columns (ints/strings only — double formatting is "
    "engine-specific), parse_json ONCE into the binary VARIANT encoding, "
    "then typed variant_get field/array accesses + a try_variant_get on "
    "a missing path (NULL, not error).  At scale this is the "
    "parse-once/access-many shape — repeated get_json_object calls "
    "re-parse the string per field; VARIANT pays one parse and O(1) "
    "binary field reads.",
)
def p_variant_extract(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"meta": {"type": "'), F.col("event_type"), F.lit('", "k": '),
        F.get_json_object("props", "$.k"),
        F.lit('}, "arr": ['), (F.col("user_id") % 3).cast("string"),
        F.lit(", 2, 3]}"),
    )
    v = F.parse_json(doc)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.meta.type", "string").alias("vtype"),
        F.variant_get(v, "$.meta.k", "bigint").alias("vk"),
        F.variant_get(v, "$.arr[0]", "bigint").alias("a0"),
        F.try_variant_get(v, "$.missing", "bigint").alias("miss"),
    )


@register(
    "tbl_key_skew",
    oracle="""
select 'user_id' as "column", cast(sum(c) as bigint) as n,
       count(*) as n_keys, max(c) as top_n
from (select count(*) as c from events group by user_id)
union all
select 'event_type', cast(sum(c) as bigint), count(*), max(c)
from (select count(*) as c from events group by event_type)
""",
    survey_ref="profile-skew",
    doc="key-skew report (hottest-key share per candidate shuffle key) — "
    "the diagnostic that picks plain hash vs salted/AQE-skew joins.  The "
    "certified projection is integer-only (n, n_keys, top_n): the "
    "top_share ratio is exactly top_n/n, and round-1 showed the driver's "
    "double canonicalization disagreeing with a locally-identical value — "
    "integers are hash-stable on every engine.  The library function "
    "still emits top_share (pytest-covered).",
)
def tbl_key_skew(spark, sf_dir):
    from ..operators.profile import key_skew

    return key_skew(T(spark, sf_dir, "events"), ["user_id", "event_type"]).select(
        "column", "n", "n_keys", "top_n"
    )


@register(
    "p_temporal_battery",
    oracle="""
select event_id,
       cast(date_trunc('month', ts) as timestamp) as month_start,
       cast(date_trunc('week', ts) as timestamp) as week_start,
       cast(date_trunc('quarter', ts) as timestamp) as quarter_start,
       cast(ts + interval 3 month as timestamp) as plus_3m,
       cast(date_diff('day', timestamp '1995-01-01 00:00:00', ts) as bigint) as days_since,
       cast(extract(doy from ts) as bigint) as day_of_year,
       cast(extract(week from ts) as bigint) as iso_week
from events
""",
    survey_ref="P1-battery",
    doc="temporal-function battery: truncation grains, interval add, "
    "day diff, ISO week/doy — cross-engine semantics locked bitwise.",
)
def p_temporal_battery(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("month", "ts").alias("month_start"),
        F.date_trunc("week", "ts").alias("week_start"),
        F.date_trunc("quarter", "ts").alias("quarter_start"),
        F.expr("ts + interval 3 months").alias("plus_3m"),
        F.datediff(F.col("ts"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since"),
        F.dayofyear("ts").cast("bigint").alias("day_of_year"),
        F.weekofyear("ts").cast("bigint").alias("iso_week"),
    )


@register(
    "so4_intersect",
    oracle="""
select user_id from events where ts <  timestamp '2024-01-16 00:00:00'
intersect
select user_id from events where ts >= timestamp '2024-01-16 00:00:00'
""",
    survey_ref="SO-intersect",
    doc="INTERSECT DISTINCT: users active in both halves of the time "
    "range (plans as an aggregate + semi path, not a full join).",
)
def so4_intersect(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    return (
        ev.filter(F.col("ts") < cut)
        .select("user_id")
        .intersect(ev.filter(F.col("ts") >= cut).select("user_id"))
    )


@register(
    "p_array_battery",
    oracle="""
select vec_id,
       len(embedding) as dims,
       embedding[1] as head,
       embedding[-1] as tail,
       list_min(embedding) as mn,
       list_max(embedding) as mx,
       list_position(embedding, list_min(embedding)) as pos_mn
from embeddings
""",
    survey_ref="nested-array-functions",
    doc="array-function battery over the embedding column: length, "
    "positional access (1-based, negative tail), min/max reduction, and "
    "first-occurrence position — all JVM-side builtins inside one narrow "
    "projection (no Python, no shuffle); the nested-type surface the "
    "multimodal/similarity operators build on.",
)
def p_array_battery(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(e).alias("dims"),
        F.element_at(e, 1).alias("head"),
        F.element_at(e, -1).alias("tail"),
        F.array_min(e).alias("mn"),
        F.array_max(e).alias("mx"),
        F.array_position(e, F.array_min(e)).alias("pos_mn"),
    )


@register(
    "tbl_histogram",
    oracle="""
with b as (
  select least(19, greatest(0,
           cast(floor((value - cast(0 as double)) / cast('25.0' as double)) as bigint))) as bin,
         value
  from events where value is not null)
select bin, count(*) as n, min(value) as min_val, max(value) as max_val,
       cast(0 as double) + bin * cast('25.0' as double) as bin_lo,
       cast(0 as double) + (bin + 1) * cast('25.0' as double) as bin_hi
from b group by bin
""",
    survey_ref="profile-histogram",
    doc="fixed-width histogram (20 bins over [0,500), edge-clamped): "
    "pure-codegen bin expression, partial-aggregable, ~n_bins-row shuffle.",
)
def tbl_histogram(spark, sf_dir):
    from ..operators.profile import histogram

    return histogram(T(spark, sf_dir, "events"), "value", 0.0, 500.0, 20)
