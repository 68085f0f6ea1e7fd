"""Suite: joins / multi-table ops J1-J5, A14 (SURVEY §2.4)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .. import sqlgen
from ..operators.joins import anti_join_missing, assemble_features, union_fill_max
from ..operators.temporal_joins import asof_join, range_join
from . import register
from ._util import T


@register(
    "j1_join_enrich",
    oracle=f"""
select n.n_name, count(*) as n_orders, {sqlgen.dsum('o.o_totalprice', 'total')}
from orders o
join customer c on o.o_custkey = c.c_custkey
join nation n on c.c_nationkey = n.n_nationkey
group by n.n_name
""",
    survey_ref="J1",
    doc="multiway inner equi-join with broadcast dims (model.py:151).",
)
def j1_join_enrich(spark, sf_dir):
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer")
    na = T(spark, sf_dir, "nation")
    return (
        od.join(broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(sqlgen.dsum("o_totalprice", "total")),
        )
    )


@register(
    "j3_anti_join",
    oracle="""
select c_custkey from customer
where c_custkey not in (select o_custkey from orders where o_totalprice > 300000)
""",
    survey_ref="J3,SO2",
    doc="customers without large orders — np.setdiff1d as left_anti (run.py:200-202).",
)
def j3_anti_join(spark, sf_dir):
    cu = T(spark, sf_dir, "customer")
    od = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return anti_join_missing(cu, od.withColumnRenamed("o_custkey", "c_custkey"), "c_custkey")


@register(
    "j4_union_fill_max",
    oracle=f"""
with preds as (
  select o_custkey as c_custkey, {sqlgen.davg('o_totalprice')} as target
  from orders group by o_custkey
),
dropped as (
  select c_custkey from customer
  where c_custkey not in (select c_custkey from preds)
),
mx as (select max(target) as m from preds)
select c_custkey, target from preds
union all
select c_custkey, m as target from dropped, mx
""",
    survey_ref="J4,A14",
    doc="re-append dropped users at the global-max score (run.py:480-482).",
)
def j4_union_fill_max(spark, sf_dir):
    cu = T(spark, sf_dir, "customer")
    od = T(spark, sf_dir, "orders")
    preds = od.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.expr(f"{sqlgen.davg('o_totalprice')} as target")
    )
    dropped = anti_join_missing(cu, preds, "c_custkey")
    return union_fill_max(preds, dropped, key="c_custkey", score_col="target")


@register(
    "tj_asof_join",
    oracle="""
select c.event_id,
       p.event_id as asof_event_id,
       p.value as asof_value
from (select * from events where event_type = 'click') c
asof left join (select * from events where event_type = 'purchase') p
  on c.user_id = p.user_id and p.ts <= c.ts
""",
    survey_ref="temporal-asof-join",
    doc="backward as-of join (latest prior purchase per click) via the "
    "union+window trick — one shuffle, no non-equi scan.",
)
def tj_asof_join(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_join(
        clicks,
        purchases,
        ["user_id"],
        "ts",
        "ts",
        ["event_id", "value"],
        tie_break="event_id",
    )
    return out.select(
        "event_id",
        F.col("asof_event_id").cast("bigint").alias("asof_event_id"),
        F.col("asof_value").cast("double").alias("asof_value"),
    )


@register(
    "tj_range_join",
    oracle="""
select s.event_id, count(*) as n_next_hour
from (select user_id, event_id, ts from events where event_type = 'signup') s
join events e on s.user_id = e.user_id
where e.ts > s.ts and e.ts <= s.ts + interval 1 hour
group by s.event_id
""",
    survey_ref="temporal-range-join",
    doc="equi-key + time-range join (events within 1h after each signup); "
    "hash join with range post-filter, no cartesian.",
)
def tj_range_join(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("s_event_id"), F.col("ts").alias("s_ts")
    )
    cond = (F.col("ts") > F.col("s_ts")) & (
        F.col("ts") <= F.expr("s_ts + interval 1 hour")
    )
    joined = range_join(signups, ev.select("user_id", "event_id", "ts"), ["user_id"], cond)
    return joined.groupBy(F.col("s_event_id").alias("event_id")).agg(
        F.count(F.lit(1)).alias("n_next_hour")
    )


@register(
    "j2_j5_feature_assembly",
    oracle=f"""
with b1 as (select user_id, count(*) as n_events from events group by user_id),
b2 as (select user_id, {sqlgen.dsum('value', 'value_sum')} from events group by user_id),
b3 as (select user_id, count(*) as n_heavy_click from events
       where event_type = 'click' group by user_id having count(*) > 15),
b4 as (select user_id, count(distinct event_type) as n_types from events group by user_id)
select b1.user_id,
       coalesce(b1.n_events, 0) as n_events,
       coalesce(b2.value_sum, 0.0) as value_sum,
       coalesce(b3.n_heavy_click, 0) as n_heavy_click,
       coalesce(b4.n_types, 0) as n_types
from b1
full join b2 using (user_id)
full join b3 using (user_id)
full join b4 using (user_id)
""",
    survey_ref="J2,J5,P9",
    doc="multi-way aligned feature assembly on user_id with fill-0 conform (run.py:435-461).",
)
def j2_j5_feature_assembly(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    b1 = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    b2 = ev.groupBy("user_id").agg(F.expr(sqlgen.dsum("value", "value_sum")))
    b3 = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_heavy_click"))
        .filter(F.col("n_heavy_click") > 15)
    )
    b4 = ev.groupBy("user_id").agg(F.countDistinct("event_type").alias("n_types"))
    return assemble_features([b1, b2, b3, b4], key="user_id", how="outer", fill=0)


@register(
    "sj_salted_join",
    oracle="""
select o.o_orderkey, o.o_custkey, c.c_name,
       (o.o_totalprice * c.c_acctbal) as weighted
from orders o join customer c on o.o_custkey = c.c_custkey
""",
    survey_ref="skew-salted-join",
    doc="skew-mitigated inner join: deterministic row-hash salt on the "
    "fact side, dimension replicated across salt values; identical "
    "results to the plain join (the oracle) at any skew.",
)
def sj_salted_join(spark, sf_dir):
    from ..operators.joins import salted_join

    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    joined = salted_join(od, cu.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey", salt=8)
    return joined.select(
        "o_orderkey",
        "o_custkey",
        "c_name",
        (F.col("o_totalprice") * F.col("c_acctbal")).alias("weighted"),
    )


@register(
    "j6_bloom_prune_join",
    oracle=f"""
select p.p_brand, count(*) as n_items, {sqlgen.dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
from lineitem l join part p on l.l_partkey = p.p_partkey
where p.p_size <= 4 and p.p_name like 'small%'
group by p.p_brand
""",
    survey_ref="bloom-prune-join",
    doc="equi-join with an explicit bloom-filter pre-prune of the fact "
    "side (operators/joins.py::bloom_semi_join): the selective dim "
    "predicate becomes a broadcast bitmap probe on lineitem BEFORE any "
    "shuffle, so at 100 TB the join shuffle moves only possibly-matching "
    "rows.  Bloom filters have no false negatives, so the oracle is the "
    "plain SQL join.",
)
def j6_bloom_prune_join(spark, sf_dir):
    from ..operators.joins import bloom_semi_join

    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    pa = (
        T(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 4) & F.col("p_name").startswith("small"))
        .select("p_partkey", "p_brand")
    )
    joined = bloom_semi_join(li, pa, "l_partkey", "p_partkey", fpp=0.01)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.expr(sqlgen.dsum("l_extendedprice * (1 - l_discount)", "revenue")),
    )
