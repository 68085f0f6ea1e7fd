"""Suite: TPC-H-shaped plan families beyond the multi-join star set.

``tpch.py`` covers star joins + top-N (q3/q5/q10), EXISTS (q4), HAVING
(q18) and correlated aggregates (q17).  This module adds the remaining
canonical warehouse plan shapes, adapted to the driver's schema (no
partsupp / commitdate / shipmode columns — substitutes are noted per
query).  Together they generalize the reference's single feature-assembly
join (J1/J2, /root/reference/run.py:435-464) into full analytical
coverage.

Scale notes (SCALE.md §22):
- q1/q6 are single-scan aggregations: predicate + column pruning reach the
  parquet reader, partial aggregation is map-side, one exchange on the
  (tiny) group key.  The shape is scan-bound at 100 TB — the ideal plan.
- q7/q8/q9 join the fact table once per fact side and broadcast every
  dimension; the only big shuffle is the final group-by, whose key
  cardinality (nation x year) is tiny, so partial aggs collapse nearly
  all rows map-side.
- q16's count(distinct) expands to a two-phase exact plan (group by
  brand/type/size/supp, then re-group); the NOT IN blacklist becomes a
  broadcast anti-join, never a per-row subquery.
- q19's OR-of-ANDs stays a single broadcast-hash-join pass: part-only
  conjuncts push into the part scan, lineitem-only bounds
  (quantity ranges) push into the fact scan, and the residual OR
  evaluates in codegen — no union-of-three-scans blowup.
- q20/q21 nest semi/anti joins: each EXISTS ships only join keys
  (LeftSemi/LeftAnti), so no intermediate row multiplication at any SF.
- q22's scalar subquery is a 1-row aggregate broadcast as a nested-loop
  join input — computed once, never per row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import sqlgen
from . import register
from ._util import T
from .tpch import REVENUE


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@register(
    "q1_pricing_summary",
    oracle=f"""
select l_returnflag, l_linestatus,
       {sqlgen.fsum("l_quantity", "sum_qty")},
       {sqlgen.fsum("l_extendedprice", "sum_base_price")},
       {sqlgen.fsum(REVENUE, "sum_disc_price")},
       {sqlgen.fsum(f"{REVENUE} * (1 + l_tax)", "sum_charge")},
       {sqlgen.favg("l_quantity", "avg_qty")},
       {sqlgen.favg("l_extendedprice", "avg_price")},
       {sqlgen.favg("l_discount", "avg_disc")},
       count(*) as count_order
from lineitem
where l_shipdate <= timestamp '2001-06-01 00:00:00'
group by l_returnflag, l_linestatus
""",
    survey_ref="A-group-agg,P10",
    doc="TPC-H-q1-shaped: full-scan pricing summary — 8 aggregates over "
    "2 tiny group keys; map-side partial agg collapses the scan.",
)
def q1_pricing_summary(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= _ts("2001-06-01 00:00:00")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr(sqlgen.fsum("l_quantity", "sum_qty")),
        F.expr(sqlgen.fsum("l_extendedprice", "sum_base_price")),
        F.expr(sqlgen.fsum(REVENUE, "sum_disc_price")),
        F.expr(sqlgen.fsum(f"{REVENUE} * (1 + l_tax)", "sum_charge")),
        F.expr(sqlgen.favg("l_quantity", "avg_qty")),
        F.expr(sqlgen.favg("l_extendedprice", "avg_price")),
        F.expr(sqlgen.favg("l_discount", "avg_disc")),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
select {sqlgen.fsum("l_extendedprice * l_discount", "revenue")}
from lineitem
where l_shipdate >= timestamp '1997-01-01 00:00:00'
  and l_shipdate < timestamp '1998-01-01 00:00:00'
  and l_discount >= cast(0.03 as double) and l_discount <= cast(0.07 as double)
  and l_quantity < 24
""",
    survey_ref="F1,A-group-agg",
    doc="TPC-H-q6-shaped: pure filter+global-sum — every predicate pushes "
    "to the parquet scan (double casts on the discount bounds keep the "
    "comparison in double on both engines; a bare 0.03 literal is DECIMAL "
    "and would exclude the nearest-double 0.03 rows).",
)
def q6_forecast_revenue(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        & (F.col("l_discount") >= F.lit(0.03))
        & (F.col("l_discount") <= F.lit(0.07))
        & (F.col("l_quantity") < 24)
    ).agg(F.expr(sqlgen.fsum("l_extendedprice * l_discount", "revenue")))


@register(
    "q7_nation_volume",
    oracle=f"""
select supp_nation, cust_nation, l_year, {sqlgen.dsum("volume", "revenue")}
from (
  select n1.n_name as supp_nation, n2.n_name as cust_nation,
         cast(year(l_shipdate) as int) as l_year,
         {REVENUE} as volume
  from supplier
  join lineitem on s_suppkey = l_suppkey
  join orders on o_orderkey = l_orderkey
  join customer on c_custkey = o_custkey
  join nation n1 on s_nationkey = n1.n_nationkey
  join nation n2 on c_nationkey = n2.n_nationkey
  where (n1.n_name = 'NATION_1' and n2.n_name = 'NATION_2')
     or (n1.n_name = 'NATION_2' and n2.n_name = 'NATION_1')
) shipping
group by supp_nation, cust_nation, l_year
""",
    survey_ref="J1,J2,A-group-agg",
    doc="TPC-H-q7-shaped: the same dimension joined twice under different "
    "roles (supplier nation / customer nation) with a cross-role "
    "disjunction; both nation sides broadcast.",
)
def q7_nation_volume(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            F.expr(REVENUE).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.expr(sqlgen.dsum("volume", "revenue")))
    )


_Q8_NUM = sqlgen.dec_to_double(
    "sum(cast((case when supp_nation = 'NATION_1' then volume end) as decimal(38,6)))"
)
_Q8_DEN = sqlgen.dec_to_double("sum(cast(volume as decimal(38,6)))")


@register(
    "q8_market_share",
    oracle=f"""
select o_year, (coalesce({_Q8_NUM}, cast(0 as double)) / {_Q8_DEN}) as mkt_share
from (
  select cast(year(o_orderdate) as int) as o_year,
         {REVENUE} as volume,
         n1.n_name as supp_nation
  from lineitem
  join orders on o_orderkey = l_orderkey
  join customer on c_custkey = o_custkey
  join supplier on s_suppkey = l_suppkey
  join part on p_partkey = l_partkey
  join nation n1 on s_nationkey = n1.n_nationkey
  join nation n2 on c_nationkey = n2.n_nationkey
  join region on n2.n_regionkey = r_regionkey
  where r_name = 'AMERICA' and p_type = 'ECONOMY'
) all_nations
group by o_year
""",
    survey_ref="J1,J2,P10,A-group-agg",
    doc="TPC-H-q8-shaped: conditional-share ratio — one nation's fraction "
    "of regional revenue per year; numerator and denominator aggregate in "
    "one pass (a CASE inside the sum, not a second scan).",
)
def q8_market_share(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    part = F.broadcast(
        T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    )
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .select(F.col("n_nationkey").alias("n2_key"))
    )
    all_nations = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.expr(REVENUE).alias("volume"),
            "supp_nation",
        )
    )
    return all_nations.groupBy("o_year").agg(
        F.expr(
            f"(coalesce({_Q8_NUM}, cast(0 as double)) / {_Q8_DEN})"
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle=f"""
select n_name as nation, o_year, {sqlgen.dsum("amount", "sum_profit")}
from (
  select n_name, cast(year(o_orderdate) as int) as o_year,
         ({REVENUE} - p_retailprice * l_quantity) as amount
  from lineitem
  join part on p_partkey = l_partkey
  join supplier on s_suppkey = l_suppkey
  join orders on o_orderkey = l_orderkey
  join nation on s_nationkey = n_nationkey
  where p_name like '%widget%'
) profit
group by n_name, o_year
""",
    survey_ref="J1,J2,A-group-agg",
    doc="TPC-H-q9-shaped: per-nation-per-year profit on a part-name "
    "pattern (p_retailprice*l_quantity stands in for the absent "
    "ps_supplycost); LIKE prunes the broadcast part side before the join.",
)
def q9_product_profit(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    part = F.broadcast(
        T(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = F.broadcast(T(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            F.expr(f"({REVENUE} - p_retailprice * l_quantity)").alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.expr(sqlgen.dsum("amount", "sum_profit")))
    )


@register(
    "q12_late_shipments",
    oracle="""
select l_linestatus as shipmode,
       cast(sum(case when o_orderpriority in ('1-URGENT', '2-HIGH')
                     then 1 else 0 end) as bigint) as high_line_count,
       cast(sum(case when o_orderpriority not in ('1-URGENT', '2-HIGH')
                     then 1 else 0 end) as bigint) as low_line_count
from orders
join lineitem on o_orderkey = l_orderkey
where l_shipdate > o_orderdate + interval 90 day
group by l_linestatus
""",
    survey_ref="J1,P4,A-group-agg",
    doc="TPC-H-q12-shaped: conditional counts split by priority class "
    "over late shipments (shipped >90 days after ordering; l_linestatus "
    "stands in for the absent l_shipmode).",
)
def q12_late_shipments(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_linestatus")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    hi = "o_orderpriority in ('1-URGENT', '2-HIGH')"
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.expr("l_shipdate > o_orderdate + interval 90 days"))
        .groupBy(F.col("l_linestatus").alias("shipmode"))
        .agg(
            F.expr(f"cast(sum(case when {hi} then 1 else 0 end) as bigint)").alias(
                "high_line_count"
            ),
            F.expr(f"cast(sum(case when not ({hi}) then 1 else 0 end) as bigint)").alias(
                "low_line_count"
            ),
        )
    )


_Q14_NUM = sqlgen.dec_to_double(
    f"sum(cast((case when p_type = 'PROMO' then {REVENUE} end) as decimal(38,6)))"
)
_Q14_DEN = sqlgen.dec_to_double(f"sum(cast(({REVENUE}) as decimal(38,6)))")


@register(
    "q14_promo_revenue",
    oracle=f"""
select (cast(100 as double) * coalesce({_Q14_NUM}, cast(0 as double)) / {_Q14_DEN})
       as promo_revenue
from lineitem
join part on l_partkey = p_partkey
where l_shipdate >= timestamp '1997-09-01 00:00:00'
  and l_shipdate < timestamp '1997-10-01 00:00:00'
""",
    survey_ref="J1,P10",
    doc="TPC-H-q14-shaped: promo share of one month's revenue — "
    "conditional/total ratio in a single aggregate pass over a broadcast "
    "part join.",
)
def q14_promo_revenue(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00"))
    )
    part = F.broadcast(T(spark, sf_dir, "part").select("p_partkey", "p_type"))
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        F.expr(
            f"(cast(100 as double) * coalesce({_Q14_NUM}, cast(0 as double)) / {_Q14_DEN})"
        ).alias("promo_revenue")
    )


@register(
    "q16_supplier_cnt",
    oracle="""
select p_brand, p_type, p_size, count(distinct l_suppkey) as supplier_cnt
from part
join lineitem on p_partkey = l_partkey
where p_brand <> 'Brand#4'
  and p_size in (1, 5, 10, 15, 20, 25)
  and l_suppkey not in (select s_suppkey from supplier where s_acctbal < 0)
group by p_brand, p_type, p_size
""",
    survey_ref="J3,SO1,A-group-agg",
    doc="TPC-H-q16-shaped: exact count(distinct) per brand/type/size with "
    "a NOT IN supplier blacklist planned as a broadcast anti-join "
    "(s_acctbal<0 stands in for the comment-pattern complaint filter).",
)
def q16_supplier_cnt(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = F.broadcast(
        T(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
    part = F.broadcast(
        T(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#4")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
select {sqlgen.dsum(REVENUE, "revenue")}
from lineitem
join part on p_partkey = l_partkey
where (p_brand = 'Brand#4' and p_size between 1 and 15
       and l_quantity >= 1 and l_quantity <= 11)
   or (p_brand = 'Brand#2' and p_size between 1 and 25
       and l_quantity >= 10 and l_quantity <= 20)
   or (p_brand = 'Brand#19' and p_size between 1 and 35
       and l_quantity >= 20 and l_quantity <= 30)
""",
    survey_ref="J1,F2",
    doc="TPC-H-q19-shaped: OR-of-ANDs mixed-table predicate — stays one "
    "broadcast join pass; per-table bounds (brand/size union, quantity "
    "envelope) push into each scan, the residual OR runs in codegen.",
)
def q19_disjunctive_revenue(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    part = F.broadcast(T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size"))
    cond = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 20)
    ) | (
        (F.col("p_brand") == "Brand#19")
        & F.col("p_size").between(1, 35)
        & (F.col("l_quantity") >= 20)
        & (F.col("l_quantity") <= 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.expr(sqlgen.dsum(REVENUE, "revenue")))
    )


@register(
    "q20_promo_suppliers",
    oracle="""
select s_name, s_acctbal
from supplier
where s_suppkey in (
  select l_suppkey
  from lineitem
  where l_partkey in (select p_partkey from part where p_type = 'PROMO')
    and l_shipdate >= timestamp '1997-01-01 00:00:00'
    and l_shipdate < timestamp '1998-01-01 00:00:00'
  group by l_suppkey, l_partkey
  having sum(cast(l_quantity as decimal(38,6))) > 60
)
""",
    survey_ref="J3-dual,A-having",
    doc="TPC-H-q20-shaped: nested IN subqueries — part filter as a "
    "broadcast semi-join into lineitem, grouped HAVING threshold, then a "
    "semi-join into supplier; only keys ship at every level.",
)
def q20_promo_suppliers(spark, sf_dir):
    from ..operators.joins import semi_join

    promo = F.broadcast(
        T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    li = semi_join(li, promo, li.l_partkey == promo.p_partkey)
    heavy = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.expr("sum(cast(l_quantity as decimal(38,6)))").alias("_q"))
        .filter(F.col("_q") > 60)
        .select("l_suppkey")
    )
    supp = T(spark, sf_dir, "supplier")
    return semi_join(supp, heavy, F.expr("s_suppkey = l_suppkey")).select(
        "s_name", "s_acctbal"
    )


@register(
    "q21_waiting_supplier",
    oracle="""
with lines as (
  select l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + interval 60 day) as late
  from lineitem join orders on l_orderkey = o_orderkey
), solo as (
  select l_orderkey,
         count(distinct l_suppkey) as n_supp,
         count(distinct case when late then l_suppkey end) as n_late,
         max(case when late then l_suppkey end) as bad_supp
  from lines group by l_orderkey
)
select s_name, count(*) as numwait
from solo
join supplier on bad_supp = s_suppkey
where n_supp > 1 and n_late = 1
group by s_name
order by numwait desc, s_name
limit 10
""",
    survey_ref="J3-dual,A-group-agg",
    doc="TPC-H-q21-shaped: sole-late-supplier in multi-supplier orders. "
    "The EXISTS / NOT EXISTS pair collapses into ONE per-order aggregate: "
    "because qualifying orders have exactly one late supplier (n_late=1), "
    "max(case when late then suppkey) IS that supplier — no self-join "
    "back to the late lines, one fact scan, one shuffle on the order key.",
)
def q21_waiting_supplier(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        F.expr("l_shipdate > o_orderdate + interval 60 days").alias("late"),
    )
    solo = (
        lines.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.expr("case when late then l_suppkey end")).alias("n_late"),
            F.expr("max(case when late then l_suppkey end)").alias("bad_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    supp = F.broadcast(T(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        solo.join(supp, solo.bad_supp == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


_Q22_AVG = sqlgen.davg("case when c_acctbal > 0 then c_acctbal end")


@register(
    "q22_idle_customers",
    oracle=f"""
select c_nationkey as cntrycode, count(*) as numcust,
       {sqlgen.dsum("c_acctbal", "totacctbal")}
from customer
cross join (select {_Q22_AVG} as avg_bal from customer) g
where c_acctbal > avg_bal
  and c_custkey not in (
    select o_custkey from orders
    where o_orderdate >= timestamp '2000-01-01 00:00:00'
  )
group by c_nationkey
""",
    survey_ref="J3,A-group-agg",
    doc="TPC-H-q22-shaped: scalar-subquery threshold (global positive-"
    "balance average, computed once and broadcast as a 1-row join input) "
    "+ NOT IN anti-join against recent orders (every synthetic customer "
    "has SOME order, so 'idle' = no order since 2000), grouped by nation.",
)
def q22_idle_customers(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    avg_bal = F.broadcast(cust.agg(F.expr(f"{_Q22_AVG} as avg_bal")))
    ordered = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2000-01-01 00:00:00"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(avg_bal)
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(ordered, cust.c_custkey == ordered.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.expr(sqlgen.dsum("c_acctbal", "totacctbal")),
        )
    )


@register(
    "q13_order_distribution",
    oracle="""
select c_count, count(*) as custdist
from (
  select c_custkey, count(o_orderkey) as c_count
  from customer
  left outer join (
    select o_orderkey, o_custkey from orders
    where o_orderpriority <> '1-URGENT'
  ) o on c_custkey = o_custkey
  group by c_custkey
) c_orders
group by c_count
""",
    survey_ref="J2-outer,A-two-level-agg",
    doc="TPC-H-q13-shaped: distribution of order counts per customer "
    "(priority filter stands in for the absent o_comment pattern).  "
    "Scale plan: pre-aggregate orders to one row per custkey BEFORE the "
    "outer join, so the join input shrinks 10x and the second group-by "
    "key (c_count) is tiny.",
)
def q13_order_distribution(spark, sf_dir):
    cust = T(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left_outer")
        .select(F.coalesce(F.col("n_orders"), F.lit(0).cast("long")).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


_Q15_REV = f"""
select l_suppkey as supplier_no, {sqlgen.fsum(REVENUE, "total_revenue")}
from lineitem
where l_shipdate >= timestamp '2000-01-01 00:00:00'
  and l_shipdate < timestamp '2000-04-01 00:00:00'
group by l_suppkey
"""


@register(
    "q15_top_supplier",
    oracle=f"""
with revenue as ({_Q15_REV})
select s_suppkey, s_name, total_revenue
from supplier
join revenue on s_suppkey = supplier_no
where total_revenue = (select max(total_revenue) from revenue)
""",
    survey_ref="A14,J1,scalar-subquery",
    doc="TPC-H-q15-shaped: supplier(s) with the maximum quarterly revenue. "
    "Scale plan: the revenue aggregate is computed once; its 1-row global "
    "max broadcasts back onto it (q22's scalar-subquery pattern), and the "
    "supplier dimension joins broadcast — no repeated fact scan at any SF.",
)
def q15_top_supplier(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("2000-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("2000-04-01 00:00:00"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.expr(sqlgen.fsum(REVENUE, "total_revenue"))
    )
    top = F.broadcast(revenue.agg(F.max("total_revenue").alias("max_rev")))
    supp = F.broadcast(T(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        revenue.crossJoin(top)
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q11_VALUE = "l_extendedprice * l_quantity"


@register(
    "q11_important_parts",
    oracle=f"""
with stock as (
  select l_partkey, {sqlgen.fsum(_Q11_VALUE, "value")}
  from lineitem
  join supplier on s_suppkey = l_suppkey
  join nation on n_nationkey = s_nationkey
  where n_name = 'NATION_7'
  group by l_partkey
)
select l_partkey as ps_partkey, value
from stock
where value > (select {sqlgen.dsum("value")} * 0.0001 from stock)
""",
    survey_ref="A-group-agg,scalar-subquery,J1",
    doc="TPC-H-q11-shaped: parts whose stocked value (extendedprice*qty "
    "stands in for absent ps_supplycost*ps_availqty) exceeds a fraction "
    "of the nation-wide total.  Scale plan: one fact aggregation feeds "
    "both the per-part values and the 1-row global threshold (decimal-"
    "exact re-sum of the group values, so the threshold is partition-"
    "order independent); dims broadcast.",
)
def q11_important_parts(spark, sf_dir):
    nation = T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    supp = F.broadcast(
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    stock = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.expr(sqlgen.fsum(_Q11_VALUE, "value")))
    )
    threshold = F.broadcast(
        stock.agg(F.expr(f"{sqlgen.dsum('value')} * 0.0001 as threshold"))
    )
    return (
        stock.crossJoin(threshold)
        .filter(F.col("value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("ps_partkey"), "value")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
with costs as (
  select l_partkey, l_suppkey, min(l_extendedprice) as cost
  from lineitem
  join supplier on s_suppkey = l_suppkey
  join nation on n_nationkey = s_nationkey
  join region on r_regionkey = n_regionkey
  where r_name = 'EUROPE'
  group by l_partkey, l_suppkey
),
best as (
  select l_partkey, l_suppkey, cost,
         min(cost) over (partition by l_partkey) as min_cost
  from costs
)
select s_acctbal, s_name, n_name, p_partkey, p_type, cost
from best
join supplier on s_suppkey = l_suppkey
join nation on n_nationkey = s_nationkey
join part on p_partkey = l_partkey
where cost = min_cost and p_size = 15
""",
    survey_ref="J1,J2,A-argmin,scalar-correlated",
    doc="TPC-H-q2-shaped: for each part, the EUROPE supplier(s) offering "
    "the minimum observed price (lineitem stands in for the absent "
    "partsupp).  Scale plan: the correlated min-cost subquery becomes a "
    "window-min over the per-(part,supplier) aggregate — no self-join of "
    "the fact.  Map-side partial agg collapses the fact before its "
    "shuffle; the window's second exchange moves only the collapsed "
    "(part,supplier) rows; all dimensions broadcast.",
)
def q2_min_cost_supplier(spark, sf_dir):
    from pyspark.sql import Window

    region = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = T(spark, sf_dir, "nation")
    eur_nations = F.broadcast(
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    supp = F.broadcast(
        T(spark, sf_dir, "supplier").join(
            eur_nations, F.col("s_nationkey") == F.col("n_nationkey")
        )
    )
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    costs = (
        li.join(supp.select("s_suppkey"), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = costs.withColumn("min_cost", F.min("cost").over(w)).filter(
        F.col("cost") == F.col("min_cost")
    )
    part = F.broadcast(
        T(spark, sf_dir, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey", "p_type")
    )
    return (
        best.join(supp, best.l_suppkey == supp.s_suppkey)
        .join(part, best.l_partkey == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "cost")
    )
