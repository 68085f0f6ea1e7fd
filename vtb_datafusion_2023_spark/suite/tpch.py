"""Suite: multi-join analytical queries (TPC-H q3/q5/q10-shaped) over the
driver's star schema.

The reference's only multi-table op is the feature-assembly join (J1/J2,
/root/reference/run.py:435-464); these queries generalize it into the full
analytical-join surface a warehouse engine needs: selective dimension
filters, a fact-fact equi-join, multi-way star joins, grouped revenue
aggregation, and deterministic top-N.

Scale notes (SCALE.md §20):
- Dimension tables (region, nation) are always hint-broadcast; the
  customer/supplier sides are left to AQE, which broadcasts them at small
  SF and falls back to shuffle join at warehouse scale — no code change.
- The orders⋈lineitem fact join shuffles on the join key ONCE; the grouped
  aggregation that follows reuses that partitioning where the group key is
  the join key (q3) so no second exchange appears.
- Top-N plans as TakeOrderedAndProject: per-partition heaps + a single
  driver merge of k rows, never a global sort.
- Revenue ties are broken by unique keys so LIMIT is deterministic and
  the decimal-exact revenue (sqlgen.dsum) is bitwise-identical in both
  engines — top-N selection cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import sqlgen
from . import register
from ._util import T

REVENUE = "l_extendedprice * (1 - l_discount)"


@register(
    "q3_shipping_priority",
    oracle=f"""
select l_orderkey, {sqlgen.dsum(REVENUE, "revenue")}, o_orderdate, o_orderpriority
from customer
join orders on c_custkey = o_custkey
join lineitem on l_orderkey = o_orderkey
where c_mktsegment = 'BUILDING'
  and o_orderdate < timestamp '1998-06-01 00:00:00'
  and l_shipdate > timestamp '1998-06-01 00:00:00'
group by l_orderkey, o_orderdate, o_orderpriority
order by revenue desc, o_orderdate, l_orderkey
limit 10
""",
    survey_ref="J1,J2,A-group-agg",
    doc="TPC-H-q3-shaped: selective dim filter -> fact-fact join -> "
    "grouped revenue -> deterministic top-10.",
)
def q3_shipping_priority(spark, sf_dir):
    cust = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(sqlgen.dsum(REVENUE, "revenue")))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
select n_name, {sqlgen.dsum(REVENUE, "revenue")}
from customer
join orders on c_custkey = o_custkey
join lineitem on l_orderkey = o_orderkey
join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
join nation on s_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
where r_name = 'ASIA'
  and o_orderdate >= timestamp '1996-01-01 00:00:00'
  and o_orderdate < timestamp '1999-01-01 00:00:00'
group by n_name
""",
    survey_ref="J1,J2,A-group-agg",
    doc="TPC-H-q5-shaped: 6-way star join (region->nation pruned via "
    "broadcast) with same-nation customer/supplier constraint.",
)
def q5_local_supplier_volume(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem")
    supp = T(spark, sf_dir, "supplier")
    nation = F.broadcast(T(spark, sf_dir, "nation"))
    region = F.broadcast(
        T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.expr(sqlgen.dsum(REVENUE, "revenue")))
    )


@register(
    "q10_returned_items",
    oracle=f"""
select c_custkey, c_name, {sqlgen.dsum(REVENUE, "revenue")}, c_acctbal, n_name
from customer
join orders on c_custkey = o_custkey
join lineitem on l_orderkey = o_orderkey
join nation on c_nationkey = n_nationkey
where l_returnflag = 'R'
  and o_orderdate >= timestamp '1997-01-01 00:00:00'
  and o_orderdate < timestamp '1997-04-01 00:00:00'
group by c_custkey, c_name, c_acctbal, n_name
order by revenue desc, c_custkey
limit 20
""",
    survey_ref="J1,J2,A-group-agg",
    doc="TPC-H-q10-shaped: returned-item revenue per customer over one "
    "quarter, top-20 by revenue.",
)
def q10_returned_items(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(T(spark, sf_dir, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.expr(sqlgen.dsum(REVENUE, "revenue")))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q4_order_priority",
    oracle="""
select o_orderpriority, count(*) as order_count
from orders
where o_orderdate >= timestamp '1997-01-01 00:00:00'
  and o_orderdate < timestamp '1997-04-01 00:00:00'
  and exists (
    select 1 from lineitem
    where l_orderkey = o_orderkey
      and l_shipdate > o_orderdate + interval 60 day
  )
group by o_orderpriority
""",
    survey_ref="J3-dual,A-group-agg",
    doc="TPC-H-q4-shaped: EXISTS as a left-semi join (ships only probe "
    "keys, never multiplies rows) -> priority counts.",
)
def q4_order_priority(spark, sf_dir):
    from ..operators.joins import semi_join

    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = semi_join(
        orders,
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + interval 60 days")),
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q18_large_orders",
    oracle=f"""
select c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {sqlgen.dsum("l_quantity", "sum_qty")}
from customer
join orders on c_custkey = o_custkey
join lineitem on o_orderkey = l_orderkey
where o_orderkey in (
  select l_orderkey from lineitem
  group by l_orderkey
  having sum(cast(l_quantity as decimal(38,6))) > 300
)
group by c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
    survey_ref="J1,J2,A-having",
    doc="TPC-H-q18-shaped: HAVING over a grouped subquery as a semi-join "
    "on aggregated keys (the filter aggregates once, ships only keys).",
)
def q18_large_orders(spark, sf_dir):
    from ..operators.joins import semi_join

    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.expr("sum(cast(l_quantity as decimal(38,6)))").alias("_sq"))
        .filter(F.col("_sq") > 300)
        .select("l_orderkey")
    )
    orders = semi_join(
        T(spark, sf_dir, "orders"), big, F.expr("o_orderkey = l_orderkey")
    )
    cust = T(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.expr(sqlgen.dsum("l_quantity", "sum_qty")))
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
select {sqlgen.dsum("l_extendedprice", "total_price")},
       ({sqlgen.dsum("l_extendedprice")} / cast(7 as double)) as avg_yearly
from lineitem
join (
  select l_partkey as pk, (cast(0.2 as double) * {sqlgen.davg("l_quantity")}) as thresh
  from lineitem group by l_partkey
) on l_partkey = pk
where l_quantity < thresh
""",
    survey_ref="J-corr-agg",
    doc="TPC-H-q17-shaped: correlated per-key aggregate threshold as an "
    "aggregate-then-join (the per-part avg computes once, joins back on "
    "the same key partitioning — no per-row subquery).",
)
def q17_small_quantity_revenue(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    thresh = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.expr(f"cast(0.2 as double) * {sqlgen.davg('l_quantity')}").alias("thresh")
    )
    return (
        li.join(thresh, li.l_partkey == thresh.pk)
        .filter(F.col("l_quantity") < F.col("thresh"))
        .agg(
            F.expr(sqlgen.dsum("l_extendedprice", "total_price")),
            F.expr(f"({sqlgen.dsum('l_extendedprice')} / cast(7 as double))").alias(
                "avg_yearly"
            ),
        )
    )
