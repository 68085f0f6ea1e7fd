"""Scratch: empirical Spark<->DuckDB parity checks on the driver testdata."""
import duckdb
import pandas as pd

from vtb_datafusion_2023_spark.session import get_spark

SF = "/root/testdata/sf0.01"
spark = get_spark(cpus=8)
con = duckdb.connect()
for t in ["events", "orders", "lineitem"]:
    con.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")

ev = spark.read.parquet(f"{SF}/events.parquet")
print("spark events schema:", ev.schema.simpleString())
print("spark first ts:", ev.orderBy("event_id").first())
print("duck first ts:", con.execute("select * from events order by event_id limit 1").fetchall())

# dayofweek conventions
s = spark.sql(
    "select ts, hour(ts) h, dayofweek(ts) dow_spark, (dayofweek(ts)+5)%7 dow_pandas, "
    "dayofmonth(ts) dom, month(ts) m from parquet.`" + SF + "/events.parquet` order by event_id limit 5"
).toPandas()
print(s)
d = con.execute(
    "select ts, hour(ts) h, dayofweek(ts) dow_duck, (dayofweek(ts)+6)%7 dow_pandas, "
    "dayofmonth(ts) dom, month(ts) m from events order by event_id limit 5"
).df()
print(d)
print("pandas dow:", pd.to_datetime(d.ts).dt.dayofweek.tolist())

# percentile / stddev / skew bitwise parity per group
sp = spark.sql(
    f"""select o_custkey, count(o_totalprice) n,
        percentile(o_totalprice, 0.37) p37,
        percentile(o_totalprice, 0.5) med,
        stddev_samp(o_totalprice) sd, var_samp(o_totalprice) vr,
        skewness(o_totalprice) sk,
        avg(o_totalprice) mn,
        cast(sum(cast(o_totalprice as decimal(38,6))) as double) dsum
        from parquet.`{SF}/orders.parquet` group by o_custkey"""
).toPandas().sort_values("o_custkey").reset_index(drop=True)
du = con.execute(
    """select o_custkey, count(o_totalprice) n,
       quantile_cont(o_totalprice, 0.37) p37,
       quantile_cont(o_totalprice, 0.5) med,
       stddev_samp(o_totalprice) sd, var_samp(o_totalprice) vr,
       skewness(o_totalprice) sk,
       avg(o_totalprice) mn,
       cast(sum(cast(o_totalprice as decimal(38,6))) as double) dsum
       from orders group by o_custkey"""
).df().sort_values("o_custkey").reset_index(drop=True)
import numpy as np

for c in ["n", "p37", "med", "sd", "vr", "sk", "mn", "dsum"]:
    a, b = sp[c].to_numpy(), du[c].to_numpy()
    bitwise = np.array_equal(a, b)
    md = np.nanmax(np.abs(a.astype(float) - b.astype(float))) if len(a) else 0
    print(f"{c}: bitwise={bitwise} maxdiff={md:.3e}")

# pandas skew for one group to see which engine matches
g = du.iloc[0]
pdf = con.execute(f"select o_totalprice from orders where o_custkey={int(g.o_custkey)}").df()
print("pandas skew:", pdf.o_totalprice.skew(), "duck:", g.sk, "spark:", sp.iloc[0].sk)
n = len(pdf)
import math
adj = sp.iloc[0].sk * math.sqrt(n * (n - 1)) / (n - 2)
print("spark adjusted:", adj)
spark.stop()
