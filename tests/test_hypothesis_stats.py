"""Property-based tests (hypothesis) for the statistical shims — pandas
is the reference implementation (SURVEY §7.4.2).  These run DuckDB (not
Spark) against pandas: the suite already proves Spark == DuckDB bitwise
on the same SQL fragments, so DuckDB is a fast stand-in for the engine.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from vtb_datafusion_2023_spark import sqlgen

floats = st.floats(
    min_value=-9e5, max_value=9e5, allow_nan=False, allow_infinity=False, width=64
)


@settings(max_examples=40, deadline=None)
@given(st.lists(floats, min_size=3, max_size=200))
def test_moment_stats_match_pandas(xs):
    pdf = pd.DataFrame({"x": xs})
    con = duckdb.connect()
    con.register("t", pdf)
    frags = sqlgen.moment_stats("x", "s", percentile_fn="quantile_cont")
    row = con.execute("select " + ", ".join(frags) + " from t").df().iloc[0]
    s = pdf["x"]
    # decimal accumulation quantizes inputs at 1e-2 — tolerances reflect that
    assert np.isclose(row.s_mean, s.mean(), rtol=1e-6, atol=1e-2)
    assert np.isclose(row.s_median, s.median(), rtol=1e-9, atol=1e-9)
    assert np.isclose(row.s_min, s.min()) and np.isclose(row.s_max, s.max())
    if s.std() > 1e-3 * max(1.0, abs(s.mean())):  # away from cancellation regime
        assert np.isclose(row.s_std, s.std(), rtol=1e-4, atol=1e-2)
        assert np.isclose(row.s_var, s.var(), rtol=1e-4, atol=1.0)
        assert np.isclose(row.s_sem, s.sem(), rtol=1e-4, atol=1e-2)
        if abs(s.skew()) > 1e-3 and s.std() > 1.0:
            assert np.isclose(row.s_skew, s.skew(), rtol=1e-2, atol=5e-2)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(floats, min_size=1, max_size=150),
    st.integers(min_value=1, max_value=20),
)
def test_dynamic_percentile_matches_numpy(xs, n_amt):
    """The rank-interpolation used by group_percentiles (A7) reproduces
    numpy's linear-interpolation percentile at the reference's dynamic
    fraction p = clamp(100*n_amt/len, 0, 100) (run.py:54-58)."""
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"user_id": 1, "event_type": "a", "value": xs}))
    from vtb_datafusion_2023_spark.operators.gstats import group_percentiles_sql

    sql = group_percentiles_sql("t", ["user_id", "event_type"], "value", n_amt=n_amt)
    row = con.execute(sql).df().iloc[0]
    p = min(100.0, 100.0 * n_amt / len(xs))
    assert np.isclose(row.p_lo, np.percentile(xs, p), rtol=1e-12, atol=1e-12)
    assert np.isclose(row.p_hi, np.percentile(xs, 100 - p), rtol=1e-12, atol=1e-12)
    assert np.isclose(row.p_median, np.median(xs), rtol=1e-12, atol=1e-12)


@settings(max_examples=60, deadline=None)
@given(st.decimals(min_value=-(10**18), max_value=10**18, places=6, allow_nan=False))
def test_dec_to_double_split_is_engine_stable(d):
    """The integral/fractional split conversion produces the same double
    in DuckDB as plain Python float-of-parts arithmetic — including past
    2^53 where naive decimal->double casts diverge.  Bit-exactness is
    guaranteed below 2^64 integral magnitude (via the abs/sign split that
    dodges DuckDB's negative-hugeint double rounding); above that DuckDB's
    int128->double conversion is double-rounded and agreement is 1 ulp
    (documented in sqlgen.dec_to_double)."""
    con = duckdb.connect()
    got = con.execute(
        "select " + sqlgen.dec_to_double(f"cast('{d}' as decimal(38,6))")
    ).fetchone()[0]
    ipart = int(d)
    frac = float(d - ipart)
    assert got == float(ipart) + frac


@settings(max_examples=30, deadline=None)
@given(st.decimals(min_value=-(10**25), max_value=10**25, places=6, allow_nan=False))
def test_dec_to_double_split_huge_within_one_ulp(d):
    con = duckdb.connect()
    got = con.execute(
        "select " + sqlgen.dec_to_double(f"cast('{d}' as decimal(38,6))")
    ).fetchone()[0]
    want = float(int(d)) + float(d - int(d))
    assert got == want or abs(got - want) <= abs(np.spacing(want))


def _py_fsum(xs):
    """IEEE reference for sqlgen.fsum: same hi/lo fixed-point split in
    Python float ops (Python and the engines share correctly-rounded
    float64 arithmetic, and Python's int sums are exact)."""
    import math

    hi = [math.floor(x + 0.5) for x in xs]
    lo = [math.floor((x - float(h)) * 1000000.0 + 0.5) for x, h in zip(xs, hi)]
    return float(sum(hi)) + float(sum(lo)) / 1000000.0


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=40,
    )
)
def test_fsum_fixed_point_is_engine_stable(xs):
    """sqlgen.fsum (fast fixed-point long sum) is bitwise identical in
    DuckDB and the Python IEEE reference — ties at .5, negatives, and
    1e9 magnitudes included.  NOTE: literals go in as cast('<repr>' as
    double); a bare numeric literal is DECIMAL in DuckDB and double-
    rounds, which is a harness artifact, not an engine divergence."""
    con = duckdb.connect()
    values = ",".join(f"(cast('{x!r}' as double))" for x in xs)
    con.execute(f"create table t as select * from (values {values}) v(x)")
    got = con.execute("select " + sqlgen.fsum("x") + " from t").fetchone()[0]
    assert got == _py_fsum(xs)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**7),
                  st.integers(min_value=1, max_value=10**6)),
        min_size=1, max_size=120, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=40),
)
def test_priority_sample_sql_matches_numpy(rows, k):
    """The dp_priority_sample oracle shape (md5 coin -> w*2^32/(h+1)
    priority -> top-k -> tau -> w_hat) run on DuckDB must equal a
    literal numpy re-derivation for arbitrary (id, weight) inputs and k
    — pins the Duffield-Lund-Thorup algebra and the exact IEEE priority
    arithmetic the Spark path shares."""
    import hashlib

    pdf = pd.DataFrame(rows, columns=["doc_id", "w"])
    con = duckdb.connect()
    con.register("t", pdf)
    got = con.execute(f"""
with h as (
  select doc_id, w,
         cast(('0x' || substring(md5(cast(doc_id as varchar) || ':ps'), 1, 8)) as bigint) as hh
  from t
),
q as (select doc_id, w,
             cast(w as double) * 4294967296.0 / cast(hh + 1 as double) as q
      from h),
top as (select * from q order by q desc, doc_id asc limit {k + 1}),
m as (select count(*) as c, min(q) as mq from top),
r as (select doc_id, w, q,
             row_number() over (order by q desc, doc_id asc) as rn
      from top)
select r.doc_id, r.w,
       greatest(cast(r.w as double),
                case when m.c = {k + 1} then m.mq else 0.0 end) as w_hat
from r, m where r.rn <= {k}
""").df()

    def coin(i):
        return int(hashlib.md5(f"{i}:ps".encode()).hexdigest()[:8], 16)

    q = {
        i: np.float64(w) * np.float64(4294967296.0) / np.float64(coin(i) + 1)
        for i, w in rows
    }
    ranked = sorted(rows, key=lambda t: (-q[t[0]], t[0]))
    tau = q[ranked[k][0]] if len(ranked) > k else np.float64(0.0)
    expect = {i: (w, float(max(np.float64(w), tau))) for i, w in ranked[:k]}
    assert {r.doc_id: (r.w, r.w_hat) for r in got.itertuples()} == expect


# 2-decimal-quantized floats: the corr/OLS fragments cast through
# decimal(12,2), so feed values that are exactly representable there
cents = st.integers(min_value=-9_000_00, max_value=9_000_00).map(lambda c: c / 100.0)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(cents, cents), min_size=2, max_size=150))
def test_corr_and_ols_from_pairs_match_exact_reference(pairs):
    """corr_from_pairs / ols_from_pairs reproduce an EXACT Python
    re-derivation of the same formula: moment sums computed in integer
    cents (what the decimal(12,2) casts do), converted with one correct
    rounding, then the identical IEEE final arithmetic — including the
    NULL conditions.  This is the fragment's actual contract; numpy
    corrcoef/polyfit parity in the well-conditioned regime is covered
    by the Spark-side suite tests."""
    import math
    from fractions import Fraction

    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": xs, "y": ys}))
    corr = sqlgen.corr_from_pairs("x", "y")
    slope, icept = sqlgen.ols_from_pairs("x", "y")
    row = con.execute(
        f"select {corr} as r, {slope} as m, {icept} as b from t"
    ).fetchone()

    cx = [round(v * 100) for v in xs]
    cy = [round(v * 100) for v in ys]
    n = float(len(cx))
    sx = float(Fraction(sum(cx), 100))
    sy = float(Fraction(sum(cy), 100))
    sxy = float(Fraction(sum(a * b for a, b in zip(cx, cy)), 10000))
    sxx = float(Fraction(sum(a * a for a in cx), 10000))
    syy = float(Fraction(sum(b * b for b in cy), 10000))
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    vxc = 0.0 if vx < 0 else vx
    vyc = 0.0 if vy < 0 else vy
    den = math.sqrt(vxc) * math.sqrt(vyc)
    exp_r = None if den == 0 else cov / den
    exp_m = None if vxc == 0 else cov / vxc
    exp_b = None if exp_m is None else (sy - exp_m * sx) / n

    for got, exp in zip(row, (exp_r, exp_m, exp_b)):
        if exp is None:
            assert got is None, (got, exp)
        else:
            assert got is not None and np.isclose(got, exp, rtol=1e-12, atol=1e-12), (
                got,
                exp,
            )


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.tuples(cents, cents), min_size=2, max_size=120),
    st.integers(min_value=2, max_value=6),
)
def test_ols_from_sums_fixedpoint_states_shard_invariant(pairs, shards):
    """The fsum-state OLS finalize is bitwise shard-count invariant: any
    sharding of the rows merges to the identical (slope, intercept)
    bits — the mergeable-rollup contract, checked in pure DuckDB."""
    pdf = pd.DataFrame(
        {"x": [p[0] for p in pairs], "y": [p[1] for p in pairs]}
    )
    pdf["shard"] = [i % shards for i in range(len(pdf))]
    con = duckdb.connect()
    con.register("t", pdf)
    slope, icept = sqlgen.ols_from_sums(
        "count(*)",
        sqlgen.fsum("x"),
        sqlgen.fsum("y"),
        sqlgen.fsum("(x) * (y)"),
        sqlgen.fsum("(x) * (x)"),
    )
    one = con.execute(f"select {slope} as m, {icept} as b from t").fetchone()

    # merge path: per-shard integer states -> re-aggregated -> finalize
    states = []
    for c, pre in (("x", "sx"), ("y", "sy"), ("(x) * (y)", "sxy"), ("(x) * (x)", "sxx")):
        states += sqlgen.fsum_state(c, pre)
    per = f"select shard, count(*) as n, {', '.join(states)} from t group by shard"
    merged_sums = {
        p: sqlgen.fsum_final(p) for p in ("sx", "sy", "sxy", "sxx")
    }
    m_slope, m_icept = sqlgen.ols_from_sums(
        "sum(n)", *(merged_sums[p] for p in ("sx", "sy", "sxy", "sxx"))
    )
    merges = []
    for p in ("sx", "sy", "sxy", "sxx"):
        merges += sqlgen.fsum_merge(p)
    two = con.execute(
        f"with per as ({per}), m as (select sum(n) as n, {', '.join(merges)} from per) "
        f"select ({merged_sums['sxy']} - {merged_sums['sx']} * {merged_sums['sy']} / n) "
        f" / nullif((case when ({merged_sums['sxx']} - {merged_sums['sx']} * {merged_sums['sx']} / n) < 0 "
        f"   then 0.0 else ({merged_sums['sxx']} - {merged_sums['sx']} * {merged_sums['sx']} / n) end), 0) as m, "
        f"(({merged_sums['sy']} - (({merged_sums['sxy']} - {merged_sums['sx']} * {merged_sums['sy']} / n) "
        f" / nullif((case when ({merged_sums['sxx']} - {merged_sums['sx']} * {merged_sums['sx']} / n) < 0 "
        f"   then 0.0 else ({merged_sums['sxx']} - {merged_sums['sx']} * {merged_sums['sx']} / n) end), 0)) * {merged_sums['sx']}) / n) as b "
        f"from m"
    ).fetchone()

    def eq(a, b):
        return (a is None and b is None) or (a == b)

    assert eq(one[0], two[0]) and eq(one[1], two[1]), (one, two)
