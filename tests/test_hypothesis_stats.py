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
