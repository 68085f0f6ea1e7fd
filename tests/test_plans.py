"""End-to-end plan tests: branch C features, sequence prep, and the full
run.py-equivalent submission pipeline on a transactions fixture derived
from the events table."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vtb_datafusion_2023_spark.plans import (
    branch_c_features,
    rnn_input_sequences,
    run_submission,
    vrae_input_sequences,
)
from vtb_datafusion_2023_spark.sources.readers import load_table

# events -> transactions contract: 5 category codes incl. the 6012
# blacklist target (FIXTURES.md §1)
_CAT_MAP = "case event_type when 'click' then 5411 when 'view' then 4111 " \
    "when 'signup' then 742 when 'purchase' then 5812 when 'error' then 6012 end"
CAT_VOCAB = [742, 4111, 5411, 5812]  # post-blacklist


@pytest.fixture(scope="module")
def tx(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    return ev.select(
        "user_id",
        F.expr(_CAT_MAP).alias("cat"),
        F.expr("case when event_type in ('purchase','error') then -value else value end").alias("amt"),
        "ts",
        F.col("event_id").alias("ord"),
    )


def test_branch_c_features_shape(tx):
    feats, dropped = branch_c_features(tx, cat_vocab=CAT_VOCAB)
    pdf = feats.toPandas()
    assert len(pdf) > 0
    # every expected block present
    for probe in ["mcc_freq-5411", "mcc_sum-742", "mcc_freq_stats_mean",
                  "mcc_freq_proc_stats_divmm1", "dom-15", "dow-0", "hod-23",
                  "time_day_skew"]:
        assert probe in pdf.columns, probe
    assert pdf.isna().sum().sum() == 0  # fill-0 conform (P9/M2)
    assert dropped.count() == 0  # sf0.001 users all survive trim+blacklist


def test_branch_c_fused_matches_blocks_bitwise(tx):
    """The fused single-aggregate branch C must reproduce the 8-block
    composition bit-for-bit (counts / decimal sums / exact percentiles
    are order-insensitive, so fusion is a pure plan change) — including
    column order, which the FEATURE_COLS contract pins downstream."""
    import numpy as np

    fused, d1 = branch_c_features(tx, cat_vocab=CAT_VOCAB, fused=True)
    blocks, d2 = branch_c_features(tx, cat_vocab=CAT_VOCAB, fused=False)
    pa = fused.orderBy("user_id").toPandas()
    pb = blocks.orderBy("user_id").toPandas()
    assert list(pa.columns) == list(pb.columns)
    assert len(pa) == len(pb) > 0
    for c in pa.columns:
        va, vb = pa[c].values, pb[c].values
        if va.dtype.kind == "f":
            eq = (np.isnan(va.astype(float)) & np.isnan(vb.astype(float))) | (va == vb)
        else:
            eq = va == vb
        assert eq.all(), (c, va[~eq][:3], vb[~eq][:3])
    assert d1.count() == d2.count()


def test_horizontal_stats_multi_extras_match_separate_blocks(tx):
    """horizontal_stats_multi with pass-through extra_aggs must equal the
    two separate aggregates joined: same values bitwise, extras leading."""
    import numpy as np

    from vtb_datafusion_2023_spark.operators.gstats import (
        horizontal_stats,
        horizontal_stats_multi,
    )

    long = tx.groupBy("user_id", "cat").agg(F.count(F.lit(1)).alias("cnt"))
    extras = [
        F.expr(f"coalesce(max(case when cat = {v} then cnt end), 0) as cnt_{v}")
        for v in (742, 4111)
    ]
    fused = horizontal_stats_multi(long, "user_id", [("cnt", "hs")], extra_aggs=extras)
    wide = long.groupBy("user_id").agg(*extras)
    hs = horizontal_stats(long, "user_id", "cnt", "hs")
    joined = wide.join(hs, "user_id", "inner")
    pa = fused.orderBy("user_id").toPandas()
    pb = joined.orderBy("user_id").toPandas()
    assert list(pa.columns) == list(pb.columns)  # extras lead, stats follow
    assert len(pa) == len(pb) > 0
    for c in pa.columns:
        va, vb = pa[c].values, pb[c].values
        if va.dtype.kind == "f":
            eq = (np.isnan(va) & np.isnan(vb)) | (va == vb)
        else:
            eq = va == vb
        assert eq.all(), c


def test_branch_c_fused_plan_is_narrow(tx):
    """The point of fusion: 2 exchanges and 1 join leg where the block
    form plans ~19 exchanges and a 7-leg SMJ chain — at 100 TB that is
    the difference between shuffling the row set once and nine times."""
    from vtb_datafusion_2023_spark.operators.cleaning import clean_transactions

    cleaned = clean_transactions(
        tx, user_col="user_id", cat_col="cat", value_col="amt", n_amt=10, n_mcc=10
    ).localCheckpoint(eager=True)
    feats, _ = branch_c_features(cleaned, cat_vocab=CAT_VOCAB, fused=True)
    p = feats._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") <= 3, p.count("Exchange")
    assert p.count("SortMergeJoin") + p.count("BroadcastHashJoin") <= 2


def test_corpus_prep_fused_matches_blocks_bitwise(spark, sf_small):
    """The r8 corpus-prep rewrite (window-based exact-dedup + pinned
    substring-dedup fan-out) must reproduce the block composition
    bit-for-bit, including the shard/pos assignment (order-sensitive
    through the md5 sort keys).  Measured: sf1 6.5 -> 3.5 s, sf10
    39-47 -> 13-14 s (the unfused form replays the window-dedup subtree
    twice — ReuseExchange can't cover it because column pruning makes
    the two consumers' subtrees non-identical)."""
    from vtb_datafusion_2023_spark.suite.datapipe import _corpus_prep

    pa = _corpus_prep(spark, sf_small, fused=True).orderBy("doc_id").toPandas()
    pb = _corpus_prep(spark, sf_small, fused=False).orderBy("doc_id").toPandas()
    assert list(pa.columns) == list(pb.columns)
    assert len(pa) == len(pb) > 0
    assert pa.equals(pb)


def test_corpus_prep_fused_plan_is_narrow(spark, sf_small):
    """Post-rewrite plan shape: the window-dedup subtree executes once
    (pinned), exact dedup is one window exchange, no SMJ legs remain —
    10 exchanges + 2 SMJ in the block form, <= 5 + 0 fused."""
    from vtb_datafusion_2023_spark.suite.datapipe import _corpus_prep

    df = _corpus_prep(spark, sf_small, fused=True)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") <= 5, p.count("Exchange")
    assert p.count("SortMergeJoin") == 0


def test_vrae_sequences(tx):
    seqs = vrae_input_sequences(tx, cat_vocab=CAT_VOCAB + [6012]).collect()
    assert len(seqs) > 0
    n_feat = 6 + 5  # numerics + one-hot cats
    for r in seqs[:5]:
        assert all(len(step) == n_feat for step in r.seq)
        # cumsum over full history: last amt_cum equals sum of amt steps? (amt not in features)
        assert len(r.seq) >= 1


def test_rnn_sequences_fixed_length(tx):
    edges = {"amt": [-1000.0, -10.0, 0.0, 10.0, 1000.0], "time_day": [0.0, 21600.0, 43200.0, 64800.0, 86400.0]}
    seqs = rnn_input_sequences(tx, edges, seq_len=40).collect()
    assert all(len(r.seq) == 40 for r in seqs)
    assert all(len(step) == 2 for r in seqs for step in r.seq[:2])


def test_run_submission_end_to_end(spark, tx, tmp_path):
    out = str(tmp_path / "submission")
    sub = run_submission(
        spark, tx, cat_vocab=CAT_VOCAB, n_reps=3, output_path=out
    ).toPandas()
    n_users = tx.select("user_id").distinct().count()
    # one score per input user (J4 re-adds anyone dropped), sorted
    assert len(sub) == n_users
    assert list(sub.columns) == ["user_id", "target"]
    assert (sub["user_id"].sort_values().to_numpy() == sub["user_id"].to_numpy()).all()
    assert sub["target"].notna().all()
    # CSV written (S3)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == n_users


def test_run_submission_deterministic(spark, tx):
    a = run_submission(spark, tx, cat_vocab=CAT_VOCAB, n_reps=2).toPandas()
    b = run_submission(spark, tx, cat_vocab=CAT_VOCAB, n_reps=2).toPandas()
    assert (a["target"].to_numpy() == b["target"].to_numpy()).all()


def test_run_submission_bucketed_matches_and_skips_exchange(spark, tx, tmp_path):
    """ROADMAP #7: bucketing the cleaned intermediate must not change the
    submission, and per-user groupBys over the bucketed table must plan
    without a user_id exchange.  (Linear branch-A scorer: the property
    under test is the bucketed exchange elision, which is independent of
    the scorer; the real-weights path is covered by the e2e and
    determinism tests.)"""
    plain = run_submission(
        spark, tx, cat_vocab=CAT_VOCAB, n_reps=2, use_real_rnn=False
    ).toPandas()
    bucketed = run_submission(
        spark,
        tx,
        cat_vocab=CAT_VOCAB,
        n_reps=2,
        bucket_dir=str(tmp_path),
        use_real_rnn=False,
    ).toPandas()
    assert (plain["user_id"].to_numpy() == bucketed["user_id"].to_numpy()).all()
    assert (plain["target"].to_numpy() == bucketed["target"].to_numpy()).all()

    cleaned = spark.table("cleaned_tx_bucketed")
    plan = cleaned.groupBy("user_id").count()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(user_id" not in plan, plan


def test_run_submission_with_real_cbm(spark, tx):
    """U6 real-model path: the reference .cbm scores the assembled frame
    conform-by-name (nn_predict is the one shared trained feature; the
    rest of the synthetic vocabulary scores at the 0-fill, run.py:470-475
    semantics)."""
    import os

    import pytest as _pytest

    if not os.path.exists("/root/reference/model_dir/model_cb.cbm"):
        _pytest.skip("reference .cbm not present")
    from vtb_datafusion_2023_spark.inference.udfs import catboost_cbm_model

    sub = run_submission(
        spark, tx, cat_vocab=CAT_VOCAB, n_reps=2, model=catboost_cbm_model()
    ).toPandas()
    n_users = tx.select("user_id").distinct().count()
    assert len(sub) == n_users
    assert sub["target"].notna().all()
    # raw GBDT logits, not the linear stand-in's scale: finite and varied
    assert sub["target"].std() >= 0.0 and sub["target"].abs().max() < 50
