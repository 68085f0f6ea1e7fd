"""The production CLI (run.py equivalent) end-to-end on a generated CSV,
and the spark.ml training/CV harness (U7/A16)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from vtb_datafusion_2023_spark.sources.readers import load_table


def _make_csv(path, n_users=12, rows_per_user=60, with_ord=True):
    rng = np.random.RandomState(7)
    rows = []
    codes = [742, 4111, 5411, 5812, 6012]
    t0 = pd.Timestamp("2023-01-01")
    i = 0
    for u in range(n_users):
        for _ in range(rows_per_user):
            rows.append(
                {
                    "user_id": u,
                    "mcc_code": codes[rng.randint(len(codes))],
                    "currency_rk": 48,
                    "transaction_amt": round(float(rng.randn() * 50), 2),
                    "transaction_dttm": t0 + pd.Timedelta(minutes=7 * i),
                    **({"ord": i} if with_ord else {}),
                }
            )
            i += 1
    pd.DataFrame(rows).to_csv(path, index=False)


def test_cli_end_to_end(spark, tmp_path):
    src = tmp_path / "tx.csv"
    out = tmp_path / "out"
    _make_csv(str(src))
    from vtb_datafusion_2023_spark.run import main

    main([str(src), str(out), "--reps", "2"])
    back = spark.read.option("header", True).csv(str(out))
    assert back.count() == 12
    assert set(back.columns) == {"user_id", "target"}


def test_cli_stamps_missing_ord(spark, tmp_path):
    src = tmp_path / "tx_noord.csv"
    out = tmp_path / "out2"
    _make_csv(str(src), with_ord=False)
    from vtb_datafusion_2023_spark.run import main

    main([str(src), str(out), "--reps", "1", "--cats", "742,4111,5411,5812"])
    back = spark.read.option("header", True).csv(str(out))
    assert back.count() == 12


def test_mlcv_harness_u7(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    df = emb.select(
        (F.col("label") == 1).cast("int").alias("label"),
        *[F.element_at("embedding", i + 1).cast("double").alias(f"e{i}") for i in range(8)],
    )
    from vtb_datafusion_2023_spark.ml import score_auc, train_with_cv

    model, metrics = train_with_cv(df, [f"e{i}" for i in range(8)], n_folds=3)
    assert len(metrics) == 2 and all(0.0 <= m <= 1.0 for m in metrics)
    auc = score_auc(df, [f"e{i}" for i in range(8)])
    assert 0.0 <= auc <= 1.0


def test_gbt_cv_harness_u7(spark, sf_small):
    """U7 with the reference's actual model family: boosted depth-3 trees
    (training.ipynb cell 16) via spark.ml GBTClassifier + k-fold CV."""
    emb = load_table(spark, sf_small, "embeddings")
    df = emb.select(
        (F.col("label") == 1).cast("int").alias("label"),
        *[F.element_at("embedding", i + 1).cast("double").alias(f"e{i}") for i in range(8)],
    )
    from vtb_datafusion_2023_spark.ml import train_gbt_with_cv

    model, metrics = train_gbt_with_cv(
        df, [f"e{i}" for i in range(8)], n_folds=3, max_iter=5, max_depth=3
    )
    assert len(metrics) == 1 and 0.0 <= metrics[0] <= 1.0
    assert model.getMaxDepth() == 3 and len(model.trees) == 5


def test_pair_affinity_matches_fpgrowth(spark, sf_small):
    """The exact 2-itemset counts must agree with spark.ml FPGrowth's
    frequent itemsets at the same support threshold."""
    from pyspark.ml.fpm import FPGrowth

    from vtb_datafusion_2023_spark.operators.analytics import pair_affinity

    ev = load_table(spark, sf_small, "events")
    ours = {
        (r.item_a, r.item_b): r.n_both
        for r in pair_affinity(ev).collect()
    }
    n_baskets = ev.select("user_id").distinct().count()
    baskets = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("items")
    )
    fp = FPGrowth(itemsCol="items", minSupport=0.01, minConfidence=0.1).fit(baskets)
    fp_pairs = {
        tuple(sorted(r["items"])): r["freq"]
        for r in fp.freqItemsets.collect()
        if len(r["items"]) == 2
    }
    assert fp_pairs  # threshold low enough to surface pairs
    for pair, freq in fp_pairs.items():
        assert ours[pair] == freq
    # lift sanity on one pair
    some = pair_affinity(ev).first()
    assert some.lift > 0


def test_isotonic_calibration_monotone_and_rank_preserving(spark, sf_small):
    from pyspark.ml.feature import VectorAssembler

    from vtb_datafusion_2023_spark.ml import calibrate_isotonic

    emb = load_table(spark, sf_small, "embeddings")
    scored = emb.select(
        F.element_at("embedding", 1).cast("double").alias("score"),
        (F.col("label") == 1).cast("double").alias("label"),
    )
    model = calibrate_isotonic(scored)
    grid = spark.createDataFrame([(x / 20.0,) for x in range(-40, 41)], "score double")
    gv = VectorAssembler(inputCols=["score"], outputCol="_f").transform(
        grid.withColumn("label", F.lit(0.0))
    )
    out = model.transform(gv).orderBy("score").collect()
    cal = [r.calibrated for r in out]
    assert all(b >= a - 1e-12 for a, b in zip(cal, cal[1:]))  # monotone
    assert 0.0 <= min(cal) and max(cal) <= 1.0
