"""Embedding near-dup: the banded-LSH default path vs the exact all-pairs
verifier — soundness (subset, exact cosines), recall bound, and the
plan-shape guarantee that the default never plans a nested-loop join."""

from __future__ import annotations

import pyspark.sql.functions as F

from vtb_datafusion_2023_spark.operators.similarity import cosine_near_pairs
from vtb_datafusion_2023_spark.sources.readers import load_table


def _pairs(df):
    return {(r.id_a, r.id_b): r.cos for r in df.collect()}


def test_banded_pairs_sound_and_recall_bounded(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    exact = _pairs(cosine_near_pairs(emb, threshold=0.4, exact=True))
    # fixture geometry (see operator docstring): loose threshold + 500
    # vectors -> r=4, b=8
    banded = _pairs(cosine_near_pairs(emb, threshold=0.4, n_planes=4, n_bands=8))
    # soundness: every banded pair is a true pair with the identical
    # exact cosine (verify step is exact; LSH only prunes candidates)
    for pair, cos in banded.items():
        assert pair in exact
        assert cos == exact[pair]
    # recall: the fixture geometry must keep a useful fraction of true
    # pairs on the driver's embedding fixture
    assert len(exact) > 0
    assert len(banded) >= 0.5 * len(exact), (len(banded), len(exact))


def test_banded_path_plans_no_nested_loop_join(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    plan = (
        cosine_near_pairs(emb, threshold=0.4, n_planes=4, n_bands=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the exact verifier IS the nested-loop shape (that's why it's opt-in)
    exact_plan = (
        cosine_near_pairs(emb, threshold=0.4, exact=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoopJoin" in exact_plan or "CartesianProduct" in exact_plan


def test_banded_pairs_deterministic_across_partitionings(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    one = _pairs(cosine_near_pairs(emb.repartition(1), threshold=0.4, n_planes=4, n_bands=8))
    many = _pairs(cosine_near_pairs(emb.repartition(13), threshold=0.4, n_planes=4, n_bands=8))
    assert one == many and len(one) > 0


def test_higher_band_count_raises_recall(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings").limit(150)
    exact = _pairs(cosine_near_pairs(emb, threshold=0.4, exact=True))
    few = _pairs(cosine_near_pairs(emb, threshold=0.4, n_planes=4, n_bands=2))
    many = _pairs(cosine_near_pairs(emb, threshold=0.4, n_planes=4, n_bands=12))
    assert set(few) <= set(exact) and set(many) <= set(exact)
    assert len(many) >= len(few)


def _topk(df):
    return {(r.query_id, r.rank): (r.neighbor_id, r.cos) for r in df.collect()}


def test_knn_join_blocked_matches_bruteforce_bitwise(spark, sf_small):
    from vtb_datafusion_2023_spark.operators.similarity import (
        cosine_topk,
        knn_join_blocked,
    )

    emb = load_table(spark, sf_small, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    brute = _topk(cosine_topk(emb, q, k=5))
    gemm = _topk(knn_join_blocked(emb, q, k=5))
    assert gemm == brute and len(gemm) > 0  # bitwise: cos included


def test_knn_join_blocked_partitioning_invariant(spark, sf_small):
    from vtb_datafusion_2023_spark.operators.similarity import knn_join_blocked

    emb = load_table(spark, sf_small, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    one = _topk(knn_join_blocked(emb.repartition(1), q, k=5))
    many = _topk(knn_join_blocked(emb.repartition(11), q, k=5))
    assert one == many and len(one) > 0


def test_knn_join_blocked_plans_no_nested_loop(spark, sf_small):
    from vtb_datafusion_2023_spark.operators.similarity import knn_join_blocked

    emb = load_table(spark, sf_small, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    plan = (
        knn_join_blocked(emb, q, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the candidate set joins back as the BROADCAST side; the corpus scan
    # must not shuffle
    assert "BroadcastHashJoin" in plan, plan
