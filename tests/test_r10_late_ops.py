"""Round-10 late additions: degree assortativity + temperature mixing."""

import math

import numpy as np


def _assort(spark, edge_list):
    from vtb_datafusion_2023_spark.operators.graph import degree_assortativity

    edges = spark.createDataFrame(edge_list, "src long, dst long")
    rows = degree_assortativity(edges).collect()
    assert len(rows) == 1
    return rows[0]


def _numpy_assortativity(edge_list):
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    deg: dict = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in und:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    return len(und), float(np.corrcoef(xs, ys)[0, 1])


def test_degree_assortativity_star_is_minus_one(spark):
    # K_{1,4}: every edge joins deg-4 hub to a deg-1 leaf -> r = -1
    row = _assort(spark, [(0, 1), (0, 2), (0, 3), (0, 4)])
    assert row.n_edges == 4
    assert abs(row.assortativity - (-1.0)) < 1e-12


def test_degree_assortativity_regular_graph_is_null(spark):
    # triangle: all degrees equal -> zero variance -> NULL (like scipy nan)
    row = _assort(spark, [(1, 2), (2, 3), (3, 1)])
    assert row.n_edges == 3
    assert row.assortativity is None


def test_degree_assortativity_matches_numpy(spark):
    # lollipop + pendant chain, duplicate/reversed/self edges thrown in
    # to exercise the dedupe
    edges = [
        (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4),
        (6, 7), (7, 8), (2, 1), (4, 3), (5, 5),
    ]
    row = _assort(spark, edges)
    n_ref, r_ref = _numpy_assortativity(edges)
    assert row.n_edges == n_ref
    assert abs(row.assortativity - r_ref) < 1e-12


def test_temperature_mix_weights_quarter_power(spark):
    from vtb_datafusion_2023_spark.operators.filtering import (
        temperature_mix_weights,
    )

    # source b has 16x the tokens of a -> weight ratio 16^0.25 = 2 exactly
    rows = [("a", 10) for _ in range(10)] + [("b", 160) for _ in range(10)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    got = {
        r.source: r
        for r in temperature_mix_weights(
            df, sqrt_steps=2, token_budget=1_000_000
        ).collect()
    }
    assert got["a"].n_docs == 10 and got["b"].n_docs == 10
    assert got["a"].n_tokens == 100 and got["b"].n_tokens == 1600
    assert abs(got["b"].weight / got["a"].weight - 2.0) < 1e-12
    assert abs(got["a"].weight + got["b"].weight - 1.0) < 1e-12
    for r in got.values():
        assert abs(r.alloc_tokens - r.weight * 1_000_000.0) < 1e-6
        assert abs(r.epochs - r.alloc_tokens / r.n_tokens) < 1e-12
    # temperature flattens: raw share 16/17 vs mixed share 2/3
    assert got["b"].weight < 1600 / 1700


def test_temperature_mix_matches_numpy_reference(spark):
    from vtb_datafusion_2023_spark.operators.filtering import (
        temperature_mix_weights,
    )

    counts = {"s0": 7, "s1": 9973, "s2": 123456, "s3": 31}
    rows = [(s, int(n)) for s, n in counts.items()]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    got = {
        r.source: r
        for r in temperature_mix_weights(
            df, sqrt_steps=2, token_budget=5_000_000
        ).collect()
    }
    w_raw = {s: math.sqrt(math.sqrt(float(n))) for s, n in counts.items()}
    denom = 0.0
    for s in sorted(counts):
        denom += w_raw[s]
    for s, n in counts.items():
        w = w_raw[s] / denom
        assert abs(got[s].weight - w) < 1e-15
        assert abs(got[s].epochs - (w * 5_000_000.0) / n) < 1e-9


def test_temperature_mix_single_source_gets_everything(spark):
    from vtb_datafusion_2023_spark.operators.filtering import (
        temperature_mix_weights,
    )

    df = spark.createDataFrame([("only", 42)], "source string, n_tokens long")
    row = temperature_mix_weights(df, token_budget=777).collect()[0]
    assert row.weight == 1.0
    assert row.alloc_tokens == 777.0


def test_int8_rerank_full_coarse_equals_bruteforce(spark, sf_small):
    """With k_coarse >= corpus size stage 1 prunes nothing, so the final
    ranking must EQUAL brute-force cosine top-k bit-for-bit."""
    from pyspark.sql import functions as F

    from vtb_datafusion_2023_spark.operators.similarity import (
        cosine_topk,
        int8_rerank_topk,
    )
    from vtb_datafusion_2023_spark.suite.datapipe import T

    emb = T(spark, sf_small, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    n = emb.count()
    exact = {tuple(r) for r in cosine_topk(emb, qs, k=5).collect()}
    funnel = {
        (r.query_id, r.neighbor_id, r.rank, r.cos)
        for r in int8_rerank_topk(emb, qs, k_coarse=n, k=5).collect()
    }
    assert funnel == exact and len(exact) == 25


def test_int8_coarse_score_matches_numpy_and_tracks_cosine(spark, sf_small):
    from pyspark.sql import functions as F

    from vtb_datafusion_2023_spark.operators.similarity import int8_rerank_topk
    from vtb_datafusion_2023_spark.suite.datapipe import T

    emb = T(spark, sf_small, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3)
    rows = int8_rerank_topk(emb, qs, k_coarse=8, k=8).collect()
    assert rows
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}

    def q8(x):
        s = 127.0 / np.abs(x).max()
        return np.floor(x * s + 0.5).astype(np.int64)

    for r in rows:
        qa, ca = q8(vecs[r.query_id]), q8(vecs[r.neighbor_id])
        ref = float(qa @ ca) / (
            math.sqrt(float(qa @ qa)) * math.sqrt(float(ca @ ca))
        )
        assert abs(r.cos8 - ref) < 1e-12
        # 32-dim int8 quantization: coarse score tracks true cosine
        assert abs(r.cos8 - r.cos) < 0.05
