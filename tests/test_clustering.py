"""kmeans (operators/clustering.py) vs an independent numpy Lloyd
reference with the operator's exact semantics: id-ordered init,
left-to-right distance fold, first-min argmin (ties -> smallest cid),
fsum-quantized means, empty clusters keep their previous centroid."""

import math
import random

import pytest

from vtb_datafusion_2023_spark.operators.clustering import kmeans


def _fsum_mean(values):
    hi = lo = 0
    for x in values:
        h = math.floor(x + 0.5)
        hi += h
        lo += math.floor((x - h) * 1e6 + 0.5)
    return (float(hi) + float(lo) / 1e6) / len(values)


def _ref_kmeans(vecs, k, iterations):
    """vecs: dict id -> list[float].  Returns dict id -> cid."""
    ids = sorted(vecs)
    cents = [list(vecs[i]) for i in ids[:k]]

    def dist(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            d = x - y
            acc = acc + d * d
        return acc

    def assign():
        out = {}
        for i in ids:
            best_cid, best_d = 0, None
            for cid, c in enumerate(cents):
                d = dist(vecs[i], c)
                if best_d is None or d < best_d:  # strict: ties keep lowest cid
                    best_cid, best_d = cid, d
            out[i] = best_cid
        return out

    for _ in range(iterations):
        a = assign()
        for cid in range(k):
            members = [vecs[i] for i in ids if a[i] == cid]
            if members:
                cents[cid] = [
                    _fsum_mean([m[j] for m in members]) for j in range(len(cents[cid]))
                ]
    return assign()


@pytest.mark.parametrize("n,dim,k,iters", [(120, 8, 4, 2), (60, 5, 3, 3)])
def test_kmeans_matches_numpy_reference(spark, n, dim, k, iters):
    rng = random.Random(n * 31 + dim)
    vecs = {
        i: [round(rng.gauss(rng.choice([-1.0, 0.0, 1.0]), 0.4), 4) for _ in range(dim)]
        for i in range(n)
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    # float storage rounds the inputs: replay the reference on the
    # float32-rounded values the operator actually sees
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]
    ref = _ref_kmeans({i: [f32(x) for x in v] for i, v in vecs.items()}, k, iters)

    got = {
        r["vec_id"]: r["cid"]
        for r in kmeans(df, dim=dim, k=k, iterations=iters).collect()
    }
    assert got == ref


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # two far groups, k=3: centroid 2 (init = third vector) loses all
    # members after the first update -> must keep its previous centroid
    # and the result must stay deterministic
    vecs = {
        0: [0.0, 0.0], 1: [0.1, 0.0], 2: [0.05, 0.01],
        3: [10.0, 10.0], 4: [10.1, 10.0], 5: [9.9, 10.1],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    ref = _ref_kmeans(vecs, k=3, iterations=2)
    got = {r["vec_id"]: r["cid"] for r in kmeans(df, dim=2, k=3, iterations=2).collect()}
    assert got == ref
    assert len(set(got.values())) >= 2


def test_kmeans_partitioning_invariant(spark, sf_small):
    from vtb_datafusion_2023_spark.sources.readers import load_table

    emb = load_table(spark, sf_small, "embeddings")
    a = {r["vec_id"]: r["cid"] for r in kmeans(emb, dim=64, k=4, iterations=1).collect()}
    b = {
        r["vec_id"]: r["cid"]
        for r in kmeans(emb.repartition(13), dim=64, k=4, iterations=1).collect()
    }
    assert a == b
    assert len(set(a.values())) >= 2


def test_semdedup_matches_reference(spark):
    """semdedup == drop(b) iff exists a<b, same k-means cluster,
    cosine(a,b) >= t — checked against an independent Python reference
    over the same float32-rounded vectors."""
    import struct

    from vtb_datafusion_2023_spark.operators.clustering import semdedup

    rng = random.Random(99)
    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]
    base = [[rng.gauss(0, 1) for _ in range(6)] for _ in range(5)]
    vecs = {}
    for i in range(80):
        b = base[rng.randrange(5)]
        vecs[i] = [f32(x + rng.gauss(0, 0.3)) for x in b]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    k, iters, t = 4, 2, 0.8
    ref_asg = _ref_kmeans(vecs, k, iters)

    def cos(a, b):
        d = n1 = n2 = 0.0
        for x, y in zip(a, b):
            d += x * y
            n1 += x * x
            n2 += y * y
        return d / (n1**0.5 * n2**0.5)

    ref_keep = {}
    for b in sorted(vecs):
        dup = any(
            ref_asg[a] == ref_asg[b] and cos(vecs[a], vecs[b]) >= t
            for a in vecs
            if a < b
        )
        if not dup:
            ref_keep[b] = ref_asg[b]

    got = {
        r["vec_id"]: r["cid"]
        for r in semdedup(df, dim=6, k=k, iterations=iters, threshold=t).collect()
    }
    assert got == ref_keep
    assert 0 < len(got) < 80  # non-trivial fixture: some dropped, some kept


def test_cluster_sample_caps_and_determinism(spark, sf_small):
    from vtb_datafusion_2023_spark.operators.clustering import cluster_sample
    from vtb_datafusion_2023_spark.sources.readers import load_table

    emb = load_table(spark, sf_small, "embeddings")
    m = 5
    got = cluster_sample(emb, dim=64, per_cluster=m, k=4, iterations=1).collect()
    per = {}
    for r in got:
        per[r.cid] = per.get(r.cid, 0) + 1
    assert all(v <= m for v in per.values())
    assert len(per) >= 2
    # deterministic under repartitioning
    again = cluster_sample(
        emb.repartition(7), dim=64, per_cluster=m, k=4, iterations=1
    ).collect()
    assert sorted((r.vec_id, r.cid) for r in got) == sorted(
        (r.vec_id, r.cid) for r in again
    )


def test_kll_inclusive_rule_adversarial_groups(spark):
    """The exact-regime contract 'estimate == sorted[ceil(q*n)]' holds
    for adversarial group shapes: tiny n, duplicate-heavy values,
    fractions landing exactly on integer ranks (q*n integral), and
    q=0/q=1 — 200 random groups checked in ONE Spark job."""
    import math
    import random

    from pyspark.sql import functions as F

    from vtb_datafusion_2023_spark.operators.rollup import (
        partial_quantiles,
        quantile_estimate,
    )

    rng = random.Random(1234)
    rows, expect = [], {}
    fracs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    for g in range(200):
        n = rng.choice([1, 2, 3, 4, 5, 8, 10, 16, 40, 100])
        # duplicate-heavy: values drawn from a tiny pool
        vals = [float(rng.randrange(rng.choice([1, 2, 3, 7]))) for _ in range(n)]
        rows += [(g, v) for v in vals]
        sv = sorted(vals)
        expect[g] = tuple(sv[max(1, math.ceil(q * n)) - 1] for q in fracs)

    df = spark.createDataFrame(rows, "g int, v double")
    out = quantile_estimate(partial_quantiles(df, ["g"], "v", k=4096), fracs).collect()
    got = {
        r.g: (r.kq_000, r.kq_100, r.kq_250, r.kq_500, r.kq_750, r.kq_900, r.kq_1000)
        for r in out
    }
    assert got == expect


def test_kmeans_raises_on_dim_mismatch(spark):
    """A ragged or wrong-dim vector must fail loudly (the oracle unrolls
    exactly dim terms — silent cross-engine divergence is the failure
    mode being guarded)."""
    import pytest as _pytest

    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame(
        [(0, [0.1] * 8), (1, [0.2] * 8), (2, [0.3] * 5)],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(SparkRuntimeException, match="expected dim 8"):
        kmeans(df, dim=8, k=2, iterations=1).collect()


def test_kmeans_raises_on_dim_mismatch(spark):
    """A ragged or wrong-dim vector must fail loudly (the oracle unrolls
    exactly dim terms — silent cross-engine divergence is the failure
    mode being guarded)."""
    import pytest as _pytest

    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame(
        [(0, [0.1] * 8), (1, [0.2] * 8), (2, [0.3] * 5)],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(SparkRuntimeException, match="expected dim 8"):
        kmeans(df, dim=8, k=2, iterations=1).collect()


def test_derived_fanout_routing():
    """fanout follows the measured hottest cluster: ceil(max²/budget),
    clamped to [1, cap] (SCALE.md skew runbook -> semdedup wiring)."""
    import pytest

    from vtb_datafusion_2023_spark.operators.clustering import derived_fanout

    assert derived_fanout(0) == 1
    assert derived_fanout(1_000, pair_budget=2_000_000) == 1
    assert derived_fanout(500, pair_budget=250_000) == 1
    assert derived_fanout(1_000, pair_budget=250_000) == 4
    assert derived_fanout(2_000, pair_budget=2_000_000) == 2
    assert derived_fanout(10_000, pair_budget=2_000_000) == 50
    # cap: a degenerate single-cluster corpus can't demand unbounded salt
    assert derived_fanout(1_000_000, pair_budget=2_000_000) == 64
    assert derived_fanout(1_000_000, pair_budget=2_000_000, cap=16) == 16
    with pytest.raises(ValueError):
        derived_fanout(10, pair_budget=0)


def test_semdedup_hot_cluster_derives_wider_fanout_same_result(spark):
    """A hot-cluster corpus (nearly all vectors land in one k-means
    cluster) must derive a WIDER salt than the uniform case, and the
    kept set must be identical at any fanout (the salt only reroutes
    pair evaluation, never changes the pair set)."""
    from vtb_datafusion_2023_spark.operators.clustering import (
        derived_fanout,
        kmeans,
        semdedup,
    )

    dim, k = 4, 3
    # 3 tight blobs: ids 0..59 near (10,0,0,0), 60..62 near (0,10,0,0),
    # 63..65 near (0,0,10,0) -> hottest cluster has 60 members
    rows = []
    for i in range(60):
        rows.append((i, [10.0 + (i % 7) * 0.01, float(i % 3) * 0.01, 0.0, 0.0]))
    for j, base in enumerate(([0.0, 10.0, 0.0, 0.0], [0.0, 0.0, 10.0, 0.0])):
        for m in range(3):
            i = 60 + j * 3 + m
            rows.append((i, [b + m * 0.01 for b in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    sizes = (
        kmeans(df, dim=dim, k=k, iterations=2)
        .groupBy("cid")
        .count()
        .collect()
    )
    hot = max(r["count"] for r in sizes)
    assert hot >= 55  # the fixture really is skewed
    assert derived_fanout(hot, pair_budget=500) > derived_fanout(
        3, pair_budget=500
    )

    kept_derived = {
        r["vec_id"]
        for r in semdedup(df, dim=dim, k=k, iterations=2, pair_budget=500).collect()
    }
    kept_fixed = {
        r["vec_id"]
        for r in semdedup(df, dim=dim, k=k, iterations=2, fanout=2).collect()
    }
    assert kept_derived == kept_fixed
    # the tight blobs really dedup: far fewer survivors than vectors
    assert len(kept_derived) < 66


def test_kmeans_gemm_assignment_matches_fold_on_separated_blobs(spark):
    """The Arrow-GEMM assignment (scale path for k grown with the
    corpus) must agree with the oracle-certified fold path whenever
    distances aren't ulp-ties — i.e. on any real clustering — and must
    be partitioning-invariant (row-independent math)."""
    from vtb_datafusion_2023_spark.operators.clustering import kmeans

    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for i in range(120):
        center = [(i % 4) * 50.0] * 6
        rows.append((i, [c + float(rng.uniform(-1, 1)) for c in center]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    fold = {
        (r.vec_id, r.cid)
        for r in kmeans(df, dim=6, k=4, iterations=2).collect()
    }
    gemm = {
        (r.vec_id, r.cid)
        for r in kmeans(df, dim=6, k=4, iterations=2, assign_strategy="gemm").collect()
    }
    assert fold == gemm
    gemm13 = {
        (r.vec_id, r.cid)
        for r in kmeans(
            df.repartition(13), dim=6, k=4, iterations=2, assign_strategy="gemm"
        ).collect()
    }
    assert gemm13 == gemm

    import pytest

    with pytest.raises(ValueError):
        kmeans(df, dim=6, k=4, assign_strategy="nope")


def test_kmeans_gemm_exact_duplicate_ties_pick_smallest_cid(spark):
    """np.argmin keeps the FIRST minimum: exact-duplicate vectors (the
    clone-heavy corpus regime the gemm path exists for) tie-break to
    the smallest cid, same rule as the fold path's (dist, cid) order."""
    from vtb_datafusion_2023_spark.operators.clustering import kmeans

    # vectors 0 and 1 identical -> centroids 0 and 1 identical; every
    # point is equidistant from both, so all must land in cid 0
    rows = [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [1.0, 1.0]), (3, [1.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.cid for r in kmeans(df, dim=2, k=2, iterations=1, assign_strategy="gemm").collect()}
    assert got == {0}


def test_semdedup_grouped_gemm_matches_fold(spark, sf_small):
    """The grouped-GEMM pair stage (scale path: cluster vectors through
    Arrow, m x m Gram in BLAS, no pair row materialized) must keep the
    same set as the oracle-certified salted-join fold path away from
    ulp-ties, and must enforce its cluster-size bound loudly."""
    import pytest

    from vtb_datafusion_2023_spark.operators.clustering import semdedup

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    fold = {
        r.vec_id for r in semdedup(emb, dim=64, k=4, iterations=2, threshold=0.4).collect()
    }
    gemm = {
        r.vec_id
        for r in semdedup(
            emb, dim=64, k=4, iterations=2, threshold=0.4,
            pair_strategy="grouped_gemm",
        ).collect()
    }
    assert fold == gemm and 0 < len(gemm) < emb.count()

    with pytest.raises(Exception, match="max_gemm_cluster"):
        semdedup(
            emb, dim=64, k=4, iterations=2,
            pair_strategy="grouped_gemm", max_gemm_cluster=3,
        ).count()
    with pytest.raises(ValueError):
        semdedup(emb, dim=64, pair_strategy="nope")


def test_semdedup_grouped_gemm_tiled_block_invariant(spark, sf_small):
    """The strip-tiled Gram reduction (r7: O(m·blk) memory, never m×m)
    is block-size invariant: a pathologically tiny block that forces
    many strip boundaries — including blocks that straddle the
    rows<j0 / local-square split — keeps the exact drop set of the
    single-strip run and of the oracle-certified fold path."""
    from vtb_datafusion_2023_spark.operators.clustering import semdedup

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    fold = {
        r.vec_id for r in semdedup(emb, dim=64, k=4, iterations=2, threshold=0.4).collect()
    }
    for blk in (1, 3, 7, 1024):
        got = {
            r.vec_id
            for r in semdedup(
                emb, dim=64, k=4, iterations=2, threshold=0.4,
                pair_strategy="grouped_gemm", gemm_block=blk,
            ).collect()
        }
        assert got == fold, blk


def test_semdedup_grouped_gemm_cluster_at_2x_old_bound(spark):
    """A single 40_000-row cluster — 2× the pre-r7 bound, where the
    untiled path materialized a 12.8 GB Gram plus same-order
    triu_indices scratch — dedups through the tiled path with the
    analytically known kept set (VERDICT r6 item 2 'done' criterion).

    Corpus: vec i = one-hot e_{i mod 8} in dim 8, so cosine is 1 within
    a direction group and 0 across; k=1 puts everything in one cluster;
    kept must be exactly the 8 smallest ids 0..7."""
    from vtb_datafusion_2023_spark.operators.clustering import semdedup

    m, dim = 40_000, 8
    df = spark.range(m).selectExpr(
        "id as vec_id",
        f"transform(sequence(0, {dim - 1}), "
        f"j -> cast(if(j = id % {dim}, 1.0, 0.0) as double)) as embedding",
    )
    kept = semdedup(
        df, dim=dim, k=1, iterations=1, threshold=0.5,
        assign_strategy="gemm", pair_strategy="grouped_gemm",
        max_gemm_cluster=40_000,
    )
    assert {r.vec_id for r in kept.collect()} == set(range(dim))


def test_derived_k_regimes():
    """derived_k holds the floor through the driver's gate scales (500 /
    2k vectors -> 8, matching the oracle head's certified geometry) and
    grows linearly past it (bounded E|c| ~ target_cluster)."""
    import pytest

    from vtb_datafusion_2023_spark.operators.clustering import derived_k

    assert derived_k(0) == 8
    assert derived_k(500) == 8
    assert derived_k(2_000) == 8
    assert derived_k(20_000) == 25
    assert derived_k(200_000) == 250
    assert derived_k(1_000, target_cluster=100, floor=4) == 10
    with pytest.raises(ValueError):
        derived_k(10, target_cluster=0)


def test_semdedup_scaled_head_matches_oracle_head_at_gate_scale(spark, sf_small):
    """The rows-only scale head dd_semdedup_scaled (derived k + gemm
    assignment + grouped-GEMM pairs) must return the IDENTICAL (vec_id,
    cid) rows as its hash-certified twin dd_semdedup at gate scale,
    where derived k == the twin's fixed k=8 — the NO_ORACLE_TWINS
    parity contract for this head."""
    from vtb_datafusion_2023_spark.suite import REGISTRY, queries

    queries()
    scaled = REGISTRY["dd_semdedup_scaled"].fn(spark, sf_small)
    oracle = REGISTRY["dd_semdedup"].fn(spark, sf_small)
    assert scaled.columns == oracle.columns
    got = {tuple(r) for r in scaled.collect()}
    want = {tuple(r) for r in oracle.collect()}
    assert got == want and len(want) > 0
