"""Similarity search over embedding columns: brute-force cosine top-k
(baseline) and hyperplane-LSH bucketed ANN (scale path).

All vector math is JVM-side array expressions: ``zip_with`` products +
``aggregate`` left-fold sums (deterministic order — bitwise reproducible
and oracle-comparable via DuckDB's ``list_reduce``).  At 100 TB the
brute-force path is a broadcast-join of the (small) query set against the
corpus — one scan, no shuffle; the LSH path buckets the corpus once and
joins per-bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k: every query vs every corpus vector.

    Returns (query_id, neighbor_id, rank, cos).  The query side is
    broadcast (ANN workloads have |queries| << |corpus|); ranking is a
    per-query window.  Ties break on neighbor_id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.crossJoin(broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def cosine_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    exact: bool = False,
    n_planes: int = 12,
    n_bands: int = 16,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= t).

    DEFAULT = banded-LSH candidates + exact verify (the 100 TB shape):
    each vector gets ``n_bands`` bucket keys (disjoint ``n_planes``-plane
    sign signatures); candidate pairs share ANY band bucket (equi-join on
    (band, bucket) — never a nested loop), are deduped once, then exact
    cosine keeps true pairs.  Everything is the deterministic
    integer-plane arithmetic of ``lsh_signature``, so the same pipeline
    is expressible in the DuckDB oracle and certified bitwise (suite
    ``dd_embedding_cosine``).

    GEOMETRY — pick ``n_planes`` (r) for BUCKET DENSITY first: each band
    has 2^r possible buckets, so expected bucket occupancy is n/2^r and
    the per-band join does ~n^2/2^r comparisons — r must grow with the
    corpus (r >= log2(n / wanted_bucket_size); the r=12, b=16 default
    suits ~10^5-10^7 vectors at dedup thresholds ~0.9, where per-plane
    agreement p = 1 - theta/pi ~ 0.86 gives recall 1-(1-p^r)^b ~ 0.93).
    Then buy recall with bands (b): each adds a full corpus pass.  Small
    fixtures / loose thresholds need the opposite corner (the suite uses
    r=4, b=8 for its 500-vector, t=0.4 oracle).  Identical vectors all
    share all buckets — run ``exact_dedup`` first so hot buckets hold
    near-dups, not exact copies.

    ``exact=True`` is the all-pairs O(n^2/2) verifier — correct at any
    threshold but a nested-loop join; use only for small n or recall
    audits.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    if exact:
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("cos", cosine(F.col("_va"), F.col("_vb")))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos")
        )
    sigs = F.array(
        *[
            lsh_signature(F.col("_v"), n_planes, plane_offset=band * n_planes)
            for band in range(n_bands)
        ]
    )
    banded = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).select("_id", "_v", F.posexplode(sigs).alias("_band", "_bkt"))
    left = banded.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "_band", "_bkt"
    )
    right = banded.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "_band", "_bkt"
    )
    cands = (
        left.join(right, ["_band", "_bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        # a pair colliding in several bands must verify once, not b times
        .groupBy("id_a", "id_b")
        .agg(F.first("_va").alias("_va"), F.first("_vb").alias("_vb"))
    )
    return (
        cands.withColumn("cos", cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def ivf_train_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Train IVF centroids with spark.ml KMeans (the production path; the
    suite's oracle variant uses deterministic id-based centroids instead
    because k-means init is not cross-engine reproducible).

    ``sample_fraction``: train on a seeded sample of the corpus — at 100 TB
    k-means over every vector is wasted work (centroid quality is
    insensitive to sampling); ~1M vectors (fraction ≈ 1e-4..1e-3) is ample
    for any practical k.

    Returns a tiny (cid, centroid: array<double>) frame to pass to
    ``ivf_topk(centroids=...)``.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if sample_fraction is not None:
        corpus = corpus.sample(fraction=sample_fraction, seed=seed)
    train = corpus.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=k, seed=seed, featuresCol="features").fit(train)
    centers = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return corpus.sparkSession.createDataFrame(centers, "cid int, centroid array<double>")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: partition the corpus into Voronoi cells around the
    given centroids (``ivf_train_centroids`` k-means output, or the first
    ``n_cells`` corpus vectors by id as the deterministic default), then
    search only the query's ``n_probe`` nearest cells with exact cosine.

    At 100 TB: the cell assignment is one broadcast join + rank (the
    centroid set is tiny), the inverted index is the corpus repartitioned
    by cell, and each query touches n_probe/n_cells of the data.
    """
    if centroids is not None:
        cents = centroids.select(
            F.col("cid").alias("_cid"), F.col("centroid").alias("_cv")
        )
    else:
        cents = corpus.filter(F.col(id_col) < n_cells).select(
            F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv")
        )

    def assign(side: DataFrame, idc: str, vecc: str, keep: int) -> DataFrame:
        scored = side.crossJoin(broadcast(cents)).withColumn(
            "_ccos", cosine(F.col(vecc), F.col("_cv"))
        )
        w = Window.partitionBy(idc).orderBy(F.col("_ccos").desc(), F.col("_cid").asc())
        return (
            scored.withColumn("_crk", F.row_number().over(w))
            .filter(F.col("_crk") <= keep)
            .select(idc, vecc, "_cid")
        )

    c_cells = assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvv")),
        "neighbor_id",
        "_cvv",
        1,
    )
    q_cells = assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")),
        "query_id",
        "_qv",
        n_probe,
    )
    cand = q_cells.join(c_cells, "_cid").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.withColumn("cos", cosine(F.col("_qv"), F.col("_cvv")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos")
    )


def hyperplane_weight(plane: Column | int, dim: Column) -> Column:
    """Deterministic pseudo-random hyperplane weights from pure integer
    arithmetic (no RNG, no libm => bit-identical in any engine):
    w = ((plane*1009 + dim + 1) * 2654435761) mod 2^31 - 2^30."""
    p = F.lit(plane) if isinstance(plane, int) else plane
    return (
        F.pmod((p * 1009 + dim + 1) * F.lit(2654435761), F.lit(1 << 31)) - F.lit(1 << 30)
    ).cast("double")


def lsh_signature(vec: Column, n_planes: int = 16, plane_offset: int = 0) -> Column:
    """Sign bits of <plane_i, x> packed into a bigint bucket key.

    Plane indices are Python ints (shift amounts must be literals), so
    this generates ``n_planes`` fold expressions — one projection.
    ``plane_offset`` selects a disjoint plane family per LSH band (band b
    uses planes [b*r, b*r + r))."""
    from functools import reduce as _reduce

    def plane_dot(p: int) -> Column:
        return F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda d: hyperplane_weight(p, d) * F.element_at(vec, d + 1).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    bits = [
        F.when(plane_dot(p + plane_offset) > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )
        for p in range(n_planes)
    ]
    return _reduce(lambda x, y: x.bitwiseOR(y), bits)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 16,
) -> DataFrame:
    """Bucketed ANN: exact cosine ranking restricted to the query's LSH
    bucket.  Recall < 1 by construction (candidates sharing all sign
    bits); multiply probe-buckets or lower n_planes to trade recall for
    cost.  Bucketing the corpus is one projection; the join hits only
    matching buckets.

    Bucket-density rule (same as ``cosine_near_pairs``): 2^n_planes
    buckets total, so each query scans ~n/2^r corpus vectors — grow r
    with the corpus (the r=16 default ~ 65k buckets suits 10^6-10^8
    vectors; the 500-vector suite fixture passes r=8 explicitly)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
    ).withColumn("_bkt", lsh_signature(F.col("_cv"), n_planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("_bkt", lsh_signature(F.col("_qv"), n_planes))
    scored = (
        c.join(broadcast(q), "_bkt")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def knn_join_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    margin: int = 8,
) -> DataFrame:
    """Exact cosine top-k at GEMM speed: blocked matrix-multiply candidate
    pruning + exact left-fold re-score.

    Same contract and bitwise-identical output as ``cosine_topk`` (which
    evaluates one array expression per (corpus row, query) pair); this is
    the shape that survives 100 TB:

    - **Stage 1 — vectorized heavy lift.** The L2-normalized query matrix
      (Q x d float64) is broadcast once; ``mapInPandas`` folds each corpus
      partition into (B x d) @ (d x Q) numpy GEMMs and keeps a running
      per-partition top-``k + margin`` corpus-id buffer per query
      (argpartition, no full sort).  The shuffleless scan emits only
      O(partitions * Q * (k+margin)) (query_id, neighbor_id) pairs — ids,
      not scores, and never the corpus.
    - **Stage 2 — exact re-score of the tiny candidate set.** Candidates
      broadcast-join back to corpus vectors (corpus side stays a plain
      scan, no shuffle) and to the query vectors, then rank with the same
      deterministic left-fold ``cosine`` as the brute-force path — so
      final (rank, cos) match ``cosine_topk`` / the DuckDB oracle
      bitwise.  GEMM float error is irrelevant to correctness unless it
      demotes a true top-k member below rank ``k + margin`` *within its
      own partition* — which needs ``margin`` corpus vectors packed
      within ~1e-15 cosine of each other (why the default margin).

    The query side is collected to the driver and broadcast — the
    documented ANN-workload bound (|queries| << |corpus|), identical to
    the broadcast in ``cosine_topk``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        empty = [
            ("query_id", "bigint"),
            ("neighbor_id", "bigint"),
            ("rank", "int"),
            ("cos", "double"),
        ]
        return corpus.sparkSession.createDataFrame(
            [], schema=", ".join(f"{n} {t}" for n, t in empty)
        )
    q_ids = np.asarray([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    q_norms = np.linalg.norm(q_mat, axis=1)
    q_norms[q_norms == 0.0] = 1.0
    q_mat = q_mat / q_norms[:, None]
    b = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat))
    cap = k + margin

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("neighbor_id", T.LongType(), False),
        ]
    )

    def candidates(batches):
        qids, qm = b.value
        n_q = len(qids)
        run_s = np.empty((0, n_q), dtype=np.float64)
        run_i = np.empty((0, n_q), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            norms = np.linalg.norm(c, axis=1)
            norms[norms == 0.0] = 1.0
            scores = (c / norms[:, None]) @ qm.T  # (B, Q)
            all_s = np.vstack([run_s, scores])
            all_i = np.vstack([run_i, np.broadcast_to(ids[:, None], scores.shape)])
            if len(all_s) > cap:
                sel = np.argpartition(-all_s, cap - 1, axis=0)[:cap]
                run_s = np.take_along_axis(all_s, sel, axis=0)
                run_i = np.take_along_axis(all_i, sel, axis=0)
            else:
                run_s, run_i = all_s, all_i
        if len(run_i):
            yield pd.DataFrame(
                {
                    "query_id": np.tile(qids, len(run_i)),
                    "neighbor_id": run_i.ravel(),
                }
            )

    cand = corpus.select(id_col, vec_col).mapInPandas(candidates, schema=schema)
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    scored = (
        cv.join(broadcast(cand), "neighbor_id")
        .join(broadcast(qv), "query_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def l2_normalize(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "unit_vec"
) -> DataFrame:
    """Unit-normalize an embedding column (cosine becomes plain dot).

    JVM-side array expressions (left-fold norm, elementwise divide) —
    deterministic, shuffle-free, bitwise-reproducible.  Zero vectors
    yield NaN components (documented; filter upstream if present).
    """
    n = norm(F.col(vec_col))
    return df.withColumn(
        out_col, F.transform(F.col(vec_col), lambda x: x.cast("double") / n)
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q_vec"
) -> DataFrame:
    """Symmetric int8 vector quantization for embedding storage: per
    vector, scale = 127 / max(|x|); q_i = floor(x_i * scale + 0.5).

    4x storage reduction for ANN candidate stores; the scale factor is
    emitted (``q_scale``) for dequantization.  Exact-rounded double ops
    only (max, divide, floor) — bitwise identical across engines.
    """
    mx = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    scale = F.lit(127.0).cast("double") / mx
    return df.withColumn("q_scale", scale).withColumn(
        out_col,
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.col("q_scale") + F.lit(0.5)).cast("int"),
        ),
    )
