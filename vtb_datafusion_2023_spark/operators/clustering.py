"""Fixed-iteration Lloyd k-means over embedding columns.

The LLM-corpus curation use (semantic clustering: topic balancing,
cluster-level dedup/sampling, SemDeDup-style pruning) runs k-means over
document embeddings at corpus scale.  Spark-first shape — the same one
``spark.ml.clustering.KMeans`` uses internally, restated over DataFrames:

- assignment = corpus x broadcast(centroids) nearest-centroid argmin
  (the centroid table is k rows — never shuffled, never collected to a
  Python loop over vectors);
- update = one hash aggregation per iteration, map-side partial,
  keyed by cid (k groups);
- the k x dim centroid table is pinned per iteration
  (``localCheckpoint``) so iteration i+1's plan starts from a k-row
  leaf instead of replaying every prior iteration's scan.

Per-iteration cluster cost is exactly one corpus scan + one k-group
aggregation; nothing driver-side scales with the corpus.

Determinism (the engine's cross-engine reproducibility contract):
- distances sum the per-dim squares left-to-right: the oracle spells
  this as the unrolled ``l2sq_sql`` chain, Spark as a ``zip_with`` +
  ``aggregate`` fold — the same IEEE op sequence (see ``kmeans``);
- argmin ties break to the smallest cid via ``row_number`` ordered by
  ``(dist, cid)``;
- centroid means use ``sqlgen.favg`` (fixed-point int64 fsum / count):
  partitioning-independent, bitwise reproducible at any cluster layout
  (1e-6 quantization — documented aggregation mode, see sqlgen.fsum);
- empty clusters keep their previous centroid (coalesce), so k never
  silently shrinks.

The suite oracles (suite/ml.py ``ml_kmeans`` / ``dd_semdedup`` /
``dp_cluster_sample``) replay the unrolled recursion in DuckDB bitwise,
same as ``gr_pagerank``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import sqlgen


def l2sq_sql(a_elem, b_elem, dim: int) -> str:
    """Shared squared-L2 grammar: ``a_elem``/``b_elem`` format a 1-based
    element reference for their engine (Spark ``element_at(v, j)``,
    DuckDB ``v[j]``); the chain text is otherwise identical, so equal
    operand bits give equal result bits."""
    terms = []
    for j in range(1, dim + 1):
        d = f"({a_elem(j)} - {b_elem(j)})"
        terms.append(f"{d} * {d}")
    return "(" + " + ".join(terms) + ")"


def kmeans(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 2,
    assign_strategy: str = "fold",
) -> DataFrame:
    """Lloyd k-means with deterministic init: centroids 0..k-1 are the
    vectors with the k smallest ids (cheap, reproducible, and at corpus
    scale exactly as arbitrary as a seeded sample — k-means++ quality
    matters for few-iteration convergence speed, not for the fixed-
    iteration semantics pinned here).  Returns the assignment after
    ``iterations`` centroid updates: ``(id_col, cid int)``.

    ``assign_strategy`` picks the nearest-centroid engine:

    - ``"fold"`` (default, oracle-certified): corpus × broadcast
      centroids with the interpreted zip_with/aggregate distance — the
      exact IEEE op sequence the DuckDB oracle unrolls, bitwise.  HOF
      folds are interpreted, so per-assignment cost is ~|corpus|·k·dim
      interpreted ops — fine at the certified k=8, the bottleneck once
      k grows with the corpus (SemDeDup's regime: measured 18.5 min at
      200k × k=256, sf10).
    - ``"gemm"`` (scale path): Arrow-batched numpy
      ``||x||² - 2·X@Cᵀ + ||c||²`` argmin in mapInPandas (SCALE.md rule
      8: large fan-outs leave the interpreted path).  BLAS reassociates
      the sums, so near-tie assignments can differ from the fold path
      at ulp level — row-independent and partitioning-invariant, but
      NOT oracle-replayable; exact duplicates still tie-break to the
      smallest cid (np.argmin keeps the first minimum).  Measured at
      200k × k=256 (sf10): the 3 assignment passes drop from the
      dominant term to seconds.
    """
    if assign_strategy not in ("fold", "gemm"):
        raise ValueError(f"assign_strategy must be fold|gemm, got {assign_strategy!r}")
    # Every DuckDB oracle unrolls exactly ``dim`` distance terms, so a
    # ragged/NULL vector must fail LOUDLY here rather than silently
    # diverge cross-engine (a NULL distance would even order differently:
    # Spark row_number puts NULLS FIRST ascending, DuckDB NULLS LAST).
    guarded = (
        f"case when size({vec_col}) = {dim} then {vec_col} "
        f"else raise_error(concat('kmeans: expected dim {dim}, got vector of "
        f"size ', cast(size({vec_col}) as string), ' at {id_col}=', "
        f"cast({id_col} as string))) end"
    )
    emb = df.select(
        F.col(id_col),
        F.expr(f"transform({guarded}, x -> cast(x as double))").alias("_v"),
    )
    init = emb.orderBy(id_col).limit(k)
    cents = init.select(
        (F.row_number().over(Window.orderBy(id_col)) - 1).cast("int").alias("cid"),
        F.col("_v").alias("_c"),
    )
    # Spark computes the distance as a zip_with + aggregate fold rather
    # than the unrolled ``l2sq_sql`` chain the oracle uses: the fold is
    # BITWISE the same sum (it adds the terms in the same left-to-right
    # order, and its extra leading ``0.0 + t1`` is an IEEE identity —
    # every term is a square, so never -0.0) but its expression tree is
    # O(1) instead of O(dim), which cuts plan/codegen time ~3x at dim=64
    # (A/B: 10.5 -> 3.1 s cold at sf0.01, assignments identical).
    dist = (
        "aggregate(zip_with(_v, _c, (a, b) -> (a - b) * (a - b)), "
        "cast(0 as double), (acc, x) -> acc + x)"
    )

    def assign_fold(cents_df: DataFrame) -> DataFrame:
        scored = (
            emb.crossJoin(F.broadcast(cents_df))
            .withColumn("_d", F.expr(dist))
        )
        w = Window.partitionBy(id_col).orderBy("_d", "cid")
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col, "_v", "cid")
        )

    def assign_gemm(cents_df: DataFrame) -> DataFrame:
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        rows = cents_df.orderBy("cid").collect()  # k × dim: driver-tiny
        C = np.array([list(r["_c"]) for r in rows], dtype=np.float64)
        cn = (C * C).sum(axis=1)
        b = df.sparkSession.sparkContext.broadcast((C, cn))
        id_field = next(f for f in emb.schema.fields if f.name == id_col)
        schema = T.StructType(
            [
                id_field,
                T.StructField("_v", T.ArrayType(T.DoubleType()), True),
                T.StructField("cid", T.IntegerType(), False),
            ]
        )

        def run(batches):
            Cv, cnv = b.value
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
                d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ Cv.T) + cnv[None, :]
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "_v": pdf["_v"],
                        # first minimum = smallest cid on exact ties
                        "cid": d2.argmin(axis=1).astype("int32"),
                    }
                )

        return emb.mapInPandas(run, schema=schema)

    assign = assign_fold if assign_strategy == "fold" else assign_gemm

    for _ in range(iterations):
        assigned = assign(cents)
        # LONG-FORM update: posexplode to (cid, dim, val) and run ONE
        # generic fsum/count aggregate over (cid, dim) instead of a
        # dim-wide aggregate of dim favg expressions — the wide form's
        # O(dim) expression tree cost ~8 s of codegen per iteration at
        # dim=64 (fresh-session cold 20.8 -> 11.1 s, warm 3.6 -> 2.6 s;
        # oracle unchanged).  fsum is order-insensitive, so the per-
        # (cid, dim) sums are bitwise the wide form's; array_sort over
        # (dim, mean) structs rebuilds the centroid in dim order
        # deterministically (collect_list order is not deterministic,
        # the sort key is).
        longf = assigned.select("cid", F.posexplode("_v").alias("_j", "_x"))
        sums = longf.groupBy("cid", "_j").agg(F.expr(sqlgen.favg("_x", "_m")))
        upd = sums.groupBy("cid").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(_j, _m))), s -> s._m)"
            ).alias("_cn")
        )
        cents = (
            cents.join(upd, on="cid", how="left")
            .select("cid", F.coalesce(F.col("_cn"), F.col("_c")).alias("_c"))
            # k x dim rows: pin so the next iteration's plan starts here
            # instead of replaying every prior scan (pagerank's
            # checkpoint_every rationale, mandatory here because the
            # centroid recursion nests a window + crossJoin per step)
            .localCheckpoint(eager=True)
        )
    return assign(cents).select(id_col, "cid")


def derived_fanout(
    max_cluster: int, pair_budget: int = 250_000, cap: int = 64
) -> int:
    """Salt fanout for the semdedup pair join, DERIVED from the measured
    hottest-cluster size instead of guessed (SCALE.md skew runbook,
    VERDICT r5 item 5): the hottest cluster contributes ~``max_cluster²``
    interpreted cosine folds, the salt spreads them ``fanout`` ways, so
    ``fanout = ceil(max_cluster² / pair_budget)`` keeps every task at or
    under ``pair_budget`` pair evaluations.  Capped: past ``cap`` the
    per-task work is already small enough that the ``fanout``-way
    replication of the right side (shuffle bytes scale linearly with
    fanout) costs more than the residual skew."""
    if max_cluster <= 0:
        return 1
    if pair_budget <= 0:
        raise ValueError(f"pair_budget must be positive, got {pair_budget}")
    f = -(-(max_cluster * max_cluster) // pair_budget)  # ceil div
    return max(1, min(int(f), cap))


def derived_k(n: int, target_cluster: int = 800, floor: int = 8) -> int:
    """SemDeDup's scaling knob, derived instead of guessed: k grows with
    the corpus so the EXPECTED cluster size stays bounded at
    ``target_cluster`` (Abbas et al. 2023 §3 — the within-cluster
    quadratic term is O(sum |c|²); bounded E|c| keeps it linear in n).
    ``floor`` keeps small corpora on the oracle-certified k=8 geometry,
    so at the driver's gate scale (≤2k vectors) the derived-k scale head
    and the fixed-k oracle head compute the IDENTICAL kept set."""
    if n <= 0:
        return floor
    if target_cluster <= 0:
        raise ValueError(f"target_cluster must be positive, got {target_cluster}")
    return max(int(floor), -(-int(n) // int(target_cluster)))


def semdedup(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 2,
    threshold: float = 0.4,
    fanout: int | None = None,
    pair_budget: int = 250_000,
    assign_strategy: str = "fold",
    pair_strategy: str = "fold",
    max_gemm_cluster: int = 20_000,
    gemm_block: int = 1024,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup at
    corpus scale by k-means sharding — pairwise cosine is computed only
    WITHIN a cluster, never across the corpus, so the quadratic term is
    bounded by cluster size (the paper's core scaling argument; k grows
    with the corpus to keep clusters bounded).  A document is dropped
    when a lower-id document in its cluster has cosine >= ``threshold``
    (the paper keeps a random/centroid-farthest exemplar; the smallest
    id is this engine's deterministic canonical choice, same rule as the
    minhash/simhash families).  Returns kept ``(id_col, cid)``.

    Plan shape: the k-means assignment (pinned once) feeds a cid-keyed
    SALTED self-join, then a broadcast-able distinct-drop anti-join.
    Two measured facts shape the pair stage:

    - Each vector's norm is computed ONCE before the pair join (a
      per-row column, |corpus| evaluations) instead of per pair: the
      value is the identical fold over the identical vector, so the
      pair predicate ``dot/(na*nb) >= t`` stays bitwise equal to
      ``cosine(a,b) >= t`` at a third of the per-pair array work
      (array HOFs are interpreted, not codegen'd).
    - The pair work is O(sum |c|^2) of interpreted folds downstream of
      a BYTE-TINY shuffle (k keys), which AQE's size-based coalescing
      happily merges onto one core — it cannot see compute fan-out.
      Salting the join ``(cid, pmod(hash(id_a), fanout))`` with the right
      side replicated ``fanout`` ways, through an EXPLICIT ``repartition``
      (user repartitions are exempt from AQE coalescing), spreads every
      cluster's pair evaluation ``fanout`` ways.  Together: 9.3 -> ~4.5 s
      at sf0.1.  This is also the hot-cluster mitigation promised in
      SCALE.md — a cluster larger than a partition budget splits across
      ``fanout`` tasks instead of pinning one.

    ``fanout=None`` (default) DERIVES the salt width instead of guessing
    a constant (VERDICT r5 item 5): the max of a SKEW term — one k-row
    count over the already-pinned assignment feeding
    :func:`derived_fanout` (= ceil(max_cluster² / pair_budget), capped),
    so a pathological hot cluster widens the salt until no task holds
    more than ``pair_budget`` pair folds — and a PARALLELISM floor,
    ceil(2·defaultParallelism / k), because the join's task count is
    k·fanout and a uniform sharding with small k would otherwise idle
    most of the cluster (measured at sf0.1: k=8, 32 cores — fanout 1
    runs the pair stage on 8 tasks, fanout 8 on 64; 5.06 -> 4.51 s).
    The salt never changes the pair SET, only its task layout, so
    results are fanout-invariant.

    ``pair_strategy`` picks the within-cluster cosine engine:

    - ``"fold"`` (default, oracle-certified): the salted self-join with
      the interpreted dot/norm predicate — bitwise the oracle's cosine.
    - ``"grouped_gemm"`` (scale path, pairs with
      ``assign_strategy="gemm"``): one applyInPandas per cluster ships
      the cluster's VECTORS (not pairs) through Arrow and finds dropped
      ids from the normalized Gram matrix — BLAS instead of ~sum|c|²
      interpreted folds, and no pair row ever materializes.  The Gram
      is TILED in ``gemm_block``-column strips (VERDICT r6 item 2): the
      m×m matrix never materializes, peak per-task memory is
      ``m·(dim + 2·gemm_block)·8`` bytes — at the default bound
      (m=20_000, dim=64, block=1024) ≈ 340 MB vs the pre-r7 untiled
      ≈ 3.2 GB Gram + same-order ``triu_indices`` scratch.  The strip
      reduction is the vectorized ``(strip >= t) -> triu -> any(axis=0)``
      (micro-benched on a 4_000-row dim-64 cluster: 1.35 s for the old
      full-Gram ``triu_indices`` + ``np.logical_or.at`` unbuffered-ufunc
      reduction vs 0.11 s tiled-vectorized, identical drop set — and the
      old path's gap widens quadratically with m on both memory and the
      scalar-loop reduction).  ``max_gemm_cluster`` therefore
      now bounds single-task COMPUTE (the m²/2·dim FLOPs of one
      cluster's strips run inside one task), not memory; past the bound
      the call raises with the paper's own remedy: raise k.  Measured
      at sf10 (200k vectors, k=256, with gemm assignment): see SCALE.md.
    """
    from .similarity import dot, norm

    if pair_strategy not in ("fold", "grouped_gemm"):
        raise ValueError(f"pair_strategy must be fold|grouped_gemm, got {pair_strategy!r}")
    assigned = kmeans(
        df, dim=dim, vec_col=vec_col, id_col=id_col, k=k, iterations=iterations,
        assign_strategy=assign_strategy,
    ).localCheckpoint(eager=True)
    if pair_strategy == "grouped_gemm":
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        jv = assigned.join(
            df.select(F.col(id_col), F.col(vec_col).alias("_v")), on=id_col
        )
        id_field = next(f for f in jv.schema.fields if f.name == id_col)
        out_schema = T.StructType([id_field])
        t, bound = float(threshold), int(max_gemm_cluster)
        blk = max(1, int(gemm_block))

        def drop_in_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
            m = len(pdf)
            if m > bound:
                raise ValueError(
                    f"semdedup grouped_gemm: cluster of {m} rows exceeds "
                    f"max_gemm_cluster={bound}; raise k so clusters stay "
                    "bounded (the SemDeDup scaling knob) or use "
                    "pair_strategy='fold'"
                )
            if m < 2:
                return pdf.iloc[0:0][[id_field.name]]
            order = pdf[id_field.name].to_numpy().argsort(kind="stable")
            ids = pdf[id_field.name].to_numpy()[order]
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )[order]
            n = np.sqrt((X * X).sum(axis=1))
            n[n == 0.0] = 1.0  # zero vectors: cosine 0 to everything
            Xn = X / n[:, None]
            # drop j if any i<j has cos >= t — identical semantics to the
            # fold path's (ida < idb) pair predicate (a dropped i still
            # drops its own later duplicates).  Tiled: per column strip
            # [j0, j1) compute only rows i < j1 of the Gram (half the
            # untiled FLOPs), reduce with the vectorized strict-upper
            # mask; O(m·blk) strip memory, never m×m.
            hit = np.zeros(m, dtype=bool)
            for j0 in range(0, m, blk):
                j1 = min(j0 + blk, m)
                strip = Xn[:j1] @ Xn[j0:j1].T >= t  # (j1, j1-j0) bools
                # rows < j0 are all strictly above the strip's columns;
                # the trailing local square needs its strict upper part
                hit[j0:j1] = strip[:j0].any(axis=0) | np.triu(
                    strip[j0:j1], 1
                ).any(axis=0)
            return pd.DataFrame({id_field.name: ids[hit]})

        dropped_g = jv.groupBy("cid").applyInPandas(drop_in_cluster, schema=out_schema)
        return assigned.join(dropped_g, on=id_col, how="left_anti")
    if fanout is None:
        max_cluster = (
            assigned.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.max("_n").alias("_m"))
            .first()["_m"]
        )
        par = df.sparkSession.sparkContext.defaultParallelism
        floor = -(-2 * par // max(k, 1))
        fanout = max(derived_fanout(int(max_cluster or 0), pair_budget), min(floor, 64))
    j = assigned.join(
        df.select(F.col(id_col), F.col(vec_col).alias("_v")), on=id_col
    ).withColumn("_n", norm(F.col("_v")))
    left = j.select(
        F.col(id_col).alias("_ida"), "cid",
        F.col("_v").alias("_va"), F.col("_n").alias("_na"),
    ).withColumn("_s", F.pmod(F.xxhash64("_ida"), F.lit(fanout)))
    right = j.select(
        F.col(id_col).alias("_idb"), "cid",
        F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
    ).withColumn("_s", F.explode(F.array(*[F.lit(i) for i in range(fanout)])))
    n_part = max(fanout * 8, 32)
    dropped = (
        left.repartition(n_part, "cid", "_s")
        .join(right.repartition(n_part, "cid", "_s"), on=["cid", "_s"])
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(
            dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
            >= threshold
        )
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return assigned.join(dropped, on=id_col, how="left_anti")


def cluster_sample(
    df: DataFrame,
    dim: int,
    per_cluster: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 2,
    salt: str = "cs:",
    assign_strategy: str = "fold",
) -> DataFrame:
    """Cluster-balanced corpus sampling: keep ``per_cluster`` documents
    from each semantic (k-means) cluster — the topic-balancing step of a
    curation pipeline (over-represented topics are downsampled to the
    cap, rare topics survive whole).

    The draw is a deterministic pseudo-random order: ``md5(salt || id)``
    hex compared lexicographically (the engine's cross-engine hash
    family — same digests, same ASCII collation in Spark and DuckDB),
    tie-broken by id.  One window over the assignment — the same
    single-shuffle group-limit shape as ``dp_cap_per_source``, and
    Catalyst plans rank<=N windows as a partial group-limit before the
    exchange, so no cluster's full membership ever converges on one
    task.  Returns ``(id_col, cid)`` of the kept sample."""
    assigned = kmeans(
        df, dim=dim, vec_col=vec_col, id_col=id_col, k=k, iterations=iterations,
        assign_strategy=assign_strategy,
    )
    h = F.expr(f"md5({salt!r} || ({id_col} || ''))")
    w = Window.partitionBy("cid").orderBy(h.asc(), F.col(id_col).asc())
    return (
        assigned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_cluster)
        .select(id_col, "cid")
    )
