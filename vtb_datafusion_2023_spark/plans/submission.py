"""The end-to-end scoring pipeline — the Spark-native equivalent of
``python run.py <source_csv> <output_csv>`` (/root/reference/run.py,
SURVEY §3.1).

Stages (all from the operator library):

1. RNN branch (A): bootstrap ensemble over the raw log — SO3 seeded
   samples x scorer x A15 mean (model.py:247-294).
2. Robust cleaning: winsorize + rare-category rewrite (run.py:25-85).
3. Branch C: wide per-user feature matrix + dropped-user tracking
   (run.py:185-430).
4. Assembly J2 + strict dropna M1 (run.py:435-465).
5. Scoring U6: broadcast-artifact mapInPandas (run.py:466-475).
6. Submission: union-fill dropped users at the global max A14/J4, sort
   W6, CSV S3 (run.py:477-486).

Branch A scores through the REAL reference weights when the artifacts
are present: ``nn_weights.ckpt`` loads via the restricted numpy
unpickler (``inference.torch_ckpt``) and runs the eval-mode BiGRU
forward (``inference.nn_numpy``) inside mapInPandas — torch is not
needed.  The final U6 stage likewise runs the REAL CatBoost model when
given ``model=catboost_cbm_model()`` — the ``.cbm`` parses through the
public flatbuffers format (``inference.cbm``) and scores conform-by-name;
the default stays a deterministic linear stand-in because the driver's
synthetic feature vocabulary shares only ``nn_predict`` with the
reference's trained feature names.

The three branches are independent DAG subtrees off one scan: Spark runs
them as parallel jobs feeding the assembly joins (vs the reference's
sequential single-threaded loops — SURVEY §4).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import sqlgen
from ..inference.udfs import BroadcastModel, linear_scorer, score_with_model
from ..operators.cleaning import clean_transactions
from ..operators.joins import (
    anti_join_missing,
    assemble_features,
    bootstrap_runs,
    ensemble_mean,
    union_fill_max,
)
from .features import branch_c_features


REFERENCE_BINS = "/root/reference/nn_bins.pickle"

# --- deterministic certification stand-ins (driver t2 gate) -------------
#
# The production pipeline has two non-SQL-expressible stages: the seeded
# bootstrap draw (numpy RNG) and the NN/CatBoost forward.  For the
# driver's hash gate the SAME composed plan runs with (a) an md5-seeded
# subsample in place of the RNG draw and (b) an in-plan linear scorer in
# place of the model UDF — every replacement is a textual SQL fragment
# DuckDB evaluates bit-identically, so the full relational spine
# (cleaning, branch C, assembly, imputation) is certified end to end.

def md5_keep_sql(ord_col: str, rep: int, threshold_hex: str = "f2") -> str:
    """Deterministic per-rep row keep predicate: the first md5 byte of
    ``ord:rep`` at or below ``threshold_hex`` (default 0xf2 -> 243/256
    ~ 0.949, matching the reference's fraction=0.95 draw).  Lowercase-hex
    string compare — identical in Spark and DuckDB."""
    return f"substring(md5(concat({ord_col}, ':', {rep})), 1, 2) <= '{threshold_hex}'"


def standin_weights(cols: Sequence[str]) -> dict[str, float]:
    """Name-keyed linear stand-in weights: k/1024 with k in [-9, 9] from a
    deterministic name hash.  Exactly representable in binary AND as a
    short decimal, so the SQL literal ``cast(k as double)/cast(1024 as
    double)`` reproduces the Python float bit-for-bit in any engine.
    Keyed by NAME (not position) so the Spark plan and the generated
    oracle cannot disagree on weight assignment."""
    return {c: (((sum(ord(ch) for ch in c) * 37) % 19) - 9) / 1024.0 for c in cols}


def standin_target_column(feature_cols: Sequence[str]):
    """In-plan deterministic linear score: left-associated weighted sum
    over the NAME-SORTED feature columns — IEEE-op-for-op identical to
    ``standin_target_sql`` on the oracle side."""
    ws = standin_weights(feature_cols)
    terms = [F.lit(ws[c]) * F.col(f"`{c}`").cast("double") for c in sorted(feature_cols)]
    return reduce(lambda a, b: a + b, terms)


def standin_target_sql(feature_cols: Sequence[str], quote: str = '"') -> str:
    """Oracle-side textual twin of ``standin_target_column``."""
    ws = standin_weights(feature_cols)
    q = quote
    terms = [
        f"cast({round(ws[c] * 1024):d} as double) / cast(1024 as double)"
        f" * cast({q}{c}{q} as double)"
        for c in sorted(feature_cols)
    ]
    return " + ".join(terms)


def _real_rnn_artifacts() -> tuple | None:
    """(bin_edges, BroadcastModel) from the reference artifacts, or None
    when they are absent (the engine then falls back to the linear
    stand-in so the pipeline stays runnable anywhere)."""
    import os

    from ..inference.udfs import REFERENCE_RNN_CKPT, rnn_scorer_model
    from ..sources.artifacts import load_bin_edges

    if not (os.path.exists(REFERENCE_BINS) and os.path.exists(REFERENCE_RNN_CKPT)):
        return None
    return load_bin_edges(REFERENCE_BINS), rnn_scorer_model()


def _rnn_branch_md5(tx: DataFrame, n_reps: int) -> DataFrame:
    """Deterministic certification twin of branch A: md5-seeded ~95%
    subsamples (one per rep) -> per-user aggregate features -> exact-
    binary-weight linear score -> decimal-exact ensemble mean.  Every
    float op is a shared ``sqlgen`` fragment or an exact-operand IEEE
    expression, so the DuckDB oracle reproduces ``nn_predict`` bitwise.

    Plan shape: ONE scan + ONE hash aggregate.  Each rep's features are
    conditional aggregates gated by its md5 keep-predicate, and the
    ensemble mean folds the per-rep scores in-row through the same
    exact-decimal arithmetic the oracle's union+group form uses —
    decimal sums are associative, so regrouping N scans into one is
    bitwise-free (measured 3.96 s -> ~0.9 s at sf0.1 for 5 reps).  A
    user absent from rep i (no sampled rows) contributes a NULL score
    there, exactly like its missing row in the union form."""
    # one md5 per (row, rep), projected to a boolean BEFORE the
    # aggregate: the three conditional aggs per rep then share the flag
    # instead of each re-deriving the hash (A/B: 1.30 -> 1.10 s warm at
    # sf0.1; flag values identical, so the aggregates are bitwise-free)
    pre = tx.select(
        "user_id",
        "amt",
        "cat",
        *[F.expr(md5_keep_sql("ord", i)).alias(f"_k{i}") for i in range(n_reps)],
    )
    aggs = []
    for i in range(n_reps):
        aggs.append(F.expr(f"cast(count(case when _k{i} then 1 end) as double) as f0_{i}"))
        aggs.append(F.expr(f"{sqlgen.davg(f'case when _k{i} then amt end')} as f1_{i}"))
        aggs.append(F.expr(f"{sqlgen.davg(f'case when _k{i} then cat end')} as f2_{i}"))
    per_user = pre.groupBy("user_id").agg(*aggs)
    scores = [
        f"(f0_{i} / cast(128 as double) + f1_{i} / cast(512 as double)"
        f" + f2_{i} / cast(1024 as double))"
        for i in range(n_reps)
    ]
    dec_sum = " + ".join(
        f"coalesce(cast({s} as {sqlgen.DEC}), cast(0 as {sqlgen.DEC}))" for s in scores
    )
    cnt = " + ".join(f"(case when {s} is not null then 1 else 0 end)" for s in scores)
    mean = f"({sqlgen.dec_to_double(f'({dec_sum})')} / nullif({cnt}, 0))"
    return per_user.select(
        "user_id", F.expr(f"{mean} as nn_predict")
    ).filter(F.col("nn_predict").isNotNull())


def _rnn_branch(
    tx: DataFrame,
    n_reps: int,
    seed: int,
    weights: Sequence[float],
    use_real_rnn: bool = True,
) -> DataFrame:
    """Branch A: ``reliable_predict`` (model.py:247-294) — seeded
    bootstrap x RNN scorer x mean.

    With the reference artifacts present (the default), each repetition
    scores through the REAL weights: nn_bins digitize -> last-300
    zero-padded sequences -> broadcast ``nn_weights.ckpt`` -> numpy BiGRU
    forward (eval mode; the reference's per-pass dropout noise is what
    its 50-rep average suppresses — our reps differ by bootstrap draw).
    Without them, a per-user aggregate + broadcast linear model exercises
    the identical plumbing."""
    real = _real_rnn_artifacts() if use_real_rnn else None
    runs = []
    for i, rep in enumerate(bootstrap_runs(tx, n_reps, fraction=0.95, seed=seed)):
        if real is not None:
            from ..inference.udfs import score_rnn_sequences
            from .sequences import reference_feature_frame, rnn_input_sequences

            bins, model = real
            seqs = rnn_input_sequences(reference_feature_frame(rep), bins, seq_len=300)
            scored = score_rnn_sequences(
                seqs, model, id_col="user_id", seq_col="seq"
            ).withColumnRenamed("vec_id", "user_id")
        else:
            per_user = rep.groupBy("user_id").agg(
                F.count(F.lit(1)).cast("double").alias("f0"),
                F.avg("amt").alias("f1"),
                F.avg(F.col("cat").cast("double")).alias("f2"),
            )
            assembled = per_user.select(
                "user_id", F.array("f0", "f1", "f2").alias("features")
            )
            scored = score_with_model(
                assembled,
                linear_scorer(list(weights)),
                id_col="user_id",
                vec_col="features",
            ).withColumnRenamed("vec_id", "user_id")
        runs.append(scored.select("user_id", F.col("score").alias("target")))
    return ensemble_mean(runs, key="user_id", score_col="target").withColumnRenamed(
        "target_mean", "nn_predict"
    )


def run_submission(
    spark,
    tx: DataFrame,
    cat_vocab: Sequence,
    model: BroadcastModel | None = None,
    n_reps: int = 5,
    seed: int = 42,
    output_path: str | None = None,
    bucket_dir: str | None = None,
    use_real_rnn: bool = True,
    sampler: str = "bootstrap",
    scorer: str = "udf",
    blacklist_cats: Sequence = (6012,),
    pin_cleaned: bool = False,
) -> DataFrame:
    """Full pipeline: (user_id, cat, amt, ts, ord) -> (user_id, target).

    ``sampler``: "bootstrap" (production: seeded RNG draw with
    replacement) or "md5" (certification: deterministic md5-seeded
    subsample — same plan shape, oracle-replayable).
    ``scorer``: "udf" (production: broadcast-model mapInPandas) or
    "inplan" (certification/scale path for the linear stand-in: the
    weighted sum stays inside whole-stage codegen — no Python boundary).

    Returns the submission DataFrame sorted by user_id; optionally writes
    the CSV (S3).

    ``pin_cleaned``: block-manager localCheckpoint of the cleaned log
    before branch C.  Default OFF — the fused branch C leaves
    ``cleaned`` one consumer subtree, so the pin buys nothing (A/B in
    the comment below) while costing a job barrier and a corpus copy;
    the parameter keeps the tradeoff re-measurable in one warm JVM.

    ``bucket_dir``: materialize the cleaned transactions bucketed by
    ``user_id`` before branch C (ROADMAP #7).  The cleaned table is the
    reference's only named intermediate (run.py:84-90, re-read by two
    branches); bucketing it means every downstream per-user groupBy /
    window in branch C — and any later pipeline over the same artifact —
    reads pre-partitioned data with no user_id exchange.
    """
    # Branch A on the raw log (the reference scores the RNN before cleaning)
    if sampler == "md5":
        nn = _rnn_branch_md5(tx, n_reps=n_reps)
    else:
        nn = _rnn_branch(
            tx,
            n_reps=n_reps,
            seed=seed,
            weights=[0.01, 0.002, 0.001],
            use_real_rnn=use_real_rnn,
        )

    # Robust cleaning (A7-A9) then branch C features
    cleaned = clean_transactions(
        tx, user_col="user_id", cat_col="cat", value_col="amt", n_amt=10, n_mcc=10
    )
    if bucket_dir is not None:
        from ..sources.bucketed import bucketed_checkpoint

        cleaned = bucketed_checkpoint(
            cleaned,
            table="cleaned_tx_bucketed",
            path=f"{bucket_dir}/cleaned_tx",
            bucket_cols=["user_id"],
        )
    elif pin_cleaned:
        # The cleaned log is the reference's ONE named intermediate
        # (run.py:84-90, written to disk and re-read): with the 8-block
        # branch C this pin was the r5 headline (17.7 -> 5.5 s at
        # sf0.1: every block replayed the 6-exchange cleaning chain).
        # The FUSED branch C leaves ``cleaned`` exactly ONE consumer
        # subtree (the trim window; everything else sits above that
        # window's exchange and shares it via ReuseExchange), so the pin
        # buys nothing — same-JVM interleaved A/B: 6.57 vs 6.51 s at
        # sf0.1, 36.5 vs 35.1 s at sf10 — while costing a job barrier
        # and a block-manager copy of the corpus (prohibitive at 100 TB).
        # Default OFF; the flag keeps the tradeoff re-measurable, and
        # ``bucket_dir`` remains the durable cross-pipeline form.
        cleaned = cleaned.localCheckpoint(eager=True)
    # no kept-row materialization: the FUSED branch C has only three
    # consumers of the trimmed row set (wide aggregate, long aggregate,
    # dropped-users anti-join) and they all sit above the SAME trim-window
    # exchange, which ReuseExchange shares — replaying the post-shuffle
    # window beats a full block-manager barrier of the row set (measured:
    # 6.25 -> 5.90 s at sf0.1, 63.4 -> 38.3 s at sf10).  The 8-block
    # unfused form is where the checkpoint paid for itself.
    feats, dropped = branch_c_features(
        cleaned, cat_vocab=cat_vocab, blacklist_cats=blacklist_cats, materialize=False
    )

    # Assembly J2 + strict dropna M1 (run.py:435-465)
    assembled = assemble_features([nn, feats], key="user_id", how="outer", fill=None).na.drop()

    # U6 scoring over the wide row with a broadcast artifact.  A
    # ``kind='cbm'`` model (inference.udfs.catboost_cbm_model) scores
    # through the REAL reference GBDT, conforming columns by name (J5);
    # any other kind scores the positional feature vector.
    feature_cols = [c for c in assembled.columns if c != "user_id"]
    if scorer == "inplan" and model is None:
        preds = assembled.select(
            "user_id", standin_target_column(feature_cols).alias("target")
        )
    elif model is not None and model.kind == "cbm":
        from ..inference.udfs import score_catboost

        preds = (
            score_catboost(assembled, model, id_col="user_id")
            .withColumnRenamed("vec_id", "user_id")
            .select("user_id", F.col("score").alias("target"))
        )
    else:
        vecs = assembled.select(
            "user_id",
            F.array(*[F.col(f"`{c}`").cast("double") for c in feature_cols]).alias("features"),
        )
        if model is None:
            dim = len(feature_cols)
            model = linear_scorer([((j * 37) % 19 - 9) / (10.0 * dim) for j in range(dim)])
        preds = (
            score_with_model(vecs, model, id_col="user_id", vec_col="features")
            .withColumnRenamed("vec_id", "user_id")
            .select("user_id", F.col("score").alias("target"))
        )

    # J4/A14: users eliminated anywhere along the way come back at the
    # global max score; W6 sort.  ``preds`` has three consumers (the
    # submission rows, the global-max scalar, the anti-join probe) — pin
    # the ~1-row-per-user result once so the full feature DAG does not
    # replay per consumer (measured 3x the assembled cost unpinned).
    preds = preds.localCheckpoint(eager=True)
    all_users = tx.select("user_id").distinct()
    missing = anti_join_missing(all_users, preds, "user_id")
    submission = union_fill_max(preds, missing, key="user_id", score_col="target").orderBy(
        "user_id"
    )

    if output_path is not None:
        from ..sources.writers import write_csv

        write_csv(submission, output_path)
    return submission
