"""End-to-end real-weights inference over Spark (U1/U2, U4): the suite
queries score the driver tables through the actual reference checkpoints
(numpy forwards inside mapInPandas) — deterministic across runs and
across input partitionings."""

from __future__ import annotations

import os

import pytest

needs_ckpts = pytest.mark.skipif(
    not os.path.exists("/root/reference/nn_weights.ckpt"),
    reason="reference checkpoints not present",
)


@needs_ckpts
def test_u1_rnn_scores_end_to_end(spark, sf_small):
    from vtb_datafusion_2023_spark.suite import queries

    df = queries()["u1_rnn_scores"](spark, sf_small)
    rows = {r.user_id: r.score for r in df.collect()}
    n_users = len(rows)
    assert n_users > 0
    assert all(0.0 < s < 1.0 for s in rows.values())
    again = {r.user_id: r.score for r in df.collect()}
    assert again == rows


@needs_ckpts
def test_u4_vrae_latents_end_to_end_partitioning_invariant(spark, sf_small):
    from vtb_datafusion_2023_spark.inference.udfs import (
        encode_with_vrae,
        vrae_encoder_model,
    )
    from vtb_datafusion_2023_spark.plans.sequences import vrae_input_sequences
    from vtb_datafusion_2023_spark.sources.readers import load_table
    from vtb_datafusion_2023_spark.suite._util import SIGNED_AMT
    from vtb_datafusion_2023_spark.suite.inference import _VOCAB

    import pyspark.sql.functions as F

    tx = load_table(spark, sf_small, "events").select(
        "user_id",
        "ts",
        F.col("event_id").alias("ord"),
        F.expr(SIGNED_AMT).alias("amt"),
        F.col("event_type").alias("cat"),
    )
    seqs = vrae_input_sequences(tx, cat_vocab=_VOCAB)
    model = vrae_encoder_model()

    def latents(df):
        out = encode_with_vrae(df, model, id_col="user_id", seq_col="seq")
        return {r.user_id: tuple(r.latent) for r in out.collect()}

    one = latents(seqs.repartition(1))
    many = latents(seqs.repartition(7))
    assert one.keys() == many.keys() and len(one) > 0
    # rounded outputs are identical whatever the partitioning
    assert one == many
    assert all(len(v) == 40 for v in one.values())
