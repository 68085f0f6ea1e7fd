"""Suite: REAL model inference U1/U2 and U4 (SURVEY §2.9) — the
reference's torch checkpoints executed weight-for-weight in numpy.

``nn_weights.ckpt`` (BiGRU transaction classifier, model.py:27-90) and
``vrae_5896.pth`` (LSTM encoder latent means, vrae/vrae.py:11-84) load
through the restricted numpy unpickler (``inference.torch_ckpt``) and
score through eval-mode numpy forwards (``inference.nn_numpy``) inside
``mapInPandas`` — one broadcast of the state dict, Arrow-batched rows,
results invariant to partitioning.

The driver's events table stands in for the reference's transaction CSV
(FIXTURES.md §1): derived mcc/currency codes are deterministic functions
of event columns, digitized by the REAL ``nn_bins.pickle`` edges (S5).
LSTM/GRU recurrences are not expressible in ANSI SQL, so these register
rows-only (no oracle); exact-value parity is pytest-covered against the
reference math (tests/test_nn_numpy.py differential tests).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from ._util import SIGNED_AMT, T

_BINS_PATH = "/root/reference/nn_bins.pickle"
_VOCAB = ["click", "error", "purchase", "refund", "signup", "view"]


def _tx_like(spark, sf_dir):
    """events -> the reference transaction-log shape (model.py:208-219).

    mcc_code / currency_rk don't exist in events; derive them
    deterministically (xxhash64 into the mcc range, user-keyed currency
    pick) so the digitize step exercises the real bin edges.
    """
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "ts",
        F.col("event_id").alias("ord"),
        F.expr(SIGNED_AMT).alias("transaction_amt"),
        (F.pmod(F.xxhash64("event_type"), F.lit(8600)) + F.lit(742)).alias("mcc_code"),
        F.element_at(
            F.array(F.lit(48), F.lit(50), F.lit(60)),
            (F.pmod(F.col("user_id"), F.lit(3)) + 1).cast("int"),
        ).alias("currency_rk"),
        F.hour("ts").alias("hour"),
        F.expr("(dayofweek(ts)+6)%7").alias("day"),
        F.month("ts").alias("month"),
        F.dayofmonth("ts").alias("number_day"),
    )


@register(
    "u1_rnn_scores",
    oracle=None,  # GRU recurrence is not SQL-expressible; rows-only gate
    survey_ref="U1,U2,U6,S5,W4,W7",
    doc="REAL TransactionsRnn scoring: nn_bins digitize -> last-300 "
    "zero-padded sequences -> broadcast nn_weights.ckpt -> numpy BiGRU "
    "forward in mapInPandas (model.py:27-90,167-240).",
)
def u1_rnn_scores(spark, sf_dir):
    from ..inference.udfs import rnn_scorer_model, score_rnn_sequences
    from ..plans.sequences import rnn_input_sequences
    from ..sources.artifacts import load_bin_edges

    bins = load_bin_edges(_BINS_PATH)  # S5: the reference's real artifact
    seqs = rnn_input_sequences(_tx_like(spark, sf_dir), bins, seq_len=300)
    return (
        score_rnn_sequences(seqs, rnn_scorer_model(), id_col="user_id", seq_col="seq")
        .withColumnRenamed("vec_id", "user_id")
        .select("user_id", "score")
    )


@register(
    "u4_vrae_latents",
    oracle=None,  # LSTM recurrence is not SQL-expressible; rows-only gate
    survey_ref="U4,W1,W2,W3,W7,P5",
    doc="REAL VRAE latent extraction: one-hot + z-score + cumsum + "
    "re-anchor sequences -> broadcast vrae_5896.pth -> numpy LSTM encoder "
    "latent means in mapInPandas (run.py:88-137,176-178; "
    "vrae/vrae.py:11-84,440-455).  40 latent dims exploded to "
    "(user_id, dim, value) so the row-count gate sees every value.",
)
def u4_vrae_latents(spark, sf_dir):
    from ..inference.udfs import encode_with_vrae, vrae_encoder_model
    from ..plans.sequences import vrae_input_sequences

    tx = T(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.col("event_id").alias("ord"),
        F.expr(SIGNED_AMT).alias("amt"),
        F.col("event_type").alias("cat"),
    )
    seqs = vrae_input_sequences(tx, cat_vocab=_VOCAB)
    lat = encode_with_vrae(seqs, vrae_encoder_model(), id_col="user_id", seq_col="seq")
    return lat.select(
        "user_id", F.posexplode("latent").alias("dim", "value")
    )
