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


# ---------------------------------------------------------------------------
# U6 with the REAL CatBoost model: the reference's .cbm parsed from the
# public flatbuffers format (inference/cbm.py) and scored as exact int64
# leaf sums — which makes GBDT inference SQL-replayable, so this entry is
# fully DuckDB-hash-gated (unlike the RNN/VRAE recurrences above).

_CBM_PATH = "/root/reference/model_dir/model_cb.cbm"
# Each mapped feature sweeps its own border range, driven by a distinct
# (prime, modulus) of c_custkey — all-integer SQL arithmetic, then one
# exact /64.0, so Spark and DuckDB binarize identical IEEE doubles.
_CBM_FEATURES = [  # (model feature name, prime, modulus)
    ("mcc_proc_cred-9222", 37, 97),
    ("nn_predict", 61, 89),
    ("mcc_proc_cred-5992", 101, 83),
    ("dm_freq-10", 151, 79),
    ("mcc_proc_cred-4121", 197, 73),
    ("mcc_proc_cred-7999", 251, 71),
]


def _cbm_feature_exprs(model):
    """SQL expression per mapped feature (same string on both engines)."""
    pos_of = {model.feature_names[model.flat_index[i]]: i for i in range(len(model.flat_index))}
    exprs = {}
    for name, prime, mod in _CBM_FEATURES:
        borders = model.bin_border[model.bin_feat == pos_of[name]]
        bmin, span = float(borders.min()), float(borders.max() - borders.min())
        exprs[name] = (
            f"{bmin!r} + {span!r} * (CAST((c_custkey * {prime}) % {mod} AS DOUBLE) / 64.0)"
        )
    return exprs


def _cbm_oracle() -> str | None:
    import os

    if not os.path.exists(_CBM_PATH):
        return None  # artifact-less environment: rows-only gate
    from ..inference.cbm import CbmModel, oracle_sql

    model = CbmModel.load(_CBM_PATH)
    return oracle_sql(
        model, _cbm_feature_exprs(model), source_sql="customer", id_expr="c_custkey"
    )


@register(
    "u6_catboost_cbm",
    oracle=_cbm_oracle(),
    survey_ref="U6,J5,S5",
    doc="REAL CatBoost scoring: model_cb.cbm (750 oblivious trees, 825 "
    "features) parsed from the public flatbuffers .cbm format without "
    "catboost, broadcast once, scored vectorized in mapInPandas "
    "(run.py:466-475).  Leaf values quantized to int64 units of 2**-36 "
    "make the score an exact integer sum — partitioning-invariant and "
    "replayed split-for-split by the generated DuckDB oracle.",
)
def u6_catboost_cbm(spark, sf_dir):
    from ..inference.cbm import CbmModel
    from ..inference.udfs import catboost_cbm_model, score_catboost

    model = CbmModel.load(_CBM_PATH)
    exprs = _cbm_feature_exprs(model)
    cust = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("vec_id"),
        *[F.expr(e).alias(name) for name, e in exprs.items()],
    )
    return score_catboost(cust, catboost_cbm_model(_CBM_PATH), id_col="vec_id")
