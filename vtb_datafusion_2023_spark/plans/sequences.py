"""Branch A/B sequence preparation (SURVEY §2.6 W1-W4, W7; P5, W3).

- VRAE input (/root/reference/run.py:88-137): one-hot over the frozen
  vocabulary + per-user z-scored numerics + running sums + re-anchored
  time offsets, assembled into per-user ordered float sequences.
- RNN input (/root/reference/model.py:167-196): binned ordinal features,
  last-300 truncation, zero-padded fixed-length tensors.

Both return (user_id, seq: array<array<double>>) ready for a
``mapInPandas`` torch scorer (inference.udfs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.temporal import with_time_parts
from ..operators.projections import debit_credit, one_hot
from ..operators.windows import (
    assemble_sequences,
    keep_last_n,
    reanchor_first,
    with_cumsum,
    zscore,
)


def vrae_input_sequences(
    tx: DataFrame,
    cat_vocab: Sequence,
    currency_vocab: Sequence = (48, 50, 60),
) -> DataFrame:
    """One-hot + z-score + cumsums + re-anchor -> per-user sequences
    (natural length, like the reference's VRAE branch)."""
    t = with_time_parts(tx.withColumnRenamed("ts", "transaction_dttm"))
    t = debit_credit(t, "amt") if "amt" in t.columns else t
    t = one_hot(t, "cat", cat_vocab, prefix="cat")
    t = one_hot(t, "currency", currency_vocab, prefix="cur") if "currency" in t.columns else t
    order = ["transaction_dttm", "ord"]
    t = zscore(t, "user_id", ["amt"])  # W3, population std
    t = with_cumsum(t, "user_id", order, ["amt", "debit", "credit"])  # W1
    t = t.withColumn(
        "tdiff", F.unix_timestamp("transaction_dttm").cast("double")
    )
    t = reanchor_first(t, "user_id", order, "tdiff", "tdiff_re")  # W2
    feature_cols = (
        ["amt_z", "amt_cum", "debit_cum", "credit_cum", "tdiff_re", "time_day"]
        + [f"cat_{v}" for v in cat_vocab]
    )
    t = t.na.fill(0.0, ["amt_z", "debit_cum", "credit_cum"])
    return assemble_sequences(t, "user_id", order, feature_cols)


def reference_feature_frame(
    tx: DataFrame,
    cat_col: str = "cat",
    amt_col: str = "amt",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, ts, ord, cat, amt) -> the reference RNN's seven raw
    feature columns (model.py:253-265: hour/day/month/number_day time
    parts + mcc_code/currency_rk/transaction_amt).

    The engine's generic log has a free-form category instead of MCC and
    no currency: both are derived deterministically (xxhash64 into the
    mcc range; user-keyed currency pick over the reference's {48,50,60})
    so ``nn_bins.pickle`` digitization sees in-domain values.  A caller
    whose data has real ``mcc_code``/``currency_rk`` columns should
    project them directly instead.
    """
    ts = F.col(ts_col)
    return tx.select(
        "user_id",
        ts.alias("ts"),
        "ord",
        F.col(amt_col).alias("transaction_amt"),
        (
            F.pmod(F.xxhash64(F.col(cat_col).cast("string")), F.lit(8600)) + F.lit(742)
        ).alias("mcc_code"),
        F.element_at(
            F.array(F.lit(48), F.lit(50), F.lit(60)),
            (F.pmod(F.col("user_id"), F.lit(3)) + 1).cast("int"),
        ).alias("currency_rk"),
        F.hour(ts).alias("hour"),
        ((F.dayofweek(ts) + 6) % 7).alias("day"),
        F.month(ts).alias("month"),
        F.dayofmonth(ts).alias("number_day"),
    )


def rnn_input_sequences(
    tx: DataFrame,
    bin_edges: dict[str, list[float]],
    seq_len: int = 300,
) -> DataFrame:
    """Binned ordinal features, last-``seq_len`` truncation + zero pad
    (model.py:172-196).  ``bin_edges`` plays the role of nn_bins.pickle
    (S5): a driver-side dict compiled into the projection."""
    from ..operators.projections import bin_by_edges

    t = with_time_parts(tx.withColumnRenamed("ts", "transaction_dttm"))
    for feat, edges in bin_edges.items():
        t = t.withColumn(f"{feat}_bin", bin_by_edges(feat, edges).cast("double"))
    t = t.na.fill(0.0, [f"{f}_bin" for f in bin_edges])
    order = ["transaction_dttm", "ord"]
    t = keep_last_n(t, "user_id", order, seq_len)
    return assemble_sequences(
        t, "user_id", order, [f"{f}_bin" for f in bin_edges], seq_len=seq_len, pad_value=0.0
    )
