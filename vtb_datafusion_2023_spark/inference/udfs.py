"""Model-inference surfaces U1/U4/U6 (SURVEY §2.9): Arrow-batched
``mapInPandas`` wrappers with broadcast artifacts.

The reference ships torch checkpoints + a CatBoost model and scores with
single-node loops (/root/reference/model.py:27-145, run.py:466-475).  The
Spark-native pattern is identical for any model family:

1. load the artifact once on the driver (S5 sidecar load),
2. ``sc.broadcast`` the weights,
3. ``mapInPandas`` batches through a scorer that lazily materializes the
   model per executor (torch/CatBoost import inside the closure),
4. emit (id, score) — joins back into the feature assembly (J2).

torch/catboost are NOT installed in this container, so the shipped scorer
is a deterministic linear model exercising the identical plumbing; the
torch path is gated behind an import-try with a clear error.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


@dataclass
class BroadcastModel:
    """Artifact container shipped to executors (S5 -> broadcast)."""

    kind: str  # 'linear' | 'torch' | 'catboost'
    payload: object  # weights vector / state-dict bytes / cbm bytes


def linear_scorer(weights: list[float]) -> BroadcastModel:
    return BroadcastModel(kind="linear", payload=np.asarray(weights, dtype=np.float64))


SCORE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), True),
    ]
)


def score_with_model(
    df: DataFrame,
    model: BroadcastModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """U6-style batched scoring: (id, vector) -> (id, score).

    The model rides a Spark broadcast; per-batch scoring is vectorized
    numpy (Arrow in, Arrow out).  The sequential-fold dot product keeps
    the score deterministic; results are rounded to ``round_digits`` (the
    cross-engine contract for Python-side float math — unlike the SQL
    fragments, numpy cannot share IEEE op order with an oracle engine).
    """
    sc = df.sparkSession.sparkContext
    # broadcast a PLAIN dict, not the dataclass: Spark broadcasts unpickle
    # on executor Python workers that may not have this package on their
    # path — builtin types always deserialize.
    b = sc.broadcast({"kind": model.kind, "payload": model.payload})

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = b.value
        if m["kind"] == "linear":
            w = m["payload"]
        elif m["kind"] == "torch":
            try:
                import torch  # noqa: F401
            except ImportError as err:  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    "torch not installed in this container; RNN/VRAE scoring "
                    "(reference model.py:27-145, vrae/vrae.py) plugs in here"
                ) from err
            raise NotImplementedError("torch scoring path: load state-dict from m.payload")
        else:  # pragma: no cover
            raise NotImplementedError(f"unknown model kind {m['kind']}")
        for pdf in batches:
            vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            # sequential fold, not BLAS dot: deterministic accumulation order
            acc = np.zeros(len(vecs))
            for j in range(vecs.shape[1]):
                acc = acc + vecs[:, j] * w[j]
            if round_digits is not None:
                acc = np.round(acc, round_digits)
            yield pd.DataFrame({"vec_id": pdf[id_col].astype("int64"), "score": acc})

    return df.select(id_col, vec_col).mapInPandas(run, schema=SCORE_SCHEMA)
