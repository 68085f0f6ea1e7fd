"""U6 real CatBoost: the pure-numpy .cbm reader/scorer (inference/cbm.py).

The parse is certified by the model's own redundancy: RepackedBins is a
second, independent encoding of every split (validated on load), and the
per-tree leaf-weight sums must all equal the training-set row count.
Scoring is certified by exact replay: the generated DuckDB oracle
recomputes every reachable leaf from SQL literals (see suite
``u6_catboost_cbm``), and here by invariance + conform-semantics tests.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

CBM = "/root/reference/model_dir/model_cb.cbm"
CBM_VRAE = "/root/reference/model_dir/model_cb_vrae.cbm"

needs_cbm = pytest.mark.skipif(not os.path.exists(CBM), reason="reference .cbm not present")


@pytest.fixture(scope="module")
def model():
    from vtb_datafusion_2023_spark.inference.cbm import CbmModel

    return CbmModel.load(CBM)


@needs_cbm
def test_parse_structure_matches_training_config(model):
    # params InfoMap: trained with 750 iterations at depth 3 (run.py /
    # training.ipynb cell 16); one tree may stop shallower.
    assert len(model.tree_sizes) == 750
    assert model.tree_sizes.max() == 3
    assert '"iterations":750' in model.info["params"].replace(" ", "")
    assert model.feature_names[0] == "nn_predict"  # run.py:435 puts it first
    assert model.approx_dim == 1 and model.scale == 1.0


@needs_cbm
def test_leaf_weights_partition_training_set(model):
    # every tree routes the same 7079 training rows to its leaves
    sums = np.add.reduceat(model.leaf_weights, model.leaf_offsets)
    assert len(np.unique(np.round(sums, 6))) == 1


@needs_cbm
def test_vrae_variant_is_base_plus_latents(model):
    from vtb_datafusion_2023_spark.inference.cbm import CbmModel

    mv = CbmModel.load(CBM_VRAE)
    # the 40 VRAE latents join with pandas' integer column labels
    # (run.py:179,464: df_z columns are 0..39), so catboost recorded the
    # stringified ints "0".."39" as their feature names
    extra = [n for n in mv.feature_names if n not in set(model.feature_names)]
    assert extra == [str(i) for i in range(40)]


@needs_cbm
def test_score_chunk_and_order_invariance(model):
    rng = np.random.default_rng(7)
    x = rng.normal(0, 2, (503, len(model.feature_names)))
    q = model.raw_score_q(x)
    chunked = np.concatenate([model.raw_score_q(x[i : i + 61]) for i in range(0, len(x), 61)])
    assert np.array_equal(q, chunked)
    perm = rng.permutation(len(x))
    assert np.array_equal(model.raw_score_q(x[perm]), q[perm])


@needs_cbm
def test_quantized_score_tracks_float_leaves(model):
    from vtb_datafusion_2023_spark.inference.cbm import LEAF_SCALE

    rng = np.random.default_rng(11)
    x = rng.normal(0, 2, (64, len(model.feature_names)))
    q = model.raw_score_q(x) / LEAF_SCALE
    # float-leaf replay of the same leaf selection
    with np.errstate(invalid="ignore"):
        bins = x[:, model.flat_index][:, model.bin_feat] > model.bin_border
    per = bins[:, model.tree_splits].astype(np.int64)
    per <<= np.concatenate([np.arange(s) for s in model.tree_sizes])
    idx = np.add.reduceat(per, model.split_offsets, axis=1)
    exact = model.leaf_values[model.leaf_offsets + idx].sum(axis=1)
    assert np.max(np.abs(q - exact)) < len(model.tree_sizes) * 2.0**-36


@needs_cbm
def test_nan_falls_to_false_side_and_zero_fill_conform(model):
    x = np.zeros((2, len(model.feature_names)))
    x[1, :] = np.nan
    q0, qnan = model.raw_score_q(x)
    # NaN routes like -inf (all bits False); 0.0 may clear some
    # negative borders, so the two differ whenever negative borders exist
    xneg = np.full((1, len(model.feature_names)), -1e30)
    assert model.raw_score_q(xneg)[0] == qnan
    # conform-by-name: frame missing every model column scores like zeros
    pdf = pd.DataFrame({"unrelated": [1.0, 2.0]})
    assert np.array_equal(
        model.raw_score_q(model.matrix_from_pandas(pdf)), np.array([q0, q0])
    )
    # named column feeds its feature; extra columns ignored
    pdf2 = pd.DataFrame({"nn_predict": [0.9], "junk": [5.0]})
    x2 = model.matrix_from_pandas(pdf2)
    assert x2[0, 0] == 0.9 and x2.shape[1] == len(model.feature_names)


@needs_cbm
def test_proba_shape_and_discrimination(model):
    rng = np.random.default_rng(3)
    x = rng.normal(0, 2, (256, len(model.feature_names)))
    p = model.predict_proba(x)
    assert np.all((p > 0) & (p < 1)) and p.std() > 0.01


@needs_cbm
def test_spark_score_catboost_matches_local(spark, model):
    from vtb_datafusion_2023_spark.inference.cbm import LEAF_SCALE
    from vtb_datafusion_2023_spark.inference.udfs import catboost_cbm_model, score_catboost

    rng = np.random.default_rng(5)
    n = 200
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n),
            "nn_predict": rng.uniform(0, 1, n),
            "tr_time_mean": rng.uniform(0, 90000, n),
            "mcc_proc_cred-9222": rng.uniform(-5, 5, n),
        }
    )
    got = (
        score_catboost(
            spark.createDataFrame(pdf).repartition(7), catboost_cbm_model(CBM), id_col="vec_id"
        )
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want_q = model.raw_score_q(model.matrix_from_pandas(pdf))
    assert np.array_equal(got["score_q"].to_numpy(), want_q)
    assert np.array_equal(got["score"].to_numpy(), want_q / LEAF_SCALE)


@needs_cbm
def test_oracle_plan_covers_every_tree_exactly_once(model):
    from vtb_datafusion_2023_spark.inference.cbm import oracle_plan

    plan = oracle_plan(model, {"nn_predict": 0})
    var_trees = {t for t, _, _, _ in plan["var_splits"]}
    leaf_trees = {t for t, _, _ in plan["leaves"]}
    assert var_trees == leaf_trees
    # every tree either contributes literals or the constant
    n_const = len(model.tree_sizes) - len(var_trees)
    assert n_const > 0 and plan["const_q"] != 0
    # reachable-leaf count = sum of 2^(mapped splits in tree)
    from collections import Counter

    per_tree = Counter(t for t, _, _, _ in plan["var_splits"])
    assert len(plan["leaves"]) == sum(2**v for v in per_tree.values())


# ---------------------------------------------------------------------------
# Hypothesis: the vectorized reduceat scorer vs a naive per-row tree walk
# over RANDOM synthetic models — catches bit-order / offset / indexing bugs
# the single reference artifact can't.


def _random_model(rng, n_features=6, n_trees=12, max_depth=3):
    from vtb_datafusion_2023_spark.inference.cbm import LEAF_SCALE

    bin_feat, bin_border = [], []
    for pos in range(n_features):
        for b in sorted(rng.normal(0, 2, rng.integers(1, 5))):
            bin_feat.append(pos)
            bin_border.append(float(np.float32(b)))
    sizes = rng.integers(1, max_depth + 1, n_trees)
    splits = rng.integers(0, len(bin_feat), int(sizes.sum()))
    leaf_values = rng.normal(0, 0.1, int((2**sizes).sum()))
    return {
        "feature_names": [f"f{i}" for i in range(n_features)],
        "flat_index": np.arange(n_features),
        "bin_feat": np.asarray(bin_feat),
        "bin_border": np.asarray(bin_border),
        "tree_splits": splits.astype(np.int64),
        "tree_sizes": sizes.astype(np.int64),
        "split_offsets": np.concatenate([[0], np.cumsum(sizes[:-1])]).astype(np.int64),
        "leaf_offsets": np.concatenate([[0], np.cumsum(2 ** sizes[:-1])]).astype(np.int64),
        "leaf_q": np.round(leaf_values * LEAF_SCALE).astype(np.int64),
        "scale": 1.0,
        "bias": 0.0,
    }


def _tree_walk(p, x_row):
    """Slow reference interpreter: one tree at a time, one split at a time."""
    total = 0
    for t in range(len(p["tree_sizes"])):
        idx = 0
        for d in range(int(p["tree_sizes"][t])):
            g = int(p["tree_splits"][p["split_offsets"][t] + d])
            feat = int(p["bin_feat"][g])
            if x_row[feat] > p["bin_border"][g]:
                idx |= 1 << d
        total += int(p["leaf_q"][int(p["leaf_offsets"][t]) + idx])
    return total


def test_vectorized_scorer_matches_tree_walk_on_random_models():
    from vtb_datafusion_2023_spark.inference.cbm import score_q_payload

    rng = np.random.default_rng(42)
    for trial in range(20):
        p = _random_model(rng)
        x = rng.normal(0, 2, (17, len(p["feature_names"])))
        # exercise NaN routing too
        x[3, 1] = np.nan
        got = score_q_payload(p, x)
        want = np.array([_tree_walk(p, row) for row in x])
        # NaN > border is False in both paths
        assert np.array_equal(got, want), trial
