"""Pure-numpy CatBoost ``.cbm`` reader and oblivious-tree scorer (U6).

The reference scores its assembled feature matrix with
``CatBoostClassifier.load_model('model_dir/model_cb*.cbm')`` +
``predict_proba`` (/root/reference/run.py:466-475).  The catboost package
is not installed in this container, but the ``.cbm`` container format is
public: ``b"CBM1" + uint32 core_size + FlatBuffers(TModelCore)`` with the
schema published in the catboost repo
(``catboost/libs/model/flatbuffers/model.fbs``, Apache-2.0).  This module
reads that format with the dependency-free flatbuffers accessor in
``flatbuf.py`` and evaluates the oblivious trees vectorized in numpy.

Field slots used (empirically verified against the reference artifacts —
see ``validate()``, which cross-checks every split against the model's own
RepackedBins encoding, an independent second encoding of the same splits):

- ``TModelCore``: 0 FormatVersion ("FlabuffersModel_v1"), 1 ModelTrees,
  2 InfoMap (key/value strings: training params, class labels, ...).
- ``TModelTrees``: 0 ApproxDimension, 1 TreeSplits, 2 TreeSizes,
  3 TreeStartOffsets, 4 CatFeatures, 5 FloatFeatures, 6 OneHotFeatures,
  7 CtrFeatures, 8 LeafValues, 9 LeafWeights, 12 TextFeatures,
  14 Scale (default 1.0), 16 MultiBias, 17 RepackedBins.
- ``TFloatFeature``: 0 HasNans, 1 Index, 2 FlatFeatureIndex, 3 Borders,
  4 FeatureId, 5 NanValueTreatment.

Oblivious-tree semantics (public CatBoost evaluator): every split is a
strict ``value > border`` test on one float feature; tree ``t`` with
``d`` splits selects leaf ``sum(bit_j << j)`` where ``j`` orders the
tree's splits (first split = lowest bit); the raw score is
``scale * sum(leaf_t) + bias`` and binary-class probability is
``sigmoid(raw)``.  NaN inputs fall to the ``False`` side (CatBoost's
``AsFalse`` default; the reference trains with HasNans=false throughout).

Determinism contract: leaf values are quantized once at load to integer
units of 2**-36 (``leaf_q``), so a score is an exact int64 sum — bitwise
identical under ANY partitioning or summation order, and replayable by an
external SQL engine for the oracle gate.  The quantization deviates from
catboost's float sum by ≤ n_trees * 2**-37 (~5e-9 here), far below the
6-digit score rounding the suite emits.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from .flatbuf import Table, root_table

LEAF_SCALE_BITS = 36
LEAF_SCALE = 1 << LEAF_SCALE_BITS


@dataclass
class CbmModel:
    feature_names: list[str]  # by flat feature index (model input column order)
    flat_index: np.ndarray  # float-feature position -> flat feature index
    bin_feat: np.ndarray  # global binary-feature id -> float-feature position
    bin_border: np.ndarray  # global binary-feature id -> border (float32 exact)
    tree_splits: np.ndarray  # concatenated global binary-feature ids
    tree_sizes: np.ndarray
    split_offsets: np.ndarray  # start of each tree in tree_splits
    leaf_offsets: np.ndarray  # start of each tree's leaves in leaf_q
    leaf_values: np.ndarray  # float64, catboost's own leaf doubles
    leaf_q: np.ndarray  # int64, round(leaf * 2**36)
    leaf_weights: np.ndarray
    scale: float
    bias: float
    approx_dim: int
    info: dict[str, str]
    repacked: np.ndarray | None  # (n_splits, 3) uint16/uint8/uint8 decoded

    # ---------------------------------------------------------- loading
    @classmethod
    def load(cls, path: str) -> "CbmModel":
        with open(path, "rb") as f:
            blob = f.read()
        if blob[:4] != b"CBM1":
            raise ValueError(f"{path}: not a CatBoost .cbm (magic {blob[:4]!r})")
        (core_size,) = struct.unpack_from("<I", blob, 4)
        core = root_table(blob[8 : 8 + core_size])
        fmt = core.string(0)
        if fmt != "FlabuffersModel_v1":  # catboost's own spelling
            raise ValueError(f"unsupported .cbm format version {fmt!r}")
        trees = core.table(1)
        if trees is None:
            raise ValueError("no ModelTrees in .cbm")
        info = {}
        for kv in core.vector_tables(2):
            k, v = kv.string(0), kv.string(1)
            if k is not None:
                info[k] = v or ""

        for slot, what in ((4, "categorical"), (6, "one-hot"), (7, "CTR"), (12, "text")):
            if trees.vector_len(slot):
                raise NotImplementedError(
                    f"model uses {what} features; this scorer supports float-only models "
                    "(the reference's models are float-only)"
                )
        if trees.vector_len(10) or trees.vector_len(11):
            raise NotImplementedError("non-symmetric trees not supported (reference uses oblivious)")

        approx_dim = trees.i32(0, 1)
        tree_splits = np.asarray(trees.vector_scalar(1, "i"), dtype=np.int64)
        tree_sizes = np.asarray(trees.vector_scalar(2, "i"), dtype=np.int64)
        start_offsets = np.asarray(trees.vector_scalar(3, "i"), dtype=np.int64)
        leaf_values = np.asarray(trees.vector_scalar(8, "d"), dtype=np.float64)
        leaf_weights = np.asarray(trees.vector_scalar(9, "d"), dtype=np.float64)
        scale = trees.f64(14, 1.0)
        bias = 0.0
        for slot in (16, 15):
            if trees.vector_len(slot) == approx_dim:
                bias = trees.vector_scalar(slot, "d")[0]
                break

        feats = trees.vector_tables(5)
        order = sorted(range(len(feats)), key=lambda i: feats[i].i32(1, i))
        names: dict[int, str] = {}
        bin_feat: list[int] = []
        bin_border: list[float] = []
        flat_index = np.zeros(len(feats), dtype=np.int64)
        for pos, i in enumerate(order):
            ft = feats[i]
            flat = ft.i32(2, pos)
            flat_index[pos] = flat
            names[flat] = ft.string(4) or f"f{flat}"
            for b in ft.vector_scalar(3, "f"):
                bin_feat.append(pos)
                bin_border.append(b)

        n_names = max(names) + 1 if names else 0
        feature_names = [names.get(i, f"f{i}") for i in range(n_names)]

        repacked_raw = trees.vector_bytes(17, 4)
        repacked = None
        if len(repacked_raw) == 4 * len(tree_splits):
            arr = np.frombuffer(repacked_raw, dtype=np.uint8).reshape(-1, 4)
            repacked = np.column_stack(
                [arr[:, 0].astype(np.int64) + (arr[:, 1].astype(np.int64) << 8), arr[:, 2], arr[:, 3]]
            )

        m = cls(
            feature_names=feature_names,
            flat_index=flat_index,
            bin_feat=np.asarray(bin_feat, dtype=np.int64),
            bin_border=np.asarray(bin_border, dtype=np.float64),
            tree_splits=tree_splits,
            tree_sizes=tree_sizes,
            split_offsets=start_offsets,
            leaf_offsets=np.concatenate([[0], np.cumsum(2 ** tree_sizes[:-1] * approx_dim)]),
            leaf_values=leaf_values,
            leaf_q=np.round(leaf_values * LEAF_SCALE).astype(np.int64),
            leaf_weights=leaf_weights,
            scale=scale,
            bias=bias,
            approx_dim=approx_dim,
            info=info,
            repacked=repacked,
        )
        m.validate()
        return m

    # ------------------------------------------------------- validation
    def validate(self) -> None:
        """Structural invariants + the RepackedBins cross-check.

        RepackedBins is catboost's second, runtime-oriented encoding of
        the same split list: entry i stores (float-feature position,
        xor mask, border ordinal + 1) for split ``TreeSplits[i]``.  Our
        decoder derives (feature, border) independently via cumulative
        border counts — agreement on every split proves the global
        binary-feature indexing is decoded correctly.
        """
        if self.approx_dim != 1:
            raise NotImplementedError("multiclass .cbm not supported")
        if int(self.tree_sizes.sum()) != len(self.tree_splits):
            raise ValueError("TreeSizes do not cover TreeSplits")
        if not np.array_equal(self.split_offsets, np.concatenate([[0], np.cumsum(self.tree_sizes[:-1])])):
            raise ValueError("TreeStartOffsets inconsistent with TreeSizes")
        expected_leaves = int((2 ** self.tree_sizes).sum()) * self.approx_dim
        if len(self.leaf_values) != expected_leaves:
            raise ValueError(f"LeafValues length {len(self.leaf_values)} != {expected_leaves}")
        if self.tree_splits.min() < 0 or self.tree_splits.max() >= len(self.bin_feat):
            raise ValueError("TreeSplits index outside the binary-feature table")
        if self.repacked is not None:
            want_feat = self.bin_feat[self.tree_splits]
            want_ord = np.empty_like(self.bin_feat)
            # ordinal of each binary feature within its float feature
            for pos in range(len(self.flat_index)):
                mask = self.bin_feat == pos
                want_ord[mask] = np.arange(mask.sum())
            # RepackedBins indexes only features that appear in >=1 split,
            # densely renumbered in feature order (verified empirically on
            # the reference artifacts: ordinals match split-for-split).
            used = np.unique(want_feat)
            dense = np.full(len(self.flat_index), -1, dtype=np.int64)
            dense[used] = np.arange(len(used))
            if not np.array_equal(self.repacked[:, 0], dense[want_feat]):
                raise ValueError("RepackedBins feature indices disagree with border-count decoding")
            if self.repacked[:, 1].any():
                raise NotImplementedError("xor-masked (one-hot) repacked bins unsupported")
            if not np.array_equal(self.repacked[:, 2], want_ord[self.tree_splits] + 1):
                raise ValueError("RepackedBins split ordinals disagree with border-count decoding")

    # ---------------------------------------------------------- scoring
    def matrix_from_pandas(self, pdf, fill: float = 0.0) -> np.ndarray:
        """Conform a pandas frame to the model's input columns (J5,
        run.py:470-475): model feature order, missing columns = 0."""
        n = len(pdf)
        x = np.full((n, len(self.feature_names)), fill, dtype=np.float64)
        for j, name in enumerate(self.feature_names):
            if name in pdf.columns:
                x[:, j] = pdf[name].to_numpy(dtype=np.float64, na_value=np.nan)
        return x

    def raw_score_q(self, x: np.ndarray) -> np.ndarray:
        """Exact int64 score in units of 2**-36 (partitioning-invariant)."""
        return score_q_payload(self.payload(), x)

    def raw_score(self, x: np.ndarray) -> np.ndarray:
        return self.scale * (self.raw_score_q(x) / LEAF_SCALE) + self.bias

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        raw = self.raw_score(x)
        return 1.0 / (1.0 + np.exp(-raw))

    # ------------------------------------------------- broadcast payload
    def payload(self) -> dict:
        """Plain-builtin/numpy dict for ``sc.broadcast`` (executor Python
        workers can unpickle it without this package on their path).
        Cached per model instance so ``_score_arrays``'s derived gather
        tables survive across ``raw_score_q`` calls (a fresh dict per
        call would rebuild them every invocation)."""
        cached = self.__dict__.get("_payload")
        if cached is not None:
            return cached
        self.__dict__["_payload"] = p = {
            "feature_names": list(self.feature_names),
            "flat_index": self.flat_index,
            "bin_feat": self.bin_feat,
            "bin_border": self.bin_border,
            "tree_splits": self.tree_splits,
            "tree_sizes": self.tree_sizes,
            "split_offsets": self.split_offsets,
            "leaf_offsets": self.leaf_offsets,
            "leaf_q": self.leaf_q,
            "scale": self.scale,
            "bias": self.bias,
        }
        return p


def _score_arrays(p: dict) -> tuple[np.ndarray, list]:
    """Derived gather arrays, computed once per payload dict.

    ``_bin_gather`` composes x -> used-float -> binary-feature into one
    column index (the comparison then runs at binary-feature granularity,
    n x 1377 float64, instead of gathering the n x 2249 per-split float
    matrix).  ``_levels`` lists, per oblivious-tree depth level L, which
    trees have that level and which binary-feature column each reads —
    so the leaf index accumulates in max_depth (<= ~6) vectorized passes
    over n x trees int32 instead of one np.add.reduceat over the
    n x splits matrix (reduceat is the measured hot spot: segmented sums
    are not SIMD-vectorized).  Leaf sums stay bit-identical int64.
    """
    if "_bin_gather" not in p:
        p["_bin_gather"] = p["flat_index"][p["bin_feat"]]
        sizes, offs, ts = p["tree_sizes"], p["split_offsets"], p["tree_splits"]
        max_d = int(sizes.max()) if len(sizes) else 0
        full = np.arange(len(sizes))
        levels = []
        for lvl in range(max_d):
            tsel = np.flatnonzero(sizes > lvl)
            cols = ts[offs[tsel] + lvl]
            # tsel=None marks "every tree has this level": skips the
            # fancy-indexed += (the common case — uniform-depth forests)
            levels.append((None if len(tsel) == len(full) else tsel, cols))
        p["_levels"] = levels
    return p["_bin_gather"], p["_levels"]


def score_q_payload(p: dict, x: np.ndarray) -> np.ndarray:
    """``raw_score_q`` over a ``CbmModel.payload()`` dict (closure-safe).

    Row-blocked (r9): at Arrow-batch sizes the unblocked kernel's
    temporaries (n x 1377 float64 split gather, n x trees int32
    accumulator, n x trees int64 leaf gather) are GB-scale and every
    stage round-trips main memory — the measured cost was bandwidth,
    not FLOPs.  Processing 1024-row blocks keeps all temporaries in
    L2-resident range (block sweep on the real 750-tree model:
    512/1024/2048/4096 -> 13.4/12.5/14.1/33.5 us/row vs 260 unblocked),
    and the leaf-index accumulator is width-matched
    to the forest depth (int8 up to depth 7 — leaf index < 2**depth),
    with the bool->int conversion a free ``view(int8)`` instead of an
    ``astype(int32)`` 4x copy.  Every operation stays exact-integer or
    an UNCHANGED float64 compare, so leaf sums are bit-identical to the
    unblocked kernel (pinned by test_cbm_* vs the real model_cb.cbm).
    """
    x = np.asarray(x, dtype=np.float64)
    bin_gather, levels = _score_arrays(p)
    n = len(x)
    n_trees = len(p["tree_sizes"])
    max_d = len(levels)
    acc_t = np.int8 if max_d <= 7 else (np.int16 if max_d <= 15 else np.int32)
    border = p["bin_border"]
    lo = p["leaf_offsets"]
    lq = p["leaf_q"]
    out = np.empty(n, dtype=np.int64)
    B = 1024
    with np.errstate(invalid="ignore"):
        for s in range(0, n, B):
            xb = x[s : s + B]
            bins = xb[:, bin_gather] > border
            leaf = np.zeros((len(xb), n_trees), dtype=acc_t)
            for lvl, (tsel, cols) in enumerate(levels):
                bit = bins[:, cols].view(acc_t if acc_t is np.int8 else np.int8)
                if acc_t is not np.int8:
                    bit = bit.astype(acc_t)
                if lvl:
                    bit = bit << lvl
                if tsel is None:
                    leaf += bit
                else:
                    leaf[:, tsel] += bit
            np.sum(lq[lo + leaf], axis=1, out=out[s : s + B])
    return out


def matrix_from_pandas_payload(p: dict, pdf, fill: float = 0.0) -> np.ndarray:
    n = len(pdf)
    x = np.full((n, len(p["feature_names"])), fill, dtype=np.float64)
    for j, name in enumerate(p["feature_names"]):
        if name in pdf.columns:
            x[:, j] = pdf[name].to_numpy(dtype=np.float64, na_value=np.nan)
    return x


# ---------------------------------------------------------------------------
# Cross-engine oracle generation: the scoring dataflow re-expressed as
# plain ANSI SQL over literal tables, for the DuckDB hash-match gate.


def oracle_plan(model: CbmModel, mapped: dict[str, int]) -> dict:
    """Partition the model's splits for SQL replay.

    ``mapped`` maps a feature name -> SQL slot k; every other feature is
    scored at the conform-fill value 0.0 (J5: missing columns -> 0), so
    its split bit is the compile-time constant ``0.0 > border``.  Returns:

    - ``var_splits``: [(tree, slot_k, border_f64, bit_weight)] for splits
      on mapped features,
    - ``leaves``: [(tree, var_idx, leaf_q)] — one row per REACHABLE leaf
      of each tree containing >=1 mapped split (var_idx = subset sum of
      that tree's mapped bit weights; unique because weights are distinct
      powers of two),
    - ``const_q``: exact int64 contribution of every tree whose splits
      are all constant-bit.
    """
    name_of = {i: model.feature_names[model.flat_index[i]] for i in range(len(model.flat_index))}
    const_bit = (0.0 > model.bin_border).astype(np.int64)
    var_splits: list[tuple[int, int, float, int]] = []
    leaves: list[tuple[int, int, int]] = []
    const_q = 0
    for t in range(len(model.tree_sizes)):
        lo = int(model.split_offsets[t])
        size = int(model.tree_sizes[t])
        const_part = 0
        tvar: list[tuple[int, float, int]] = []  # (slot, border, weight)
        for d in range(size):
            g = int(model.tree_splits[lo + d])
            fname = name_of[int(model.bin_feat[g])]
            if fname in mapped:
                tvar.append((mapped[fname], float(model.bin_border[g]), 1 << d))
            else:
                const_part += int(const_bit[g]) << d
        leaf_base = int(model.leaf_offsets[t])
        if not tvar:
            const_q += int(model.leaf_q[leaf_base + const_part])
            continue
        for slot, border, w in tvar:
            var_splits.append((t, slot, border, w))
        weights = [w for _, _, w in tvar]
        for mask in range(1 << len(weights)):
            vidx = sum(w for j, w in enumerate(weights) if mask >> j & 1)
            leaves.append((t, vidx, int(model.leaf_q[leaf_base + const_part + vidx])))
    return {"var_splits": var_splits, "leaves": leaves, "const_q": const_q}


def oracle_sql(
    model: CbmModel,
    feature_exprs: dict[str, str],
    source_sql: str,
    id_expr: str,
    id_alias: str = "vec_id",
) -> str:
    """ANSI-SQL replay of ``raw_score_q`` scoring for the DuckDB gate.

    ``feature_exprs``: model feature name -> SQL expression over
    ``source_sql`` columns (the SAME expression strings the Spark query
    evaluates, so both engines binarize identical IEEE doubles).  Output:
    (id, score_q BIGINT, score DOUBLE) — integer leaf sums make the
    result bitwise engine-independent; score = q / 2**36 is an exact
    power-of-two division.
    """
    mapped = {name: k for k, name in enumerate(feature_exprs)}
    plan = oracle_plan(model, mapped)
    feat_cols = ", ".join(
        f"({feature_exprs[name]}) AS m{k}" for name, k in mapped.items()
    )
    split_rows = ", ".join(
        f"({t}, {k}, {b!r}, {w})" for t, k, b, w in plan["var_splits"]
    )
    leaf_rows = ", ".join(f"({t}, {v}, {q})" for t, v, q in plan["leaves"])
    pick = " ".join(f"WHEN {k} THEN f.m{k}" for k in range(len(mapped)))
    return f"""
WITH feat AS (
  SELECT {id_expr} AS id, {feat_cols} FROM {source_sql}
),
s(tree, k, border, w) AS (VALUES {split_rows}),
l(tree, vidx, q) AS (VALUES {leaf_rows}),
bits AS (
  SELECT f.id, s.tree,
         SUM(CASE WHEN (CASE s.k {pick} END) > s.border THEN s.w ELSE 0 END) AS vidx
  FROM feat f CROSS JOIN s
  GROUP BY f.id, s.tree
),
scored AS (
  SELECT b.id, SUM(l.q) AS qvar
  FROM bits b JOIN l ON l.tree = b.tree AND l.vidx = b.vidx
  GROUP BY b.id
)
SELECT id AS {id_alias},
       CAST(qvar + {plan['const_q']} AS BIGINT) AS score_q,
       {model.scale!r} * (CAST(qvar + {plan['const_q']} AS DOUBLE) / {float(LEAF_SCALE)!r}) + {model.bias!r} AS score
FROM scored
"""
