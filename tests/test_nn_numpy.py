"""Real-weights inference: the restricted torch-checkpoint loader and the
numpy LSTM/GRU forwards (U1/U2, U4).

The vectorized forwards are differentially tested against independent
scalar-loop implementations of the public torch recurrence equations —
two implementations, one spec — plus shape/layout checks on the actual
reference checkpoints and a refusal test for the restricted unpickler.
"""

from __future__ import annotations

import io
import os
import pickle
import zipfile

import numpy as np
import pytest

from vtb_datafusion_2023_spark.inference.nn_numpy import (
    TransactionsRnnScorer,
    VraeEncoder,
    gru_layer,
    lstm_layer,
)
from vtb_datafusion_2023_spark.inference.torch_ckpt import load_state_dict

RNN_CKPT = "/root/reference/nn_weights.ckpt"
VRAE_CKPT = "/root/reference/model_dir/vrae_5896.pth"

needs_ckpts = pytest.mark.skipif(
    not (os.path.exists(RNN_CKPT) and os.path.exists(VRAE_CKPT)),
    reason="reference checkpoints not present",
)


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def _naive_lstm(x, w_ih, w_hh, b_ih, b_hh):
    """Scalar-loop LSTM (torch gate order i,f,g,o) — the independent spec."""
    t_len, batch, _ = x.shape
    hidden = w_hh.shape[1]
    h = np.zeros((batch, hidden), np.float32)
    c = np.zeros((batch, hidden), np.float32)
    for t in range(t_len):
        for b in range(batch):
            gates = w_ih @ x[t, b] + b_ih + w_hh @ h[b] + b_hh
            i = _sig(gates[:hidden])
            f = _sig(gates[hidden : 2 * hidden])
            g = np.tanh(gates[2 * hidden : 3 * hidden])
            o = _sig(gates[3 * hidden :])
            c[b] = f * c[b] + i * g
            h[b] = o * np.tanh(c[b])
    return h, c


def _naive_gru(x, w_ih, w_hh, b_ih, b_hh, reverse=False):
    """Scalar-loop GRU (torch gate order r,z,n), batch_first input."""
    batch, t_len, _ = x.shape
    hidden = w_hh.shape[1]
    h = np.zeros((batch, hidden), np.float32)
    outs = np.zeros((batch, t_len, hidden), np.float32)
    order = range(t_len - 1, -1, -1) if reverse else range(t_len)
    for t in order:
        for b in range(batch):
            gi = w_ih @ x[b, t] + b_ih
            gh = w_hh @ h[b] + b_hh
            r = _sig(gi[:hidden] + gh[:hidden])
            z = _sig(gi[hidden : 2 * hidden] + gh[hidden : 2 * hidden])
            n = np.tanh(gi[2 * hidden :] + r * gh[2 * hidden :])
            h[b] = (1.0 - z) * n + z * h[b]
            outs[b, t] = h[b]
    return outs, h


def _rand_rnn_weights(rng, gates, hidden, feats):
    return (
        rng.standard_normal((gates * hidden, feats)).astype(np.float32) * 0.3,
        rng.standard_normal((gates * hidden, hidden)).astype(np.float32) * 0.3,
        rng.standard_normal(gates * hidden).astype(np.float32) * 0.1,
        rng.standard_normal(gates * hidden).astype(np.float32) * 0.1,
    )


def test_lstm_layer_matches_naive_scalar_loop():
    rng = np.random.default_rng(11)
    w = _rand_rnn_weights(rng, 4, 5, 3)
    x = rng.standard_normal((7, 2, 3)).astype(np.float32)
    outs, h, c = lstm_layer(x, *w)
    h_ref, c_ref = _naive_lstm(x, *w)
    np.testing.assert_allclose(h, h_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c, c_ref, rtol=1e-5, atol=1e-6)
    assert outs.shape == (7, 2, 5)
    np.testing.assert_allclose(outs[-1], h_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_layer_matches_naive_scalar_loop(reverse):
    rng = np.random.default_rng(12)
    w = _rand_rnn_weights(rng, 3, 4, 6)
    x = rng.standard_normal((3, 5, 6)).astype(np.float32)
    outs, h = gru_layer(x, *w, reverse=reverse)
    outs_ref, h_ref = _naive_gru(x, *w, reverse=reverse)
    np.testing.assert_allclose(outs, outs_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(h, h_ref, rtol=1e-5, atol=1e-6)
    # the final hidden is the output at the direction's last-processed step
    np.testing.assert_allclose(outs[:, 0 if reverse else -1], h_ref, rtol=1e-5, atol=1e-6)


@needs_ckpts
def test_vrae_checkpoint_loads_with_expected_shapes():
    sd = load_state_dict(VRAE_CKPT)
    enc = VraeEncoder(sd)
    # vrae.py:158-170 / run.py:140-146: hidden 120, depth 1, latent 40
    assert enc.hidden_size == 120
    assert enc.latent_length == 40
    assert len(enc.layers) == 1
    w_ih, w_hh, b_ih, b_hh = enc.layers[0]
    assert w_ih.shape == (480, enc.n_features) and w_hh.shape == (480, 120)
    assert b_ih.shape == (480,) and b_hh.shape == (480,)
    assert enc.n_features == 394  # run.py:104 closed column list + 3 cumsums


@needs_ckpts
def test_rnn_checkpoint_loads_with_expected_shapes():
    sd = load_state_dict(RNN_CKPT)
    scorer = TransactionsRnnScorer(sd)
    # model.py:15-23 embedding_projections (+1 padding row each)
    cards = [(26, 12), (403, 150), (5, 3), (103, 50), (9, 4), (14, 6), (33, 15)]
    assert len(scorer.embeddings) == 7
    for table, (card, dim) in zip(scorer.embeddings, cards):
        assert table.shape == (card + 1, dim)
    assert scorer.hidden_size == 128
    assert scorer.gru_fwd[0].shape == (384, 240)  # 3*128 x sum(embed dims)
    assert scorer.w0.shape == (64, 768) and scorer.w2.shape == (2, 64)


@needs_ckpts
def test_vrae_encode_deterministic_and_batch_invariant():
    enc = VraeEncoder(load_state_dict(VRAE_CKPT))
    rng = np.random.default_rng(13)
    x = rng.standard_normal((6, 9, enc.n_features)).astype(np.float32)
    z1 = enc.encode(x)
    z2 = enc.encode(x)
    np.testing.assert_array_equal(z1, z2)  # same batch -> bitwise equal
    # different batch split -> BLAS may reassociate float32 sums; results
    # agree to ulp-level tolerance (the Spark surface rounds to 5 digits,
    # absorbing this)
    halves = np.vstack([enc.encode(x[:3]), enc.encode(x[3:])])
    np.testing.assert_allclose(halves, z1, rtol=2e-4, atol=1e-6)
    assert z1.shape == (6, 40) and np.isfinite(z1).all()


@needs_ckpts
def test_rnn_scores_deterministic_batch_invariant_and_probabilities():
    scorer = TransactionsRnnScorer(load_state_dict(RNN_CKPT))
    rng = np.random.default_rng(14)
    codes = rng.integers(0, 4, size=(5, 7, 40))
    p1 = scorer.score(codes)
    p2 = scorer.score(codes)
    np.testing.assert_array_equal(p1, p2)  # same batch -> bitwise equal
    np.testing.assert_allclose(  # split batch -> ulp-level (see VRAE test)
        np.concatenate([scorer.score(codes[:2]), scorer.score(codes[2:])]),
        p1,
        rtol=2e-4,
        atol=1e-7,
    )
    assert ((p1 > 0) & (p1 < 1)).all()


def test_restricted_unpickler_refuses_arbitrary_globals(tmp_path):
    """A checkpoint-shaped zip whose pickle references os.system must be
    rejected, not executed."""
    evil = tmp_path / "evil.ckpt"
    payload = pickle.dumps(os.system)  # GLOBAL nt/posix system
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr("m/data.pkl", payload)
    with pytest.raises(pickle.UnpicklingError, match="refuses"):
        load_state_dict(str(evil))


def test_restricted_unpickler_rejects_unknown_persistent_id(tmp_path):
    class P(pickle.Pickler):
        def persistent_id(self, obj):
            if obj == "marker":
                return ("not_storage", 1)
            return None

    buf = io.BytesIO()
    P(buf).dump(["marker"])
    bad = tmp_path / "bad.ckpt"
    with zipfile.ZipFile(bad, "w") as zf:
        zf.writestr("m/data.pkl", buf.getvalue())
    with pytest.raises(pickle.UnpicklingError, match="persistent id"):
        load_state_dict(str(bad))
