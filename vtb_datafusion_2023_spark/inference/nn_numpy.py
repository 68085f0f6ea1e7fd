"""Numpy forward passes for the reference's torch models (no torch).

Implements exactly the eval-mode math of:

- the VRAE LSTM encoder + latent-mean head
  (/root/reference/vrae/vrae.py:11-84: ``Encoder.forward`` returns the
  last layer's final hidden state; ``Lambda.forward`` in eval mode
  returns ``hidden_to_mean(h_end)``), and
- the bidirectional-GRU transaction classifier
  (/root/reference/model.py:27-90: embedding lookups -> BiGRU ->
  max/avg/last-hidden pooling -> 2-layer ReLU head -> softmax).

torch RNN semantics (public docs): LSTM gate order i,f,g,o with
``c' = f*c + i*g; h' = o*tanh(c')``; GRU gate order r,z,n with
``n = tanh(W_in x + b_in + r*(W_hn h + b_hn)); h' = (1-z)*n + z*h``.
Weights are the checkpoint's ``weight_ih_l0`` (G*H, F), ``weight_hh_l0``
(G*H, H) and the two bias vectors; the ``_reverse`` set processes the
sequence back-to-front.

Dropout: ``nn.Dropout2d`` / ``functional.dropout`` are identity at
expectation; we run the deterministic eval path (identity).  (The
reference applies ``functional.dropout`` with its ``training=True``
default even at inference and averages over repeated stochastic passes —
``model.py:247-294`` ``reliable_predict``; our SO3xA15 ensemble models
that averaging, while each single pass here is the deterministic
expectation.)

Math runs in float64 (weights are the checkpoint's float32 values cast
exactly): rows are independent (no cross-row reduction), and BLAS
batch-shape reassociation perturbs float64 dots only at ~1e-15 relative,
so the mapInPandas surfaces' 5/6-digit output rounding pins values
across any Spark partitioning (a float32 forward left ulp-level
batch-composition noise that could flip the rounding — seen flaky in
tests/test_inference_real.py).  The float64 forward agrees with torch's
float32 eval pass to float32-ulp, well inside the rounding grain.
Asserted in tests/test_nn_numpy.py.
"""

from __future__ import annotations

import numpy as np


def _sigmoid(x: np.ndarray) -> np.ndarray:
    # numerically-stable logistic.  z = exp(-|x|) <= 1 for every x, then
    # pick the branch with np.where — element-for-element the same ops
    # (and bits) as the classic two-branch form, but pure ufuncs instead
    # of boolean fancy indexing (~3x faster at RNN gate shapes).
    z = np.exp(-np.abs(x))
    return np.where(x >= 0, 1.0 / (1.0 + z), z / (1.0 + z))


def linear(x: np.ndarray, weight: np.ndarray, bias: np.ndarray) -> np.ndarray:
    """torch ``nn.Linear``: y = x @ W.T + b."""
    return x @ weight.T + bias


def lstm_layer(
    x: np.ndarray,
    w_ih: np.ndarray,
    w_hh: np.ndarray,
    b_ih: np.ndarray,
    b_hh: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One unidirectional LSTM layer over x (T, B, F) -> (outputs (T, B, H),
    h_T, c_T).  Gate order i, f, g, o (torch)."""
    t_len, batch, _ = x.shape
    hidden = w_hh.shape[1]
    h = np.zeros((batch, hidden), dtype=x.dtype)
    c = np.zeros((batch, hidden), dtype=x.dtype)
    outs = np.empty((t_len, batch, hidden), dtype=x.dtype)
    gx_all = x @ w_ih.T + b_ih  # one GEMM for every step's input gates
    for t in range(t_len):
        gates = gx_all[t] + h @ w_hh.T + b_hh
        i = _sigmoid(gates[:, :hidden])
        f = _sigmoid(gates[:, hidden : 2 * hidden])
        g = np.tanh(gates[:, 2 * hidden : 3 * hidden])
        o = _sigmoid(gates[:, 3 * hidden :])
        c = f * c + i * g
        h = o * np.tanh(c)
        outs[t] = h
    return outs, h, c


def gru_layer(
    x: np.ndarray,
    w_ih: np.ndarray,
    w_hh: np.ndarray,
    b_ih: np.ndarray,
    b_hh: np.ndarray,
    reverse: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """One GRU direction over x (B, T, F), batch_first -> (outputs
    (B, T, H), h_final (B, H)).  Gate order r, z, n (torch); ``reverse``
    walks the sequence back-to-front (outputs land at their own t)."""
    batch, t_len, _ = x.shape
    hidden = w_hh.shape[1]
    h = np.zeros((batch, hidden), dtype=x.dtype)
    outs = np.empty((batch, t_len, hidden), dtype=x.dtype)
    # input projections have no recurrence: one (B*T, F) GEMM for all
    # steps instead of T small ones (the recurrent h @ w_hh stays per
    # step).  BLAS blocking may reassociate sums vs the per-step GEMM —
    # ~1e-15 relative in float64, absorbed by the surfaces' output
    # rounding exactly like batch-shape noise (module docstring).
    gi_all = x @ w_ih.T + b_ih  # (B, T, 3H)
    steps = range(t_len - 1, -1, -1) if reverse else range(t_len)
    for t in steps:
        gi = gi_all[:, t]
        gh = h @ w_hh.T + b_hh
        r = _sigmoid(gi[:, :hidden] + gh[:, :hidden])
        z = _sigmoid(gi[:, hidden : 2 * hidden] + gh[:, hidden : 2 * hidden])
        n = np.tanh(gi[:, 2 * hidden :] + r * gh[:, 2 * hidden :])
        h = (1.0 - z) * n + z * h
        outs[:, t] = h
    return outs, h


class VraeEncoder:
    """VRAE encode-to-latent-mean (vrae.py:38-47 + 70-84, eval mode).

    Built from a state dict loaded by ``torch_ckpt.load_state_dict`` —
    supports the multi-layer case (``weight_ih_l1`` ...) although the
    shipped checkpoints are single-layer.
    """

    def __init__(self, sd: dict[str, np.ndarray]):
        self.layers = []
        k = 0
        while f"encoder.model.weight_ih_l{k}" in sd:
            self.layers.append(
                tuple(
                    np.asarray(sd[f"encoder.model.{p}_l{k}"], dtype=np.float64)
                    for p in ("weight_ih", "weight_hh", "bias_ih", "bias_hh")
                )
            )
            k += 1
        if not self.layers:
            raise ValueError("state dict has no encoder.model.weight_ih_l0")
        self.w_mean = np.asarray(sd["lmbd.hidden_to_mean.weight"], dtype=np.float64)
        self.b_mean = np.asarray(sd["lmbd.hidden_to_mean.bias"], dtype=np.float64)
        self.n_features = self.layers[0][0].shape[1]
        self.hidden_size = self.layers[0][1].shape[1]
        self.latent_length = self.w_mean.shape[0]

    def encode(self, x: np.ndarray) -> np.ndarray:
        """(B, T, n_features) -> latent means (B, latent_length), float64."""
        seq = np.ascontiguousarray(np.transpose(x, (1, 0, 2)), dtype=np.float64)
        h_end = None
        for w_ih, w_hh, b_ih, b_hh in self.layers:
            seq, h_end, _ = lstm_layer(seq, w_ih, w_hh, b_ih, b_hh)
        return linear(h_end, self.w_mean, self.b_mean)


class TransactionsRnnScorer:
    """Eval-mode TransactionsRnn forward (model.py:27-90) in numpy.

    Input: integer code sequences shaped (B, n_features=7, T) in the
    reference's feature order (hour, mcc_code, currency_rk,
    transaction_amt, day, month, number_day — model.py:15-23); codes
    index the embedding tables (row 0 = padding).  Output: P(class 1).
    """

    def __init__(self, sd: dict[str, np.ndarray]):
        self.embeddings = []
        i = 0
        while f"_transaction_cat_embeddings.{i}.weight" in sd:
            self.embeddings.append(
                np.asarray(sd[f"_transaction_cat_embeddings.{i}.weight"], dtype=np.float64)
            )
            i += 1
        if not self.embeddings:
            raise ValueError("state dict has no _transaction_cat_embeddings")
        self.gru_fwd = tuple(
            np.asarray(sd[f"_gru.{p}_l0"], dtype=np.float64)
            for p in ("weight_ih", "weight_hh", "bias_ih", "bias_hh")
        )
        self.gru_rev = tuple(
            np.asarray(sd[f"_gru.{p}_l0_reverse"], dtype=np.float64)
            for p in ("weight_ih", "weight_hh", "bias_ih", "bias_hh")
        )
        self.w0 = np.asarray(sd["_top_classifier.0.weight"], dtype=np.float64)
        self.b0 = np.asarray(sd["_top_classifier.0.bias"], dtype=np.float64)
        self.w2 = np.asarray(sd["_top_classifier.2.weight"], dtype=np.float64)
        self.b2 = np.asarray(sd["_top_classifier.2.bias"], dtype=np.float64)
        self.hidden_size = self.gru_fwd[1].shape[1]

    def score(self, codes: np.ndarray) -> np.ndarray:
        """(B, n_features, T) int -> (B,) probability of class 1."""
        codes = np.asarray(codes, dtype=np.int64)
        batch, n_feat, t_len = codes.shape
        if n_feat != len(self.embeddings):
            raise ValueError(f"expected {len(self.embeddings)} feature rows, got {n_feat}")
        looked_up = []
        for i, table in enumerate(self.embeddings):
            idx = np.clip(codes[:, i, :], 0, table.shape[0] - 1)
            looked_up.append(table[idx])  # (B, T, E_i)
        x = np.concatenate(looked_up, axis=-1)  # (B, T, sum E_i)
        out_f, h_f = gru_layer(x, *self.gru_fwd)
        out_r, h_r = gru_layer(x, *self.gru_rev, reverse=True)
        states = np.concatenate([out_f, out_r], axis=-1)  # (B, T, 2H)
        rnn_max = states.max(axis=1)
        rnn_avg = states.sum(axis=1) / float(t_len)
        # torch: h_n (2, B, H) .permute(1,2,0).reshape(B, 2H) interleaves
        # directions per hidden unit (model.py:72)
        last_hidden = np.stack([h_f, h_r], axis=-1).reshape(batch, 2 * self.hidden_size)
        combined = np.concatenate([rnn_max, rnn_avg, last_hidden], axis=-1)
        z = np.maximum(linear(combined, self.w0, self.b0), 0.0)
        logits = linear(z, self.w2, self.b2)
        logits = logits - logits.max(axis=1, keepdims=True)
        ex = np.exp(logits)
        probs = ex / ex.sum(axis=1, keepdims=True)
        return probs[:, 1]
