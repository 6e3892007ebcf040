"""Transducer (RNN-T) model family.

The reference decodes transducer models via ONNX label scorers with
per-hypothesis state (src/Nn/LabelScorer/StatefulOnnxLabelScorer.hh,
RnaTreeBuilder src/Search/TreeBuilder.hh:293); here the model is native:
conformer encoder + LSTM prediction network + additive joint.  The RNN-T
loss is a lax.scan forward DP over the (T, U) lattice (log-space), fully
batched; greedy decoding walks frames with bounded symbol emission.

Vocabulary: 0 = blank, labels 1..V-1.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .conformer import ConformerEncoder

NEG_INF = -1e30


class PredictionNetwork(nn.Module):
    vocab_size: int
    embed_dim: int = 128
    hidden_dim: int = 256

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.embed_dim)
        self.cell = nn.OptimizedLSTMCell(self.hidden_dim)

    def initial_carry(self, batch: int):
        return self.cell.initialize_carry(jax.random.PRNGKey(0),
                                          (batch, self.embed_dim))

    def __call__(self, labels: jnp.ndarray) -> jnp.ndarray:
        """labels (B, U) with leading blank/BOS -> (B, U, H)."""
        x = self.embed(labels)
        scanned = nn.scan(
            lambda cell, carry, xt: cell(carry, xt),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1)
        _, y = scanned(self.cell, self.initial_carry(x.shape[0]), x)
        return y

    def step(self, carry, y_t: jnp.ndarray):
        """One recurrent step: y_t (B,) int32 -> (carry', out (B, H)).
        The carry is the per-hypothesis decoder state the reference keeps
        in StatefulOnnxLabelScorer hidden states."""
        return self.cell(carry, self.embed(y_t))


class Joint(nn.Module):
    vocab_size: int
    joint_dim: int = 256

    def setup(self):
        # submodule names match the original nn.compact layout so existing
        # checkpoints (assets/transducer/) load unchanged
        self.enc_proj = nn.Dense(self.joint_dim, name="enc_proj")
        self.pred_proj = nn.Dense(self.joint_dim, name="pred_proj")
        self.out = nn.Dense(self.vocab_size, name="out")

    def __call__(self, enc: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
        """enc (..., T, E), pred (..., U, P) -> logits (..., T, U, V)."""
        e = self.enc_proj(enc)
        p = self.pred_proj(pred)
        h = jnp.tanh(e[..., :, None, :] + p[..., None, :, :])
        return self.out(h)

    def from_enc_proj(self, e: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
        """Joint with the encoder side already projected: e (..., J) one
        frame, pred (..., K, P) -> logits (..., K, V).  Lets decoders
        project the whole encoder output ONCE instead of per beam step."""
        p = self.pred_proj(pred)
        h = jnp.tanh(e[..., None, :] + p)
        return self.out(h)


class TransducerModel(nn.Module):
    vocab_size: int = 1024
    d_model: int = 256
    encoder_layers: int = 12
    pred_hidden: int = 256
    joint_dim: int = 256
    n_heads: int = 4
    dropout: float = 0.1
    dtype: Any = jnp.bfloat16
    causal: bool = False     # streaming encoder (past-only context);
    #                          parameter layout identical to offline

    def setup(self):
        self.encoder = ConformerEncoder(
            self.d_model, self.encoder_layers, self.n_heads,
            dropout=self.dropout, dtype=self.dtype, causal=self.causal,
            name="encoder")
        self.prediction = PredictionNetwork(self.vocab_size,
                                            hidden_dim=self.pred_hidden,
                                            name="prediction")
        self.joint = Joint(self.vocab_size, self.joint_dim, name="joint")

    def encode(self, features, lengths, deterministic=True):
        enc, out_lens, _ = self.encoder(features, lengths, deterministic)
        return enc, out_lens

    def predict(self, labels):
        return self.prediction(labels)

    def predict_init(self, batch: int):
        return self.prediction.initial_carry(batch)

    def predict_step(self, carry, y_t):
        """One prediction-network step (KV/state-cached decoding)."""
        return self.prediction.step(carry, y_t)

    def joint_logits(self, enc, pred):
        return self.joint(enc, pred)

    def joint_frame(self, enc_t, pred):
        """Single-frame joint: enc_t (E,), pred (B, P) -> logits (B, V)."""
        B = pred.shape[0]
        e = jnp.broadcast_to(enc_t[None, :], (B, enc_t.shape[-1]))
        return self.joint(e[:, None, :], pred[:, None, :])[:, 0, 0]

    def joint_enc_proj(self, enc):
        """Encoder-side joint projection (B, T, E) -> (B, T, J), computed
        once per utterance by the device beam (search/transducer_device)."""
        return self.joint.enc_proj(enc)

    def joint_from_enc_proj(self, e_t, pred):
        """Joint logits from a pre-projected frame: e_t (B, J),
        pred (B, K, P) -> (B, K, V)."""
        return self.joint.from_enc_proj(e_t, pred)

    def __call__(self, features, feat_lengths, labels, deterministic=True):
        """labels (B, U) WITHOUT blank prefix -> logits (B, T, U+1, V)."""
        enc, out_lens = self.encode(features, feat_lengths, deterministic)
        B, U = labels.shape
        pred_in = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), labels], axis=1)
        pred = self.predict(pred_in)
        return self.joint_logits(enc, pred), out_lens


def rnnt_loss(logits: jnp.ndarray, logit_lengths: jnp.ndarray,
              labels: jnp.ndarray, label_lengths: jnp.ndarray,
              blank: int = 0) -> jnp.ndarray:
    """Negative log-likelihood of the RNN-T lattice.

    logits (B, T, U+1, V); labels (B, U).  Forward DP in log space:
      alpha[t, u] = logaddexp(alpha[t-1, u] + blank(t-1, u),
                              alpha[t, u-1] + emit(t, u-1))
    scanned over t with an in-frame scan over u.
    """
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    B, T, U1, V = lp.shape
    U = U1 - 1
    blank_lp = lp[..., blank]                            # (B, T, U+1)
    emit_lp = jnp.take_along_axis(
        lp[:, :, :U, :], labels[:, None, :, None], axis=3)[..., 0]  # (B,T,U)

    def t_step(alpha_prev, inputs):
        # alpha_prev (B, U+1) = alpha[t-1, :]
        blank_t, emit_t = inputs                          # (B, U+1), (B, U)
        # horizontal move: alpha[t, u] gets alpha[t-1, u] + blank(t-1, u)
        horiz = alpha_prev + blank_t

        # vertical (emit) moves within frame t: sequential over u
        def u_step(carry, x):
            h_u, e_u = x                                   # (B,), (B,)
            val = jnp.logaddexp(h_u, carry + e_u)
            return val, val

        first = horiz[:, 0]
        _, rest = jax.lax.scan(
            u_step, first,
            (horiz[:, 1:].T, emit_t.T))
        alpha_t = jnp.concatenate([first[:, None], rest.T], axis=1)
        return alpha_t, alpha_t

    alpha0 = jnp.full((B, U1), NEG_INF).at[:, 0].set(0.0)

    # emit chain for t=0 row
    def u0_step(carry, e_u):
        val = carry + e_u
        return val, val

    _, a0_rest = jax.lax.scan(u0_step, alpha0[:, 0], emit_lp[:, 0].T)
    alpha0 = jnp.concatenate([alpha0[:, :1], a0_rest.T], axis=1)

    _, alphas = jax.lax.scan(
        t_step, alpha0,
        (jnp.moveaxis(blank_lp[:, :-1], 1, 0),
         jnp.moveaxis(emit_lp[:, 1:], 1, 0)))
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # (T, B, U+1)

    # total = alpha[T_b - 1, U_b] + blank(T_b - 1, U_b)
    t_idx = jnp.maximum(logit_lengths - 1, 0)                  # (B,)
    a_final = alphas[t_idx, jnp.arange(B), label_lengths]
    final_blank = blank_lp[jnp.arange(B), t_idx, label_lengths]
    return -(a_final + final_blank)


def transducer_greedy(joint_step, pred_step, enc: np.ndarray,
                      enc_len: int, blank: int = 0,
                      max_symbols_per_frame: int = 4,
                      max_len: int = 1000) -> list:
    """Host greedy decode over one utterance.

    joint_step(enc_t (E,), pred_h (P,)) -> (V,) log-probs
    pred_step(label, state) -> (pred_h, state); label -1 = BOS/blank init.
    """
    labels = []
    pred_h, state = pred_step(-1, None)
    for t in range(enc_len):
        for _ in range(max_symbols_per_frame):
            lp = joint_step(enc[t], pred_h)
            v = int(np.argmax(lp))
            if v == blank:
                break
            labels.append(v)
            pred_h, state = pred_step(v, state)
            if len(labels) >= max_len:
                return labels
    return labels
