"""Hybrid NN-HMM acoustic model: conformer frame classifier.

The reference's hybrid recipe trains an NN on frame-labeled (aligned)
features and scores HMM emission posteriors for the classic
word-conditioned search (src/Nn/BufferedAlignedFeatureProcessor,
hybrid feature scorers src/Nn/Module.cc:110-129).  Here the model is a
conformer encoder whose 4x-subsampled states are projected to tied-state
logits and repeated back to the full 100 fps frame rate — the standard
subsampled-encoder hybrid AM layout; per-frame cross-entropy against the
alignment trains it, and at decode time

    emission score = -(log p(s|x) - prior_scale * log p(s))

feeds the search (state-posterior scaling, src/Mm/Module.cc
nn-precomputed-hybrid).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .conformer import ConformerEncoder

Dtype = Any


class HybridConformerAm(nn.Module):
    """(B, T, D) features + lengths -> (B, T, n_classes) frame logits.

    The encoder subsamples time by 4; logits are computed at the reduced
    rate (one Dense per 40 ms) and repeated 4x so the search sees scores
    at the HMM frame rate.  Output is cropped/zero-padded to exactly the
    input frame count T.
    """
    n_classes: int = 129
    d_model: int = 384
    n_layers: int = 8
    n_heads: int = 4
    conv_kernel: int = 15
    dropout: float = 0.1
    dtype: Dtype = jnp.bfloat16
    time_upsample: int = 4

    @nn.compact
    def __call__(self, features, lengths, deterministic: bool = True):
        B, T, _D = features.shape
        h, _out_lens, _mask = ConformerEncoder(
            self.d_model, self.n_layers, self.n_heads, self.conv_kernel,
            self.dropout, self.dtype, name="encoder")(
                features, lengths, deterministic)
        logits = nn.Dense(self.n_classes, dtype=jnp.float32,
                          name="frame_head")(h)
        up = jnp.repeat(logits, self.time_upsample, axis=1)
        if up.shape[1] < T:
            up = jnp.pad(up, ((0, 0), (0, T - up.shape[1]), (0, 0)))
        return up[:, :T], lengths
