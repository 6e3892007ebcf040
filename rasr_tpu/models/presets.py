"""Model presets: named configurations of the flagship families.

The reference ships no model definitions (models arrive as TF/ONNX
graphs); these presets give users ready-made TPU-sized configurations
following the common conformer scaling points (S/M/L of the conformer
paper, plus a v5e-friendly XL).  All presets default to bfloat16 compute
with f32 layernorms (models/conformer.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .aed import AedModel
from .conformer import ConformerCtc
from .transducer import TransducerModel

CONFORMER_PRESETS: Dict[str, Dict[str, Any]] = {
    # name: (d_model, layers, heads) — ~params at vocab 1k, 80-dim feats
    "conformer-s": dict(d_model=144, n_layers=16, n_heads=4),   # ~10M
    "conformer-m": dict(d_model=256, n_layers=16, n_heads=4),   # ~30M
    "conformer-l": dict(d_model=512, n_layers=17, n_heads=8),   # ~118M
    "conformer-xl": dict(d_model=768, n_layers=20, n_heads=8),  # ~300M
}


def conformer_ctc(preset: str = "conformer-m", vocab_size: int = 1024,
                  dtype=jnp.bfloat16, **overrides) -> ConformerCtc:
    cfg = dict(CONFORMER_PRESETS[preset])
    cfg.update(overrides)
    return ConformerCtc(vocab_size=vocab_size, dtype=dtype, **cfg)


def aed(preset: str = "conformer-m", vocab_size: int = 1024,
        decoder_layers: int = 6, dtype=jnp.bfloat16, **overrides) -> AedModel:
    cfg = dict(CONFORMER_PRESETS[preset])
    cfg.update(overrides)
    enc_layers = cfg.pop("n_layers")
    return AedModel(vocab_size=vocab_size, encoder_layers=enc_layers,
                    decoder_layers=decoder_layers, dtype=dtype, **cfg)


def transducer(preset: str = "conformer-m", vocab_size: int = 1024,
               dtype=jnp.bfloat16, **overrides) -> TransducerModel:
    cfg = dict(CONFORMER_PRESETS[preset])
    cfg.update(overrides)
    enc_layers = cfg.pop("n_layers")
    return TransducerModel(vocab_size=vocab_size,
                           encoder_layers=enc_layers, dtype=dtype, **cfg)
