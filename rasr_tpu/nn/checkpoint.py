"""Model checkpointing.

The reference stores NN parameters via FormatSet files and TF checkpoints
(SURVEY.md §5.4).  Here flax param pytrees serialize to msgpack with
logical-axis metadata preserved, so a restore onto a different mesh
re-shards correctly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax
import jax
import numpy as np
from flax import serialization


def _unbox(tree):
    return jax.tree_util.tree_map(
        lambda x: x.value if isinstance(x, flax.linen.Partitioned) else x,
        tree, is_leaf=lambda x: isinstance(x, flax.linen.Partitioned))


def _names(tree):
    return jax.tree_util.tree_map(
        lambda x: x.names if isinstance(x, flax.linen.Partitioned) else None,
        tree, is_leaf=lambda x: isinstance(x, flax.linen.Partitioned))


def save_params(path: str, params, step: int = 0) -> None:
    """Serialize (possibly Partitioned) params to a msgpack file."""
    payload = {
        "step": step,
        "params": jax.tree_util.tree_map(np.asarray, _unbox(params)),
    }
    data = serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)


def load_params(path: str, template) -> Any:
    """Restore params into the structure of `template` (a params tree from
    model.init, Partitioned metadata re-attached)."""
    with open(path, "rb") as fh:
        data = fh.read()
    raw_template = {"step": 0,
                    "params": jax.tree_util.tree_map(np.asarray,
                                                     _unbox(template))}
    restored = serialization.from_bytes(raw_template, data)
    values = restored["params"]
    return jax.tree_util.tree_map(
        lambda meta, v: (meta.replace_boxed(jax.numpy.asarray(v))
                         if isinstance(meta, flax.linen.Partitioned)
                         else jax.numpy.asarray(v)),
        template, values,
        is_leaf=lambda x: isinstance(x, flax.linen.Partitioned)), \
        restored["step"]
