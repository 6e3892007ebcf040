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


class CheckpointManager:
    """Rotated checkpointing with preemption-safe resume.

    Keeps the newest `max_to_keep` step checkpoints in a directory
    (atomic writes via save_params, round-robin deletion) plus optimizer
    state, and restores the latest complete one — the orbax
    CheckpointManager workflow realized with the msgpack serializer
    (reference workflow: FormatSet model files per epoch + resume from
    the newest, SURVEY.md §5.4 and checkpoint/resume aux subsystem).
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = directory
        self.max_to_keep = max_to_keep
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt-{step:010d}.msgpack")

    def all_steps(self):
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("ckpt-") and name.endswith(".msgpack"):
                try:
                    out.append(int(name[5:-8]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def save(self, step: int, params, opt_state: Any = None) -> str:
        payload = params if opt_state is None else {
            "params": params, "opt_state": opt_state}
        path = self._path(step)
        save_params(path, payload, step=step)
        for old in self.all_steps()[:-self.max_to_keep]:
            os.remove(self._path(old))
        return path

    def restore(self, template, opt_template: Any = None,
                step: Optional[int] = None):
        """Returns (params, opt_state, step); (template, opt_template, -1)
        when no checkpoint exists (fresh start after cold boot)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return template, opt_template, -1
        wrapped = template if opt_template is None else {
            "params": template, "opt_state": opt_template}
        restored, got_step = load_params(self._path(step), wrapped)
        if opt_template is None:
            return restored, None, got_step
        return restored["params"], restored["opt_state"], got_step
