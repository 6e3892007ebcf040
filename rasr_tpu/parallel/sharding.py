"""Device mesh and sharding rules.

The reference's scale-out is corpus partitioning across independent
processes merged via accumulator files (SURVEY.md §2.20).  Here the
equivalent is in-process SPMD over a `jax.sharding.Mesh`:

  * 'data'  axis — segments/batches (the analogue of corpus partitions),
  * 'model' axis — tensor-parallel sharding of wide layers
    (mlp/heads/vocab dims of the conformer).

Logical parameter axes (annotated via flax with_partitioning) map to mesh
axes through LOGICAL_AXIS_RULES; activations are sharded batch-along-'data'.
Collectives ride ICI via XLA (psum/all-gather inserted by pjit).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# logical axis name -> mesh axis (None = replicated)
LOGICAL_AXIS_RULES: Tuple[Tuple[str, Optional[str]], ...] = (
    ("batch", "data"),
    ("embed", None),
    ("mlp", "model"),
    ("heads", "model"),
    ("vocab", "model"),
    ("kv", None),
)


def make_mesh(n_devices: Optional[int] = None,
              data_parallel: Optional[int] = None,
              axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """Build a 2-D (data, model) mesh over the available devices.

    data_parallel defaults to as many ways as possible with model=remainder;
    a single device yields a (1, 1) mesh so the same code path runs
    everywhere.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data_parallel is None:
        data_parallel = n  # dp-dominant default; pass data_parallel for tp
    if n % data_parallel != 0:
        raise ValueError(f"{n} devices not divisible by dp={data_parallel}")
    model = n // data_parallel
    grid = np.asarray(devices).reshape(data_parallel, model)
    return Mesh(grid, axis_names)


def logical_to_mesh_spec(logical_axes: Sequence[Optional[str]]) -> P:
    """Map flax logical axis names to a PartitionSpec via LOGICAL_AXIS_RULES."""
    rules = dict(LOGICAL_AXIS_RULES)
    return P(*(rules.get(a) if a is not None else None for a in logical_axes))


def shard_params(params, mesh: Mesh):
    """Apply with_partitioning metadata: returns params placed with
    NamedShardings derived from their logical axes (replicated if none)."""
    import flax

    def place(x):
        if isinstance(x, flax.linen.Partitioned):
            spec = logical_to_mesh_spec(x.names)
            arr = jax.device_put(x.value, NamedSharding(mesh, spec))
            return x.replace_boxed(arr)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(
        place, params,
        is_leaf=lambda x: isinstance(x, flax.linen.Partitioned))


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree matching `params` (for jit in_shardings)."""
    import flax

    def spec_of(x):
        if isinstance(x, flax.linen.Partitioned):
            return NamedSharding(mesh, logical_to_mesh_spec(x.names))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(
        spec_of, params,
        is_leaf=lambda x: isinstance(x, flax.linen.Partitioned))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis along 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
