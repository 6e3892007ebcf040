"""Pipeline parallelism over a 'stage' mesh axis (GPipe-style).

The reference scales deep models across hosts with MPI process groups;
the TPU-native equivalent is SPMD microbatch pipelining: every device
runs the SAME program under `shard_map`, holds one stage's parameters
(stacked along a leading stage axis, sharded over 'stage'), and passes
activations to its neighbour with `lax.ppermute` — the collective rides
ICI, no host involvement.

Schedule: classic GPipe fill-drain.  With S stages and M microbatches
the loop runs M + S - 1 ticks; stage s processes microbatch t - s at
tick t.  Everything is differentiable (ppermute has a transpose), so
the same function serves training.

Typical use (deep conformer encoders):

    mesh = Mesh(devices, ("stage",))
    stacked = stack_stage_params([stage0_params, stage1_params, ...])
    y = pipeline_apply(mesh, block_fn, stacked, x, n_microbatches=8)
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map as _shard_map

import inspect as _inspect

# the replication-check kwarg was renamed check_rep -> check_vma
_CHECK_KW = ("check_vma" if "check_vma"
             in _inspect.signature(_shard_map).parameters else "check_rep")


def shard_map(f, **kwargs):
    if "check_rep" in kwargs:
        kwargs[_CHECK_KW] = kwargs.pop("check_rep")
    return _shard_map(f, **kwargs)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stage_params(stage_params: list) -> Any:
    """Stack per-stage parameter pytrees along a new leading axis
    (to be sharded over 'stage')."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0), *stage_params)


def split_layers_into_stages(layer_params: list, n_stages: int) -> list:
    """Group a list of per-layer parameter pytrees into n_stages stacked
    groups of equal size (layers % n_stages must be 0): each stage applies
    its layers sequentially via lax.scan."""
    L = len(layer_params)
    if L % n_stages != 0:
        raise ValueError(f"{L} layers not divisible by {n_stages} stages")
    per = L // n_stages
    stages = []
    for s in range(n_stages):
        group = layer_params[s * per:(s + 1) * per]
        stages.append(jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves, axis=0), *group))
    return stages


def pipeline_apply(mesh: Mesh, stage_fn: Callable, stacked_params: Any,
                   x: jnp.ndarray, n_microbatches: int,
                   stage_axis: str = "stage",
                   data_axis: str = None,
                   param_specs: Any = None) -> jnp.ndarray:
    """Run `stage_fn(stage_params, h) -> h` through an S-stage pipeline.

    stacked_params: pytree with leading stage axis S (sharded over
    `stage_axis`).  x: (B, ...) global batch, B % n_microbatches == 0.
    data_axis: optional second mesh axis sharding the within-microbatch
    batch dimension — pipeline and data parallelism compose in one SPMD
    program.  param_specs: optional pytree of PartitionSpecs describing
    each leaf's layout BELOW the stage axis (tensor parallelism: shard
    weight matrices over a 'model' axis; `stage_fn` must then close its
    contractions with psum over that axis — see `column_row_stage_fn`).
    With all three, one SPMD program runs stage x data x model (3-D)
    parallelism.  Returns (B, ...) outputs (replicated across stages).
    """
    S = mesh.shape[stage_axis]
    tree = jax.tree_util
    x_leaves = tree.tree_leaves(x)
    B = x_leaves[0].shape[0]
    if B % n_microbatches != 0:
        raise ValueError(f"batch {B} not divisible by {n_microbatches}")
    mb = B // n_microbatches
    # x may be a pytree (e.g. (hidden, mask)): every leaf carries the
    # batch dim and is microbatched together
    xm = tree.tree_map(
        lambda a: a.reshape((n_microbatches, mb) + a.shape[1:]), x)

    if param_specs is None:
        param_specs = jax.tree_util.tree_map(lambda _: P(stage_axis),
                                             stacked_params)
    else:
        param_specs = jax.tree_util.tree_map(
            lambda spec: P(stage_axis, *spec), param_specs,
            is_leaf=lambda v: isinstance(v, P))
    x_one_spec = P(None, data_axis) if data_axis else P()
    x_spec = tree.tree_map(lambda _: x_one_spec, xm)
    perm = [(s, (s + 1) % S) for s in range(S)]  # ring: stage s -> s+1

    def per_stage(params, xm_local):
        # params: (1, ...) slice of the stage stack; xm replicated
        p = tree.tree_map(lambda a: a[0], params)
        stage = jax.lax.axis_index(stage_axis)
        n_ticks = n_microbatches + S - 1

        def tick(carry, t):
            recv, out_acc = carry
            # stage 0 ingests microbatch t (while valid); others take recv
            mb_idx = jnp.clip(t, 0, n_microbatches - 1)
            ingest = tree.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, mb_idx, 0,
                                                       keepdims=False),
                xm_local)
            h_in = tree.tree_map(
                lambda a, b: jnp.where(stage == 0, a, b), ingest, recv)
            h_out = stage_fn(p, h_in)
            # last stage writes its finished microbatch t - (S - 1)
            done_idx = t - (S - 1)
            valid = jnp.logical_and(stage == S - 1, done_idx >= 0)
            out_acc = jax.lax.cond(
                valid,
                lambda acc: tree.tree_map(
                    lambda a, v: jax.lax.dynamic_update_index_in_dim(
                        a, v, jnp.maximum(done_idx, 0), 0),
                    acc, h_out),
                lambda acc: acc, out_acc)
            nxt = tree.tree_map(
                lambda a: jax.lax.ppermute(a, stage_axis, perm), h_out)
            return (nxt, out_acc), None

        init = (tree.tree_map(lambda a: jnp.zeros(a.shape[1:], a.dtype),
                              xm_local),
                tree.tree_map(jnp.zeros_like, xm_local))
        (_, outputs), _ = jax.lax.scan(tick, init,
                                       jnp.arange(n_ticks))
        # replicate outputs to every stage: only the last stage holds them
        def replicate(a):
            masked = jnp.where(stage == S - 1, a, jnp.zeros_like(a))
            if a.dtype == jnp.bool_:  # psum has no bool reduction
                return jax.lax.psum(masked.astype(jnp.int32),
                                    stage_axis) != 0
            return jax.lax.psum(masked, stage_axis)

        outputs = tree.tree_map(replicate, outputs)
        return outputs

    out = shard_map(per_stage, mesh=mesh,
                    in_specs=(param_specs, x_spec),
                    out_specs=x_spec,
                    check_rep=False)(stacked_params, xm)
    return tree.tree_map(
        lambda a: a.reshape((B,) + a.shape[2:]), out)


def scan_stage_fn(layer_fn: Callable) -> Callable:
    """Lift a single-layer fn into a stage fn over stacked layer params:
    stage_fn(stacked_layers, h) applies each layer in sequence via scan."""

    def stage_fn(stacked, h):
        def body(carry, layer_params):
            return layer_fn(layer_params, carry), None

        out, _ = jax.lax.scan(body, h, stacked)
        return out

    return stage_fn


def make_pipeline_mesh(n_devices: int, stage_axis: str = "stage") -> Mesh:
    devices = np.asarray(jax.devices()[:n_devices])
    return Mesh(devices, (stage_axis,))


def make_3d_mesh(n_stages: int, data_parallel: int, model_parallel: int,
                 axis_names=("stage", "data", "model")) -> Mesh:
    """stage x data x model device mesh for 3-D-parallel pipelines.

    Axis order puts `model` innermost so tensor-parallel collectives ride
    the fastest ICI links, then `data`, with `stage` outermost (pipeline
    ppermute tolerates the longest hops) — the standard mesh layout of
    the scaling playbook."""
    n = n_stages * data_parallel * model_parallel
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(
        (n_stages, data_parallel, model_parallel))
    return Mesh(grid, axis_names)


def column_row_stage_fn(*, model_axis: str = "model") -> Callable:
    """Tensor-parallel two-matmul block for pipeline stages (the classic
    column-parallel -> row-parallel MLP split):

        h1 = act(h @ W1 + b1)   W1 (D, F/mp) column-sharded: no comm
        y  = psum(h1 @ W2) + b2 W2 (F/mp, D) row-sharded: one psum

    Stage params: {"w1": (L, D, F), "b1": (L, F), "w2": (L, F, D),
    "b2": (L, D)} stacked over L layers per stage; shard F over `model`
    via pipeline_apply's param_specs.  Matches the reference's scale-out
    intent with XLA collectives instead of NCCL (SURVEY §2.20)."""

    def one_layer(p, h):
        h1 = jnp.tanh(h @ p["w1"] + p["b1"])
        partial_ = h1 @ p["w2"]
        return jax.lax.psum(partial_, model_axis) + p["b2"]

    def stage_fn(stacked, h):
        def body(carry, layer_params):
            return one_layer(layer_params, carry), None

        out, _ = jax.lax.scan(body, h, stacked)
        return out

    return stage_fn


def column_row_param_specs(model_axis: str = "model"):
    """param_specs matching column_row_stage_fn's layout: below the
    stage axis each leaf is (L, ...) with the F dimension sharded."""
    return {"w1": P(None, None, model_axis), "b1": P(None, model_axis),
            "w2": P(None, model_axis, None), "b2": P(None, None)}
