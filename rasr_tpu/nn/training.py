"""Neural acoustic model training on TPU.

Replaces the reference legacy NN trainer stack (src/Nn/FeedForwardTrainer,
Estimator.hh SGD zoo, BufferedFeatureExtractor minibatch assembly) with a
flax/optax train state and a pjit-sharded train step over a (data, model)
mesh: gradients psum over 'data' automatically via pjit, the analogue of
the reference's accumulator combine (SURVEY.md §2.20).

CTC loss uses optax.ctc_loss (blank index 0, matching ConformerCtc).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.conformer import ConformerCtc
from ..parallel.sharding import (batch_sharding, param_shardings, replicated,
                                 shard_params)


def make_optimizer(learning_rate: float = 1e-3, warmup_steps: int = 1000,
                   weight_decay: float = 1e-6,
                   clip_norm: float = 5.0) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, 100_000, end_value=learning_rate * 0.05)
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, weight_decay=weight_decay))


def make_dynamic_optimizer(weight_decay: float = 1e-6,
                           clip_norm: float = 5.0):
    """AdamW whose learning rate is a RUNTIME hyperparameter (fed per
    step by the trainer), so schedule changes never recompile the train
    step — compiles through the remote tunnel cost 15-35 min, and the
    lr/warmup values would otherwise be baked into the program as
    constants."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=0.0, weight_decay=weight_decay))


def warmup_cosine(peak_lr: float, warmup_steps: int,
                  decay_steps: int = 100_000, end_frac: float = 0.05):
    """Host-side schedule for make_dynamic_optimizer."""

    def fn(step: int) -> float:
        if step < warmup_steps:
            return peak_lr * step / max(warmup_steps, 1)
        t = min((step - warmup_steps) / max(decay_steps - warmup_steps, 1),
                1.0)
        cos = 0.5 * (1.0 + math.cos(math.pi * t))
        return peak_lr * (end_frac + (1.0 - end_frac) * cos)

    return fn


def _set_learning_rate(opt_state, lr: float):
    """Update the injected learning-rate leaf of the optimizer state
    (value-only change: shapes identical, no recompilation)."""

    def visit(node):
        if hasattr(node, "hyperparams") and "learning_rate" in \
                getattr(node, "hyperparams", {}):
            hp = dict(node.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return node._replace(hyperparams=hp)
        if isinstance(node, tuple) and type(node) is tuple:
            return tuple(visit(x) for x in node)
        return node

    return visit(opt_state)


class CtcTrainer:
    """Owns model params + optimizer state; train_step is jit-compiled with
    mesh shardings (batch along 'data', wide params along 'model')."""

    def __init__(self, model: ConformerCtc, mesh: Mesh,
                 optimizer: Optional[optax.GradientTransformation] = None,
                 rng_seed: int = 0,
                 example_shape: Tuple[int, int, int] = (2, 64, 80),
                 lr_schedule: Optional[Callable[[int], float]] = None):
        self.model = model
        self.mesh = mesh
        self.optimizer = optimizer or make_optimizer()
        #: host-side schedule feeding an inject_hyperparams learning rate
        #: (use with make_dynamic_optimizer; value-only, never recompiles)
        self.lr_schedule = lr_schedule
        B, T, D = example_shape
        rng = jax.random.PRNGKey(rng_seed)
        feats = jnp.zeros((B, T, D), jnp.float32)
        lens = jnp.full((B,), T, jnp.int32)
        # intermediates must be mutable at init or the InterCTC head's
        # params are never created (flax denies 'intermediates' by default)
        variables = model.init({"params": rng, "dropout": rng},
                               feats, lens, deterministic=True,
                               mutable=["params", "intermediates"])
        params = variables["params"]
        params = shard_params(params, mesh)
        self.params = params
        self.opt_state = self.optimizer.init(
            jax.tree_util.tree_map(
                lambda x: x.value if isinstance(x, flax.linen.Partitioned) else x,
                params,
                is_leaf=lambda x: isinstance(x, flax.linen.Partitioned)))
        self.step = 0
        self._train_step = self._build_train_step()

    # -- loss ---------------------------------------------------------------

    #: InterCTC mixing weight (loss = (1-w)*final + w*intermediate)
    inter_ctc_weight: float = 0.3

    def _loss_fn(self, params, batch, dropout_rng):
        feats, feat_lens, labels, label_lens = batch
        use_inter = bool(getattr(self.model, "intermediate_ctc_layer", 0))
        if use_inter:
            (logits, out_lens, _), mut = self.model.apply(
                {"params": params}, feats, feat_lens, deterministic=False,
                rngs={"dropout": dropout_rng}, mutable=["intermediates"])
        else:
            logits, out_lens, _ = self.model.apply(
                {"params": params}, feats, feat_lens, deterministic=False,
                rngs={"dropout": dropout_rng})
        T = logits.shape[1]
        logit_pad = (jnp.arange(T)[None, :] >= out_lens[:, None]).astype(jnp.float32)
        L = labels.shape[1]
        label_pad = (jnp.arange(L)[None, :] >= label_lens[:, None]).astype(jnp.float32)

        def per_label_loss(lg):
            per_seq = optax.ctc_loss(lg, logit_pad, labels, label_pad,
                                     blank_id=0)
            # per-label normalization: raw sequence losses are O(100) and
            # kept global-norm clipping permanently active on deep models
            # (updates degenerate to direction-only steps); normalized
            # losses put gradients in clip-free range
            return jnp.mean(per_seq / jnp.maximum(
                label_lens.astype(jnp.float32), 1.0))

        loss = per_label_loss(logits)
        if use_inter:
            inter_logits = [x for x in jax.tree_util.tree_leaves(
                mut["intermediates"]) if x.ndim == 3 and
                x.shape[-1] == logits.shape[-1]]
            if inter_logits:
                w = self.inter_ctc_weight
                loss = (1.0 - w) * loss \
                    + w * per_label_loss(inter_logits[0])
        return loss

    def _build_train_step(self):
        mesh = self.mesh
        p_shard = param_shardings(self.params, mesh)
        b_shard = batch_sharding(mesh)
        r_shard = replicated(mesh)

        def unboxed(tree):
            return jax.tree_util.tree_map(
                lambda x: x.value if isinstance(x, flax.linen.Partitioned) else x,
                tree, is_leaf=lambda x: isinstance(x, flax.linen.Partitioned))

        def train_step(params, opt_state, batch, rng):
            raw = unboxed(params)

            def loss_of(raw_params):
                boxed = jax.tree_util.tree_map(
                    lambda meta, v: (meta.replace_boxed(v)
                                     if isinstance(meta, flax.linen.Partitioned)
                                     else v),
                    params, raw_params,
                    is_leaf=lambda x: isinstance(x, flax.linen.Partitioned))
                return self._loss_fn(boxed, batch, rng)

            loss, grads = jax.value_and_grad(loss_of)(raw)
            updates, new_opt = self.optimizer.update(grads, opt_state, raw)
            new_raw = optax.apply_updates(raw, updates)
            new_params = jax.tree_util.tree_map(
                lambda meta, v: (meta.replace_boxed(v)
                                 if isinstance(meta, flax.linen.Partitioned)
                                 else v),
                params, new_raw,
                is_leaf=lambda x: isinstance(x, flax.linen.Partitioned))
            return new_params, new_opt, loss

        raw_shard = jax.tree_util.tree_map(
            lambda s: s, p_shard,
            is_leaf=lambda x: isinstance(x, NamedSharding))
        return jax.jit(
            train_step,
            in_shardings=(p_shard, None,
                          (b_shard, b_shard, b_shard, b_shard), r_shard),
            out_shardings=(p_shard, None, r_shard))

    # -- public api -----------------------------------------------------------

    def train_step(self, feats, feat_lens, labels, label_lens,
                   rng: Optional[jax.Array] = None) -> float:
        """One sharded optimization step; returns loss."""
        if rng is None:
            rng = jax.random.PRNGKey(self.step)
        batch = (jnp.asarray(feats), jnp.asarray(feat_lens, jnp.int32),
                 jnp.asarray(labels, jnp.int32),
                 jnp.asarray(label_lens, jnp.int32))
        if self.lr_schedule is not None:
            self.opt_state = _set_learning_rate(
                self.opt_state, self.lr_schedule(self.step))
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, batch, rng)
        self.step += 1
        return float(loss)

    # -- inference ---------------------------------------------------------

    def log_probs_fn(self) -> Callable:
        """jitted (params, feats, lens) -> (log_probs, out_lens)."""
        model = self.model

        @jax.jit
        def fn(params, feats, lens):
            logits, out_lens, _ = model.apply(
                {"params": params}, feats, lens, deterministic=True)
            return jax.nn.log_softmax(logits, axis=-1), out_lens

        return fn


def spec_augment(rng, feats, feat_lens, n_freq_masks: int = 2,
                 freq_mask_width: int = 12, n_time_masks: int = 2,
                 time_mask_frac: float = 0.05):
    """SpecAugment (Park et al. 2019) on (B, T, D) log-mel features:
    per-utterance random frequency and time masks, fully vectorized and
    jittable (fresh masks every step make a finite feature pool behave
    like a much larger corpus)."""
    import jax

    B, T, D = feats.shape
    out = feats
    keys = jax.random.split(rng, 2)
    # frequency masks
    fk = jax.random.uniform(keys[0], (B, n_freq_masks, 2))
    f0 = (fk[..., 0] * D).astype(jnp.int32)                  # (B, M)
    fw = (fk[..., 1] * freq_mask_width).astype(jnp.int32)
    d = jnp.arange(D)[None, None, :]
    fmask = jnp.any((d >= f0[..., None]) & (d < (f0 + fw)[..., None]),
                    axis=1)                                   # (B, D)
    out = jnp.where(fmask[:, None, :], 0.0, out)
    # time masks (inside the valid region)
    tk = jax.random.uniform(keys[1], (B, n_time_masks, 2))
    width = (tk[..., 1] * time_mask_frac
             * feat_lens[:, None].astype(jnp.float32)).astype(jnp.int32)
    t0 = (tk[..., 0] * jnp.maximum(
        feat_lens[:, None] - width, 1).astype(jnp.float32)).astype(jnp.int32)
    t = jnp.arange(T)[None, None, :]
    tmask = jnp.any((t >= t0[..., None]) & (t < (t0 + width)[..., None]),
                    axis=1)                                   # (B, T)
    return jnp.where(tmask[:, :, None], 0.0, out)


class FrameCeTrainer(CtcTrainer):
    """Frame-labeled cross-entropy training for hybrid NN-HMM acoustic
    models (the reference's BufferedAlignedFeatureProcessor recipe,
    src/Nn/BufferedFeatureExtractor.hh:38): batch = (feats (B, T, D),
    feat_lens, frame labels (B, T) tied-state ids, label frame counts).
    Reuses CtcTrainer's sharded step machinery; only the loss and the
    posterior accessor differ (HybridConformerAm returns full-rate
    logits, models/hybrid.py)."""

    def _loss_fn(self, params, batch, dropout_rng):
        feats, feat_lens, labels, label_frames = batch
        logits, _ = self.model.apply(
            {"params": params}, feats, feat_lens, deterministic=False,
            rngs={"dropout": dropout_rng})
        T = logits.shape[1]
        valid = (jnp.arange(T)[None, :]
                 < label_frames[:, None]).astype(jnp.float32)
        lp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(lp, labels[..., None], axis=-1)[..., 0]
        return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    def log_probs_fn(self) -> Callable:
        """jitted (params, feats, lens) -> (frame log-posteriors, lens)."""
        model = self.model

        @jax.jit
        def fn(params, feats, lens):
            logits, out_lens = model.apply(
                {"params": params}, feats, lens, deterministic=True)
            return jax.nn.log_softmax(logits, axis=-1), out_lens

        return fn

    def frame_accuracy_fn(self) -> Callable:
        """jitted (params, feats, lens, labels, frames) -> accuracy."""
        model = self.model

        @jax.jit
        def fn(params, feats, lens, labels, frames):
            logits, _ = model.apply({"params": params}, feats, lens,
                                    deterministic=True)
            pred = jnp.argmax(logits, axis=-1)
            T = logits.shape[1]
            valid = (jnp.arange(T)[None, :] < frames[:, None])
            hits = jnp.sum((pred == labels) & valid)
            return hits / jnp.maximum(jnp.sum(valid), 1)

        return fn


class PipelinedCtcTrainer:
    """CTC training with the conformer block stack pipeline-staged over a
    (stage, data) mesh (models.pipelined) — GPipe microbatching + data
    parallelism in one SPMD program.  Same loss as CtcTrainer (per-label
    normalization, optional InterCTC mixing); dropout keys fold in
    (stage, layer, microbatch).

    Select from the nn-trainer config with `trainer.pipeline-stages = S`
    (devices are laid out S x (n_devices // S)).  With
    `trainer.model-parallel = M > 1` the mesh becomes 3-D
    (stage, data, model) and every block's wide contractions are
    tensor-parallel over 'model' (models.tp_conformer: explicit psums
    under shard_map)."""

    inter_ctc_weight: float = 0.3

    def __init__(self, model: ConformerCtc, n_stages: int,
                 optimizer: Optional[optax.GradientTransformation] = None,
                 rng_seed: int = 0,
                 example_shape: Tuple[int, int, int] = (2, 64, 80),
                 n_microbatches: int = 2,
                 n_devices: Optional[int] = None,
                 model_parallel: int = 1):
        import numpy as np
        from ..models.pipelined import unbox as _unbox

        if model.n_layers % n_stages != 0:
            raise ValueError(f"{model.n_layers} layers not divisible by "
                             f"{n_stages} stages")
        n = n_devices or len(jax.devices())
        if n % (n_stages * model_parallel) != 0:
            raise ValueError(f"{n} devices not divisible by "
                             f"{n_stages} stages x {model_parallel} "
                             f"model-parallel")
        self.model = model
        self.n_microbatches = n_microbatches
        self.model_parallel = model_parallel
        if model_parallel > 1:
            from ..parallel.pipeline import make_3d_mesh
            self.mesh = make_3d_mesh(
                n_stages, n // (n_stages * model_parallel), model_parallel)
        else:
            self.mesh = Mesh(
                np.asarray(jax.devices()[:n]).reshape(
                    n_stages, n // n_stages),
                ("stage", "data"))
        self.optimizer = optimizer or make_optimizer()
        B, T, D = example_shape
        rng = jax.random.PRNGKey(rng_seed)
        variables = model.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((B, T, D), jnp.float32),
            jnp.full((B,), T, jnp.int32), deterministic=True,
            mutable=["params", "intermediates"])
        self.params = _unbox(variables["params"])
        self.opt_state = self.optimizer.init(self.params)
        self.step = 0
        self._train_step = jax.jit(self._make_train_step())

    def _loss(self, params, batch, rng):
        feats, feat_lens, labels, label_lens = batch
        if self.model_parallel > 1:
            from ..models.tp_conformer import tp_pipelined_ctc_forward
            logits, out_lens, inter_logits = tp_pipelined_ctc_forward(
                self.model, params, feats, feat_lens, self.mesh,
                self.n_microbatches, data_axis="data", dropout_rng=rng)
        else:
            from ..models.pipelined import pipelined_ctc_forward
            logits, out_lens, inter_logits = pipelined_ctc_forward(
                self.model, params, feats, feat_lens, self.mesh,
                self.n_microbatches, data_axis="data", dropout_rng=rng)
        T = logits.shape[1]
        logit_pad = (jnp.arange(T)[None, :]
                     >= out_lens[:, None]).astype(jnp.float32)
        L = labels.shape[1]
        label_pad = (jnp.arange(L)[None, :]
                     >= label_lens[:, None]).astype(jnp.float32)

        def per_label_loss(lg):
            per_seq = optax.ctc_loss(lg, logit_pad, labels, label_pad,
                                     blank_id=0)
            return jnp.mean(per_seq / jnp.maximum(
                label_lens.astype(jnp.float32), 1.0))

        loss = per_label_loss(logits)
        if inter_logits is not None:
            w = self.inter_ctc_weight
            loss = (1.0 - w) * loss + w * per_label_loss(inter_logits)
        return loss

    def _make_train_step(self):
        def step(params, opt_state, batch, rng):
            loss, grads = jax.value_and_grad(self._loss)(params, batch, rng)
            updates, new_opt = self.optimizer.update(grads, opt_state,
                                                     params)
            return optax.apply_updates(params, updates), new_opt, loss
        return step

    def train_step(self, feats, feat_lens, labels, label_lens,
                   rng: Optional[jax.Array] = None) -> float:
        if rng is None:
            rng = jax.random.PRNGKey(self.step)
        batch = (jnp.asarray(feats), jnp.asarray(feat_lens),
                 jnp.asarray(labels), jnp.asarray(label_lens))
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, batch, rng)
        self.step += 1
        return float(loss)
