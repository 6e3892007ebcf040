"""Rotated checkpointing + preemption-style resume: training continues
bit-exactly from the restored step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rasr_tpu.nn.checkpoint import CheckpointManager


def make_train():
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((16, 4)).astype(np.float32))
    y = x @ jnp.asarray([[1.0], [-2.0], [0.5], [3.0]])
    params = {"w": jnp.zeros((4, 1)), "b": jnp.zeros((1,))}
    opt = optax.adam(0.05)

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            return jnp.mean((x @ p["w"] + p["b"] - y) ** 2)
        g = jax.grad(loss)(params)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state

    return params, opt, step


class TestCheckpointManager:
    def test_rotation_keeps_newest(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
        params, opt, _ = make_train()
        for s in range(5):
            mgr.save(s, params)
        assert mgr.all_steps() == [3, 4]
        assert mgr.latest_step() == 4

    def test_fresh_start(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        params, opt, _ = make_train()
        p, o, step = mgr.restore(params)
        assert step == -1
        assert p is params

    def test_preemption_resume_bit_exact(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), max_to_keep=3)
        params, opt, step_fn = make_train()
        opt_state = opt.init(params)

        # uninterrupted run: 10 steps
        p_ref, o_ref = params, opt_state
        for s in range(10):
            p_ref, o_ref = step_fn(p_ref, o_ref)

        # interrupted run: 6 steps, checkpoint, "preemption", resume +4
        p, o = params, opt_state
        for s in range(6):
            p, o = step_fn(p, o)
        mgr.save(5, p, o)
        del p, o  # the process dies here

        p2, o2, last = mgr.restore(params, opt.init(params))
        assert last == 5
        for s in range(last + 1, 10):
            p2, o2 = step_fn(p2, o2)
        np.testing.assert_allclose(np.asarray(p2["w"]),
                                   np.asarray(p_ref["w"]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(p2["b"]),
                                   np.asarray(p_ref["b"]), atol=1e-7)
