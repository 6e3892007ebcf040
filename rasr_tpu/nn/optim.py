"""Optimizers beyond optax's built-ins.

Rprop (resilient propagation) re-creates the reference's
Mm::RpropOptimization (src/Mm/RpropOptimization.hh:52, .tcc:78 apply):
per-component signed step sizes; a gradient sign flip decreases the step
and HOLDS one iteration (no update, optionally backtracking the previous
one); otherwise the step grows and the parameter moves one step against
the gradient.  The hold flag is encoded in the step's sign, exactly as
the reference does (setHold/unsetHold negate the stored step).

Used by the discriminative GMM estimators (reference
RpropDiscriminativeMixtureSetEstimator) and usable for any NN parameter
tree as a standard optax GradientTransformation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class RpropState(NamedTuple):
    signed_step: optax.Updates   # |.| = step size; < 0 encodes "hold"
    prev_update: optax.Updates   # last applied parameter delta


def rprop(init_step: float = 1e-2, min_step: float = 0.0,
          max_step: float = 1e6, increase: float = 1.2,
          decrease: float = 0.5,
          backtracking: bool = False) -> optax.GradientTransformation:
    """Rprop for minimization (reference maximizes; directions mirror)."""

    def init(params):
        return RpropState(
            signed_step=jax.tree_util.tree_map(
                lambda p: jnp.full_like(p, init_step), params),
            prev_update=jax.tree_util.tree_map(jnp.zeros_like, params))

    def _branches(g, ss, pu):
        hold = ss < 0
        step = jnp.abs(ss)
        cur_dir = -jnp.sign(g)
        # previous "gradient" proxy: the applied parameter delta
        # (RpropOptimization::action uses previous - previousToPrevious)
        flip = pu * cur_dir < 0
        return hold, step, cur_dir, flip

    def update(grads, state, params=None):
        del params

        def upd_leaf(g, ss, pu):
            hold, step, cur_dir, flip = _branches(g, ss, pu)
            # hold: apply with unchanged step; no-flip: grow and apply;
            # flip: shrink, mark hold, skip (or backtrack)
            inc_step = jnp.minimum(step * increase, max_step)
            return jnp.where(hold, cur_dir * step,
                             jnp.where(flip,
                                       -pu if backtracking else 0.0,
                                       cur_dir * inc_step))

        def step_leaf(g, ss, pu):
            hold, step, cur_dir, flip = _branches(g, ss, pu)
            inc_step = jnp.minimum(step * increase, max_step)
            dec_step = jnp.maximum(step * decrease, min_step)
            return jnp.where(hold, step,
                             jnp.where(flip, -dec_step, inc_step))

        tm = jax.tree_util.tree_map
        updates = tm(upd_leaf, grads, state.signed_step, state.prev_update)
        new_ss = tm(step_leaf, grads, state.signed_step, state.prev_update)
        return updates, RpropState(new_ss, updates)

    return optax.GradientTransformation(init, update)
