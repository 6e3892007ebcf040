"""Iterative solvers: conjugate gradient and L-BFGS minimization.

Reference: src/Math (LAPACK/BLAS-backed CG and L-BFGS used by
discriminative training and CMLLR-style estimation).  TPU-native:
conjugate_gradient is a jit/vmap-able lax.while_loop over matvec
closures (works with implicit operators — never materialize the
matrix); minimize_lbfgs drives optax.lbfgs with a value_and_grad
closure.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def conjugate_gradient(matvec: Callable, b: jnp.ndarray,
                       x0: Optional[jnp.ndarray] = None,
                       tol: float = 1e-6, max_iterations: int = 100
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve A x = b for symmetric positive-definite A given as matvec.

    Returns (x, n_iterations).  jit-safe (lax.while_loop with a
    residual-norm stop)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    p = r
    rs = jnp.vdot(r, r)
    b_norm = jnp.maximum(jnp.sqrt(jnp.vdot(b, b)), 1e-30)

    def cond(state):
        x, r, p, rs, it = state
        return (jnp.sqrt(rs) / b_norm > tol) & (it < max_iterations)

    def body(state):
        x, r, p, rs, it = state
        ap = matvec(p)
        alpha = rs / jnp.maximum(jnp.vdot(p, ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
        return x, r, p, rs_new, it + 1

    x, r, p, rs, it = jax.lax.while_loop(
        cond, body, (x, r, p, rs, jnp.asarray(0)))
    return x, it


def minimize_lbfgs(fun: Callable, x0, max_iterations: int = 100,
                   tol: float = 1e-6):
    """Minimize fun(x) (pytree x) with optax L-BFGS + zoom linesearch.
    Returns (x, final value, n_iterations)."""
    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(fun)

    x = x0
    state = opt.init(x)
    prev = jnp.inf
    it = 0
    for it in range(1, max_iterations + 1):
        value, grad = value_and_grad(x, state=state)
        updates, state = opt.update(grad, state, x, value=value,
                                    grad=grad, value_fn=fun)
        x = optax.apply_updates(x, updates)
        if abs(float(value) - float(prev)) < tol:
            break
        prev = value
    return x, float(fun(x)), it
