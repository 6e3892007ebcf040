"""CG and L-BFGS solvers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rasr_tpu.math.solvers import conjugate_gradient, minimize_lbfgs


class TestConjugateGradient:
    def test_solves_spd_system(self):
        rng = np.random.default_rng(0)
        M = rng.standard_normal((8, 8))
        A = jnp.asarray(M @ M.T + 8 * np.eye(8), jnp.float32)
        b = jnp.asarray(rng.standard_normal(8), jnp.float32)
        x, it = conjugate_gradient(lambda v: A @ v, b, tol=1e-6)
        np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b),
                                   atol=1e-3)
        assert int(it) <= 8 + 2

    def test_jits(self):
        A = jnp.eye(4) * 2.0
        b = jnp.ones(4)
        solve = jax.jit(lambda b: conjugate_gradient(lambda v: A @ v, b)[0])
        np.testing.assert_allclose(np.asarray(solve(b)), 0.5 * np.ones(4),
                                   atol=1e-5)

    def test_implicit_operator(self):
        # matvec without materializing A: (D + uu^T) x
        d = jnp.asarray([2.0, 3.0, 4.0])
        u = jnp.asarray([1.0, 0.5, -0.5])
        mv = lambda x: d * x + u * jnp.vdot(u, x)
        b = jnp.asarray([1.0, 2.0, 3.0])
        x, _ = conjugate_gradient(mv, b)
        np.testing.assert_allclose(np.asarray(mv(x)), np.asarray(b),
                                   atol=1e-4)


class TestLbfgs:
    def test_rosenbrock(self):
        def rosen(x):
            return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                           + (1 - x[:-1]) ** 2)

        x, val, it = minimize_lbfgs(rosen, jnp.zeros(4),
                                    max_iterations=200, tol=1e-12)
        np.testing.assert_allclose(np.asarray(x), np.ones(4), atol=1e-3)
        assert val < 1e-6
