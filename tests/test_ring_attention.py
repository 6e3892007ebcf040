"""Ring attention vs full attention on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from rasr_tpu.ops.ring_attention import sequence_sharded_attention

B, T, H, D = 2, 32, 2, 8


def full_attention(q, k, v, lengths=None):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D)
    if lengths is not None:
        valid = jnp.arange(T)[None, :] < lengths[:, None]
        s = jnp.where(valid[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("seq",))


@pytest.fixture()
def qkv():
    rng = np.random.default_rng(0)
    return tuple(jnp.asarray(rng.standard_normal((B, T, H, D))
                             .astype(np.float32)) for _ in range(3))


class TestRingAttention:
    def test_matches_full_attention(self, mesh, qkv):
        q, k, v = qkv
        got = sequence_sharded_attention(mesh, q, k, v)
        want = full_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_with_length_mask(self, mesh, qkv):
        q, k, v = qkv
        lengths = jnp.asarray([T, T // 2], jnp.int32)
        got = sequence_sharded_attention(mesh, q, k, v, lengths)
        want = full_attention(q, k, v, lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_jits_and_shards(self, mesh, qkv):
        q, k, v = qkv
        fn = jax.jit(lambda a, b, c: sequence_sharded_attention(mesh, a, b, c))
        out = fn(q, k, v)
        assert out.shape == (B, T, H, D)
        # output really is sharded over the sequence axis
        spec = tuple(out.sharding.spec)
        assert len(spec) >= 2 and spec[1] == "seq"

    def test_grad_flows(self, mesh, qkv):
        q, k, v = qkv

        def loss(q):
            return jnp.sum(sequence_sharded_attention(mesh, q, k, v) ** 2)

        g = jax.grad(loss)(q)
        assert np.isfinite(np.asarray(g)).all()
        # matches the full-attention gradient
        def loss_full(q):
            return jnp.sum(full_attention(q, k, v) ** 2)
        g_full = jax.grad(loss_full)(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_full),
                                   atol=5e-4)
