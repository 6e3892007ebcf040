"""Fused whole-sequence-in-VMEM attention kernel
(ops/attention_kernel.py): interpret-mode exactness vs the XLA
reference, including padding masks and the flax attention_fn adapter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rasr_tpu.ops.attention_kernel import fused_attention


def ref_attn(q, k, v, mask, dh):
    s = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(dh)
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("bhts,bshd->bthd", p, v)


@pytest.mark.parametrize("T,Dh", [(37, 64), (200, 64), (16, 48)])
def test_matches_reference_with_padding(T, Dh):
    rng = np.random.default_rng(0)
    B, H = 3, 4
    q = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
    lens = np.asarray([T, max(T // 2, 1), max(T // 4, 1)])
    mask = jnp.asarray(np.arange(T)[None, :] < lens[:, None])
    out = fused_attention(q, k, v, mask, interpret=True)
    ref = ref_attn(q, k, v, mask, Dh)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(out)[b, :lens[b]],
                                   np.asarray(ref)[b, :lens[b]],
                                   rtol=2e-5, atol=2e-5)


def test_conformer_attention_impl_equivalence(monkeypatch):
    import rasr_tpu.ops.attention_kernel as ak
    orig = ak.make_flax_attention_fn
    monkeypatch.setattr(ak, "make_flax_attention_fn",
                        lambda **kw: orig(interpret=True))
    from rasr_tpu.models import ConformerCtc
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((2, 40, 16)).astype(np.float32))
    lens = jnp.asarray([40, 25], jnp.int32)
    m_x = ConformerCtc(vocab_size=32, d_model=64, n_layers=2, n_heads=2,
                       dtype=jnp.float32)
    variables = m_x.init(jax.random.PRNGKey(0), feats, lens)
    m_p = ConformerCtc(vocab_size=32, d_model=64, n_layers=2, n_heads=2,
                       dtype=jnp.float32, attention_impl="pallas")
    lx, ox, _ = m_x.apply(variables, feats, lens, deterministic=True)
    lp, _, _ = m_p.apply(variables, feats, lens, deterministic=True)
    for b in range(2):
        np.testing.assert_allclose(np.asarray(lx)[b, :int(ox[b])],
                                   np.asarray(lp)[b, :int(ox[b])],
                                   rtol=1e-4, atol=1e-4)


def test_custom_vjp_gradients_match_reference():
    from rasr_tpu.ops.attention_kernel import fused_attention_vjp
    rng = np.random.default_rng(2)
    B, T, H, Dh = 2, 24, 2, 32
    q = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
    lens = np.asarray([24, 13])
    mask = jnp.asarray(np.arange(T)[None, :] < lens[:, None])
    qmask = mask[..., None, None].astype(jnp.float32)

    def loss_pallas(q, k, v):
        out = fused_attention_vjp(q, k, v, mask, True)
        return jnp.sum((out * qmask) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((ref_attn(q, k, v, mask, Dh) * qmask) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a) * np.asarray(qmask),
                                   np.asarray(b) * np.asarray(qmask),
                                   rtol=1e-4, atol=1e-4)
