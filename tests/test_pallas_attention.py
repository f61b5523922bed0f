"""Pallas fused masked attention vs the jnp reference (interpreter mode on
CPU; the kernel compiles natively on TPU — round-2 probe)."""

import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.ops.attention import qkv_attention
from scae_tpu.ops.pallas_attention import pallas_qkv_attention


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape)


def test_matches_reference_unmasked():
    q, k, v = _rand((3, 5, 16), 0), _rand((3, 7, 16), 1), _rand((3, 7, 12), 2)
    got = pallas_qkv_attention(q, k, v, interpret=True)
    want = qkv_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_matches_reference_soft_mask():
    q, k, v = _rand((2, 4, 8), 3), _rand((2, 6, 8), 4), _rand((2, 6, 8), 5)
    presence = jax.random.uniform(jax.random.PRNGKey(6), (2, 6),
                                  minval=0.05, maxval=0.95)
    got = pallas_qkv_attention(q, k, v, presence, interpret=True)
    want = qkv_attention(q, k, v, presence)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_hard_mask_ignores_tokens():
    q, k, v = _rand((1, 3, 8), 7), _rand((1, 6, 8), 8), _rand((1, 6, 8), 9)
    presence = jnp.asarray([[1.0, 1.0, 0.0, 0.0, 1.0, 0.0]])
    got = pallas_qkv_attention(q, k, v, presence, interpret=True)
    keep = jnp.asarray([0, 1, 4])
    want = qkv_attention(q, k[:, keep], v[:, keep])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_padding_does_not_leak():
    # sizes chosen so N, M, d all need padding
    q, k, v = _rand((2, 9, 10), 10), _rand((2, 13, 10), 11), \
        _rand((2, 13, 6), 12)
    got = pallas_qkv_attention(q, k, v, interpret=True)
    want = qkv_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_use_pallas_is_trainable_with_jnp_grads():
    """use_pallas=True must be differentiable: the custom VJP routes the
    backward through the jnp path (ops/attention.py), so grads match the
    plain path exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scae_tpu.ops.attention import qkv_attention

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (2, 5, 16))
    k = jax.random.normal(ks[1], (2, 7, 16))
    v = jax.random.normal(ks[2], (2, 7, 8))
    p = jax.random.uniform(ks[3], (2, 7))

    def loss(use_pallas):
        def f(q, k, v, p):
            return jnp.sum(qkv_attention(q, k, v, p,
                                         use_pallas=use_pallas) ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, p)

    g_ref = loss(False)
    g_pal = loss(True)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
