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
