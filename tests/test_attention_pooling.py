import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.ops.attention import qkv_attention
from scae_tpu.ops.pooling import (
    multiple_attention_pooling_2d,
    multiple_soft_attention,
    soft_attention,
)


def test_qkv_attention_shapes():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (2, 5, 8))
    k = jax.random.normal(key, (2, 7, 8))
    v = jax.random.normal(key, (2, 7, 12))
    out = qkv_attention(q, k, v)
    assert out.shape == (2, 5, 12)


def test_qkv_attention_presence_masks_out_tokens():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 3, 4))
    k = jax.random.normal(key, (1, 6, 4))
    v = jax.random.normal(key, (1, 6, 4))
    presence = jnp.asarray([[1.0, 1.0, 1.0, 0.0, 0.0, 0.0]])
    out = qkv_attention(q, k, v, presence)
    # masked result must equal attention restricted to the first 3 tokens
    out_restricted = qkv_attention(q, k[:, :3], v[:, :3])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_restricted),
                               rtol=1e-5)


def test_qkv_attention_rows_are_convex_combinations():
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (2, 4, 8))
    k = jax.random.normal(key, (2, 6, 8))
    v = jnp.ones((2, 6, 3))
    out = qkv_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.ones((2, 4, 3)), rtol=1e-5)


def test_soft_attention_preserves_shape():
    fm = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 4, 4))
    am = jax.random.normal(jax.random.PRNGKey(4), (2, 1, 4, 4))
    assert soft_attention(fm, am).shape == (2, 8, 4, 4)


def test_multiple_soft_attention_shapes():
    fm = jax.random.normal(jax.random.PRNGKey(5), (2, 12, 4, 4))
    out = multiple_soft_attention(fm, 3)  # groups of 4, one attn each
    assert out.shape == (2, 9, 4, 4)


def test_multiple_attention_pooling_is_attention_weighted_sum():
    B, M, k, H, W = 2, 3, 2, 4, 4
    fm = jax.random.normal(jax.random.PRNGKey(6), (B, M * (k + 1), H, W))
    out = multiple_attention_pooling_2d(fm, M)
    assert out.shape == (B, M * k, 1, 1)
    # manual check for group 0, channel 0
    grouped = np.asarray(fm).reshape(B, M, k + 1, H * W)
    att = np.exp(grouped[:, 0, -1]) / np.exp(grouped[:, 0, -1]).sum(-1,
                                                                    keepdims=True)
    want = (grouped[:, 0, 0] * att).sum(-1)
    np.testing.assert_allclose(np.asarray(out[:, 0, 0, 0]), want, rtol=1e-4)
