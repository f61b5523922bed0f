"""Attention-weighted pooling primitives.

Parity targets: reference ``torch_scae/nn_ext.py:62-125``. Each of M
capsules owns a contiguous channel group whose last channel is an attention
logit; a softmax over pixels of that logit weights the remaining channels,
which are then summed over pixels.

Interfaces use NCHW to match the reference's tensors; everything lowers to
reshapes + softmax + one reduction, which XLA fuses into a single pass.
"""

import jax
import jax.numpy as jnp


def soft_attention(feature_map, attention_map):
    """Weight feature_map (B,C,H,W) by softmax-over-pixels of attention_map (B,1,H,W)."""
    B, C, H, W = feature_map.shape
    fm = feature_map.reshape(B, C, -1)
    am = attention_map.reshape(B, 1, -1)
    mask = jax.nn.softmax(am, axis=-1)
    return (fm * mask).reshape(B, C, H, W)


def multiple_soft_attention(feature_map, n_attention_map):
    """Per-group soft attention (reference nn_ext.py:76-93).

    feature_map: (B, C, H, W) with C = n_attention_map * (k+1); the last
    channel of each group of (k+1) is the attention logit.

    Returns (B, C - n_attention_map, H, W).
    """
    B, C, H, W = feature_map.shape
    A = n_attention_map
    assert A > 0 and C > A and C % A == 0, "Incompatible attention map count"
    fm = feature_map.reshape(B, A, C // A, H * W)
    real, att = fm[:, :, :-1, :], fm[:, :, -1:, :]
    mask = jax.nn.softmax(att, axis=-1)
    out = real * mask
    return out.reshape(B, C - A, H, W)


def multiple_attention_pooling_2d(feature_map, n_attention_map):
    """Attention-weighted global pooling (reference nn_ext.py:96-101).

    Returns (B, C - n_attention_map, 1, 1).
    """
    x = multiple_soft_attention(feature_map, n_attention_map)
    B, C = x.shape[:2]
    return jnp.sum(x.reshape(B, C, -1), axis=-1)[..., None, None]


def attention_pooling_2d_explicit(feature_map, attention_map):
    """Pool feature_map (B,C,H,W) by an explicit attention map (B,1,H,W)
    (reference nn_ext.py:104-109). Returns (B, C, 1, 1)."""
    x = soft_attention(feature_map, attention_map)
    B, C = x.shape[:2]
    return jnp.sum(x.reshape(B, C, -1), axis=-1)[..., None, None]


def attention_pooling_2d(feature_map, attention_channel_index):
    """Pool using one channel of feature_map as the attention logit
    (reference nn_ext.py:112-125). Returns (B, C-1, 1, 1)."""
    B, C, H, W = feature_map.shape
    i = attention_channel_index % C
    attention_map = feature_map[:, i:i + 1]
    real = jnp.concatenate([feature_map[:, :i], feature_map[:, i + 1:]],
                           axis=1)
    return attention_pooling_2d_explicit(real, attention_map)
