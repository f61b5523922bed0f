"""Numerically-guarded math primitives.

Behavioral parity with the reference's ``torch_scae/math_ops.py``
(log floor at -1e8 below eps=1e-16: math_ops.py:18-22; normalize eps 1e-8:
math_ops.py:29-30; l2 = sum(x^2)/2: math_ops.py:33-34) and ``nn_ext.relu1``
(= relu6(6x)/6: nn_ext.py:139-140), re-implemented as pure jnp functions.
"""

import jax.numpy as jnp


def log_safe(x, eps: float = 1e-16):
    """log(x) with values below ``eps`` mapped to -1e8 (never -inf/NaN).

    The where-inside-where pattern keeps gradients finite: the masked-out
    branch computes log(1)=0 so no NaN flows back through the zero branch.
    """
    is_small = x < eps
    safe_x = jnp.where(is_small, jnp.ones_like(x), x)
    return jnp.where(is_small, jnp.full_like(x, -1e8), jnp.log(safe_x))


def cross_entropy_safe(true_probs, probs, axis: int = -1):
    """Mean over leading dims of -sum(true_probs * log_safe(probs), axis)."""
    return jnp.mean(-jnp.sum(true_probs * log_safe(probs), axis=axis))


def normalize(x, axis):
    """x / (sum(x, axis) + 1e-8), keeping dims."""
    return x / (jnp.sum(x, axis=axis, keepdims=True) + 1e-8)


def l2_loss(x):
    """sum(x**2) / 2."""
    return jnp.sum(jnp.square(x)) / 2


def relu1(x):
    """Saturating ReLU in [0, 1]: relu6(x*6)/6 == clip(x, 0, 1)."""
    return jnp.clip(x, 0.0, 1.0)
