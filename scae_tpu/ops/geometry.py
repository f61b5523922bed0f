"""Pose-vector -> affine/similarity transform.

Parity target: reference ``torch_scae/cv_ops.py:20-76`` (nonlinearity
constants sigmoid+1e-2 for scales, tanh(5x) for translations/shear,
theta*2pi; affine row-major [a b tx; c d ty]; optional homogeneous 3x3).
"""

import jax
import jax.numpy as jnp


def geometric_transform(pose, similarity: bool = False, nonlinear: bool = True,
                        as_matrix: bool = False):
    """Convert a [..., 6] pose tensor into an affine or similarity transform.

    Args:
      pose: [..., 6] array ordered (scale_x, scale_y, theta, shear, tx, ty).
      similarity: use a 4-parameter similarity transform (ignores scale_y,
        shear) if True.
      nonlinear: squash parameters through the reference nonlinearities.
      as_matrix: return [..., 3, 3] homogeneous matrices instead of [..., 6].

    Returns:
      [..., 6] flat transform (row-major 2x3) or [..., 3, 3] matrix.
    """
    scale_x, scale_y, theta, shear, trans_x, trans_y = jnp.split(pose, 6, axis=-1)

    if nonlinear:
        scale_x = jax.nn.sigmoid(scale_x) + 1e-2
        scale_y = jax.nn.sigmoid(scale_y) + 1e-2
        trans_x = jnp.tanh(trans_x * 5.0)
        trans_y = jnp.tanh(trans_y * 5.0)
        shear = jnp.tanh(shear * 5.0)
        theta = theta * (2.0 * jnp.pi)
    else:
        scale_x = jnp.abs(scale_x) + 1e-2
        scale_y = jnp.abs(scale_y) + 1e-2

    c, s = jnp.cos(theta), jnp.sin(theta)

    if similarity:
        scale = scale_x
        flat = [scale * c, -scale * s, trans_x,
                scale * s, scale * c, trans_y]
    else:
        flat = [
            scale_x * c + shear * scale_y * s,
            -scale_x * s + shear * scale_y * c,
            trans_x,
            scale_y * s,
            scale_y * c,
            trans_y,
        ]

    out = jnp.concatenate(flat, axis=-1)

    if as_matrix:
        mat2x3 = out.reshape(*out.shape[:-1], 2, 3)
        last = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], dtype=out.dtype),
            (*out.shape[:-1], 1, 3),
        )
        out = jnp.concatenate([mat2x3, last], axis=-2)

    return out
