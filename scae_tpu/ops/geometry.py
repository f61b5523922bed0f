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
        out = affine_to_matrix(out)

    return out


def affine_to_matrix(flat: jax.Array) -> jax.Array:
    """[..., 6] row-major 2x3 affine -> [..., 3, 3] homogeneous matrix."""
    mat2x3 = flat.reshape(*flat.shape[:-1], 2, 3)
    last = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dtype=flat.dtype),
        (*flat.shape[:-1], 1, 3),
    )
    return jnp.concatenate([mat2x3, last], axis=-2)


def compose_affines(outer: jax.Array, inner: jax.Array) -> jax.Array:
    """Compose two [..., 6] flat affines: matrix(out) = matrix(outer) @
    matrix(inner), returned flat. Broadcasts like the matmul would.

    Elementwise on the 6 coefficients instead of a [..., 3, 3] matmul:
    XLA lowers batched 3x3 matmuls on TPU as padded convolutions with
    layout copies on both operands (measured ~150 us/step of the OCAE
    vote chain at the flagship shape); 12 fused multiply-adds cost
    nothing. Same floating-point values — the matmul's extra terms
    multiply the constant 0/1 homogeneous row.
    """
    a1, b1, tx1, c1, d1, ty1 = jnp.split(outer, 6, axis=-1)
    a2, b2, tx2, c2, d2, ty2 = jnp.split(inner, 6, axis=-1)
    return jnp.concatenate([
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        a1 * tx2 + b1 * ty2 + tx1,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        c1 * tx2 + d1 * ty2 + ty1,
    ], axis=-1)
