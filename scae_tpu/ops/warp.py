"""TPU-native affine template warping (matmul-form bilinear resampling).

Replaces the reference's gather-based ``F.affine_grid`` + ``F.grid_sample``
pipeline (``torch_scae/part_decoder.py:179-183``, align_corners=False,
zero padding) with a formulation that maps onto the MXU:

For an affine warp of a small template T (Ht x Wt) onto an output canvas of
P = H*W pixels, the bilinearly-sampled value at output pixel p is a bilinear
form in two *weight matrices*::

    out[p] = sum_a sum_b  Wy[p, a] * T[a, b] * Wx[p, b]
           = rowsum( (Wx @ T^T) * Wy )

where ``Wx[p, b] = relu(1 - |ix(p) - b|)`` and ``Wy[p, a] =
relu(1 - |iy(p) - a|)`` are the (at most 2-nonzero-per-row) bilinear tap
weights, and (ix, iy) are the source coordinates of pixel p under the
affine map. Because out-of-range taps simply receive zero weight, PyTorch's
``padding_mode='zeros'`` semantics fall out for free.

This turns the warp into dense (P x Wt) @ (Wt x C*Ht) matmuls + an
elementwise reduce — no gathers, no dynamic indexing, fully fusible by XLA
and trivially batchable over (B, M) template instances.

Coordinate conventions match ``F.affine_grid``/``F.grid_sample`` with
``align_corners=False``:
  base grid      x_j = (2j+1)/W_out - 1,   y_i = (2i+1)/H_out - 1
  source coords  gx  = a*x + b*y + tx,     gy  = c*x + d*y + ty
  pixel coords   ix  = ((gx+1)*Wt - 1)/2,  iy = ((gy+1)*Ht - 1)/2
"""

from functools import partial

import jax
import jax.numpy as jnp


def _base_grid(out_size, dtype=jnp.float32):
    """Normalized output pixel-center coordinates, shapes (H, W) each."""
    H, W = out_size
    xs = (2.0 * jnp.arange(W, dtype=dtype) + 1.0) / W - 1.0  # (W,)
    ys = (2.0 * jnp.arange(H, dtype=dtype) + 1.0) / H - 1.0  # (H,)
    gx = jnp.broadcast_to(xs[None, :], (H, W))
    gy = jnp.broadcast_to(ys[:, None], (H, W))
    return gx, gy


def source_coordinates(pose, template_size, out_size):
    """Per-output-pixel source pixel coordinates under the affine map.

    Returns (ix, iy): ([..., P], [..., P]) in input-pixel units
    (align_corners=False convention).
    """
    Ht, Wt = template_size
    H, W = out_size
    dtype = pose.dtype

    gx, gy = _base_grid((H, W), dtype)          # (H, W) each
    gx = gx.reshape(-1)                          # (P,)
    gy = gy.reshape(-1)

    a, b, tx, c, d, ty = [pose[..., i] for i in range(6)]
    sx = a[..., None] * gx + b[..., None] * gy + tx[..., None]
    sy = c[..., None] * gx + d[..., None] * gy + ty[..., None]

    ix = ((sx + 1.0) * Wt - 1.0) * 0.5           # [..., P]
    iy = ((sy + 1.0) * Ht - 1.0) * 0.5
    return ix, iy


def bilinear_weight_matrices(pose, template_size, out_size):
    """Compute the bilinear tap-weight matrices for an affine warp.

    TPU layout note: the tap axis (size Wt/Ht, typically ~11) sits
    SECOND-TO-LAST and the pixel axis (H*W) LAST, so the physical lane
    dimension is the large one — a taps-last layout would get padded to
    128 lanes (>10x memory/bandwidth bloat for 11-tap templates).

    Args:
      pose: [..., 6] flat affine rows (a, b, tx, c, d, ty) — the layout
        the reference feeds to ``F.affine_grid`` (part_decoder.py:176).
      template_size: (Ht, Wt) of the source template.
      out_size: (H, W) of the output canvas.

    Returns:
      (Wx, Wy): ([..., Wt, H*W], [..., Ht, H*W]) weight matrices.
    """
    Ht, Wt = template_size
    dtype = pose.dtype
    ix, iy = source_coordinates(pose, template_size, out_size)

    cols = jnp.arange(Wt, dtype=dtype)[:, None]   # (Wt, 1)
    rows = jnp.arange(Ht, dtype=dtype)[:, None]   # (Ht, 1)
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(ix[..., None, :] - cols))
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy[..., None, :] - rows))
    return Wx, Wy


@partial(jax.named_call, name="affine_warp")
def affine_warp(templates, pose, out_size):
    """Warp templates onto the output canvas under per-template affine poses.

    Args:
      templates: [..., C, Ht, Wt] source templates (any leading batch dims).
      pose: [..., 6] flat affine transforms (same leading dims).
      out_size: (H, W) output size.

    Returns:
      [..., C, H, W] warped templates (zero padding outside the source).
    """
    *lead, C, Ht, Wt = templates.shape
    H, W = out_size
    Wx, Wy = bilinear_weight_matrices(pose, (Ht, Wt), (H, W))
    # pixels stay in the (last) lane axis throughout:
    # S[..., c, h, p] = sum_w T[..., c, h, w] * Wx[..., w, p]
    S = jnp.einsum("...chw,...wp->...chp", templates, Wx)
    # out[..., c, p] = sum_h S[..., c, h, p] * Wy[..., h, p]
    out = jnp.einsum("...chp,...hp->...cp", S, Wy)
    return out.reshape(*lead, C, H, W)
