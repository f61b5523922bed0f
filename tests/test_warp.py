"""Tests for the matmul-form bilinear affine warp.

Includes a direct numpy re-derivation of F.affine_grid/F.grid_sample
(align_corners=False, zero padding) semantics as an independent oracle;
exact parity against torch itself is covered by the golden-value tests.
"""

import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.ops.warp import affine_warp, bilinear_weight_matrices


def _reference_warp_numpy(template, pose, out_size):
    """Naive per-pixel bilinear warp oracle (align_corners=False, zeros)."""
    C, Ht, Wt = template.shape
    H, W = out_size
    a, b, tx, c, d, ty = pose
    out = np.zeros((C, H, W), np.float64)
    for i in range(H):
        for j in range(W):
            x = (2 * j + 1) / W - 1
            y = (2 * i + 1) / H - 1
            gx = a * x + b * y + tx
            gy = c * x + d * y + ty
            ix = ((gx + 1) * Wt - 1) / 2
            iy = ((gy + 1) * Ht - 1) / 2
            i0, j0 = int(np.floor(iy)), int(np.floor(ix))
            for di in (0, 1):
                for dj in (0, 1):
                    ii, jj = i0 + di, j0 + dj
                    w = max(0.0, 1 - abs(iy - ii)) * max(0.0, 1 - abs(ix - jj))
                    if 0 <= ii < Ht and 0 <= jj < Wt and w > 0:
                        out[:, i, j] += w * template[:, ii, jj]
    return out


def test_identity_warp_upsamples_center():
    # identity transform maps template onto full canvas
    t = jax.random.uniform(jax.random.PRNGKey(0), (1, 1, 2, 8, 8))
    pose = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0]).reshape(1, 1, 6)
    out = affine_warp(t, pose, (8, 8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(t), atol=1e-5)


def test_matches_naive_oracle_random_poses():
    rng = np.random.RandomState(0)
    for _ in range(4):
        template = rng.rand(2, 5, 7).astype(np.float32)
        pose = np.array([
            rng.uniform(0.3, 2.0), rng.uniform(-0.5, 0.5), rng.uniform(-1, 1),
            rng.uniform(-0.5, 0.5), rng.uniform(0.3, 2.0), rng.uniform(-1, 1),
        ], np.float32)
        want = _reference_warp_numpy(template, pose, (9, 11))
        got = affine_warp(template[None, None], pose[None, None].reshape(1, 1, 6),
                          (9, 11))[0, 0]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_weight_matrices_rows_sum_le_one():
    pose = jnp.asarray([[0.5, 0.1, 0.2, -0.1, 0.7, -0.3]])
    Wx, Wy = bilinear_weight_matrices(pose, (11, 11), (16, 16))
    # taps second-to-last, pixels last (TPU lane axis)
    assert Wx.shape == (1, 11, 256) and Wy.shape == (1, 11, 256)
    # bilinear taps sum to exactly 1 in-range, < 1 when clipped at borders
    assert float(jnp.max(jnp.sum(Wx, -2))) <= 1.0 + 1e-5
    assert float(jnp.max(jnp.sum(Wy, -2))) <= 1.0 + 1e-5


def test_gradients_flow_to_pose_and_template():
    t = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 1, 5, 5))
    pose = jnp.asarray([0.8, 0.0, 0.1, 0.0, 0.8, -0.1]).reshape(1, 1, 6)

    def loss(t, pose):
        return jnp.sum(affine_warp(t, pose, (12, 12)) ** 2)

    gt, gp = jax.grad(loss, argnums=(0, 1))(t, pose)
    assert np.isfinite(np.asarray(gt)).all()
    assert np.isfinite(np.asarray(gp)).all()
    assert float(jnp.abs(gp).sum()) > 0
