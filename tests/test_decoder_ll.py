"""Parity of the fused decoder log-likelihood (custom VJP) vs the unfused
warp + GaussianMixture path, for values and every gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scae_tpu.ops.decoder_ll import fused_decoder_ll
from scae_tpu.ops.gmm import GaussianMixture
from scae_tpu.ops.math_ops import log_safe
from scae_tpu.ops.warp import affine_warp

B, M, C, TS, OS = 3, 5, 1, (5, 5), (12, 12)


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    templates = jnp.asarray(rng.rand(B, M, C, *TS), jnp.float32)
    alpha = jnp.asarray(rng.randn(1, M, 1, *TS) * 0.5, jnp.float32)
    pose = jnp.asarray(rng.randn(B, M, 6) * 0.3
                       + np.asarray([1, 0, 0, 0, 1, 0]), jnp.float32)
    presence = jnp.asarray(rng.rand(B, M), jnp.float32)
    bg_value = jnp.float32(0.3)
    bg_mix = jnp.float32(0.7)
    scale = jnp.float32(1.0)
    target = jnp.asarray(rng.rand(B, C, *OS), jnp.float32)
    return templates, alpha, pose, presence, bg_value, bg_mix, scale, target


def _unfused_ll(templates, alpha, pose, presence, bg_value, bg_mix, scale,
                target):
    """The model's decoder math (part_decoder.py) expressed directly."""
    Bs, Ms, Cs = templates.shape[:3]
    H, W = OS
    both = jnp.concatenate(
        [templates, jnp.broadcast_to(alpha, (Bs, Ms, 1, *TS))], axis=2)
    warped = affine_warp(both, pose, OS)
    values, alogit = warped[:, :, :Cs], warped[:, :, Cs:]

    mix = alogit + log_safe(presence)[..., None, None, None]
    mix_bg = jnp.broadcast_to(bg_mix, (Bs, 1, 1, H, W))
    mixing_logits = jnp.concatenate([mix, mix_bg], axis=1)

    bg = jnp.broadcast_to(bg_value, (Bs, 1, Cs, H, W))
    locs = jnp.concatenate([values, bg], axis=1)
    pdf = GaussianMixture.make_from_stats(locs, scale, mixing_logits)
    return pdf.log_prob(target)


def test_value_parity_f32_taps():
    args = _inputs()
    got = fused_decoder_ll(*args, OS, jnp.float32)
    want = _unfused_ll(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_value_close_bf16_taps():
    args = _inputs()
    got = fused_decoder_ll(*args, OS, jnp.bfloat16)
    want = _unfused_ll(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=5e-2)


@pytest.mark.parametrize("argnum,name,tol", [
    (0, "templates", 2e-4),
    (1, "alpha", 2e-4),
    (2, "pose", 5e-3),
    (3, "presence", 2e-4),
    (4, "bg_value", 5e-3),
    (5, "bg_mixing_logit", 5e-3),
    (6, "scale", 1e-2),
    (7, "target", 2e-4),
])
def test_gradient_parity_f32_taps(argnum, name, tol):
    if jax.default_backend() == "tpu":
        # real-TPU einsum reassociation (6-pass f32 vs fused orderings)
        # adds ~1e-3 relative spread the CPU run doesn't have
        tol = max(tol, 2e-3)
    args = _inputs(seed=1)

    def fused_sum(*a):
        return jnp.sum(fused_decoder_ll(*a, OS, jnp.float32)
                       * jnp.linspace(0.5, 1.5, B)[:, None, None, None])

    def unfused_sum(*a):
        return jnp.sum(_unfused_ll(*a)
                       * jnp.linspace(0.5, 1.5, B)[:, None, None, None])

    g_fused = jax.grad(fused_sum, argnums=argnum)(*args)
    g_unfused = jax.grad(unfused_sum, argnums=argnum)(*args)
    scale_ref = max(float(jnp.max(jnp.abs(g_unfused))), 1e-6)
    np.testing.assert_allclose(
        np.asarray(g_fused) / scale_ref, np.asarray(g_unfused) / scale_ref,
        rtol=tol, atol=tol, err_msg=name)


def test_gradients_work_under_jit_and_vmapless_batch():
    args = _inputs(seed=2)

    @jax.jit
    def loss(templates, pose):
        ll = fused_decoder_ll(templates, args[1], pose, *args[3:], OS,
                              jnp.float32)
        return jnp.mean(jnp.sum(ll.reshape(B, -1), -1))

    g1, g2 = jax.grad(loss, argnums=(0, 1))(args[0], args[2])
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()
