"""Fused template-decoder reconstruction log-likelihood with a
hand-derived minimal-bandwidth backward (jax.custom_vjp).

Why: the autodiff backward of warp -> GaussianMixture.log_prob
materializes ~14 copies of the (B, M, taps, H*W) tap-weight tensor in HBM
(~8 GB / step at the flagship config — measured via HLO inspection,
tools/hlo_decoder.py), making the decoder backward ~85% of the train step.
This implementation:

  * stores tap-weight tensors in bfloat16 (matmuls still accumulate
    f32) — tap weights are exact in bf16 whenever the bilinear fractions
    have <=8 significand bits and within ~3e-3 otherwise, far below the
    loss scale,
  * produces tap-sized intermediates directly in the tap dtype (an f32
    einsum + cast materializes each twice),
  * saves the forward's tap matrices Wx/Wy and partial products S/Sa as
    residuals and REUSES them in the backward (a recompute costs an
    extra write+read of each on a bandwidth-bound step), plus the small
    per-component values/logits (B, M, C, P),
  * computes exactly the minimal set of backward contractions (the
    cotangent-times-tap products U/Ua serve both the template grads and
    the tap-weight grads).

Math. With components m = 1..M (warped templates) + background:
    value_m[c,p]  = sum_{h,w} T_m[c,h,w] * Wy_m[h,p] * Wx_m[w,p]
    alogit_m[p]   = sum_{h,w} A_m[h,w]   * Wy_m[h,p] * Wx_m[w,p]
    mix_m[p]      = alogit_m[p] + log_safe(presence_m)
    lp_m[c,p]     = -(t[c,p]-value_m[c,p])^2/(2 s^2) - log s - log sqrt(2pi)
    ll[c,p]       = LSE_m(mix_m[p] + lp_m[c,p]) - LSE_m(mix_m[p])
Backward (g = dL/dll):
    q_m[c,p] = exp(mix+lp-num_lse),  r_m[p] = exp(mix-den_lse)
    d/dvalue_m = g * q_m * (t-value)/s^2
    d/dmix_m   = sum_c g*q_m - (sum_c g) * r_m
then the warp transposes via Wx/Wy and the pose chain through
    Wx[w,p] = relu(1-|ix[p]-w|),  dWx/dix = -sign(ix-w)*1{|ix-w|<1}
    ix[p] = ((a*x_p + b*y_p + tx + 1)*Wt - 1)/2.

Covers the reference decoder's default mode (use_alpha_channel=True,
learned/provided background, scalar output scale;
reference part_decoder.py:152-243). Parity: tests/test_decoder_ll.py
checks value + all gradients against the unfused XLA path.
"""

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from scae_tpu.ops.math_ops import log_safe
from scae_tpu.ops.warp import _base_grid

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def _grids(out_size, dtype):
    gx, gy = _base_grid(out_size, dtype)
    return gx.reshape(-1), gy.reshape(-1)  # (P,), (P,)


def _coords(pose, template_size, out_size):
    """ix, iy (..., P) plus the normalized grid (P,)."""
    Ht, Wt = template_size
    gx, gy = _grids(out_size, pose.dtype)
    a, b, tx, c, d, ty = [pose[..., i] for i in range(6)]
    sx = a[..., None] * gx + b[..., None] * gy + tx[..., None]
    sy = c[..., None] * gx + d[..., None] * gy + ty[..., None]
    ix = ((sx + 1.0) * Wt - 1.0) * 0.5
    iy = ((sy + 1.0) * Ht - 1.0) * 0.5
    return ix, iy, gx, gy


def _taps(ix, n, dtype):
    """relu(1 - |ix - w|) -> (..., n, P) in dtype (taps 2nd-to-last)."""
    w = jnp.arange(n, dtype=ix.dtype)[:, None]
    return jnp.maximum(0.0, 1.0 - jnp.abs(ix[..., None, :] - w)).astype(dtype)


def _dtaps(ix, n, dtype):
    """dW/dix = -sign(ix - w) * 1{|ix - w| < 1} -> (..., n, P).

    Values are exactly representable in bf16 (±1/0), so the tap dtype is
    lossless here and halves a (B, M, taps, P)-sized tensor.
    """
    w = jnp.arange(n, dtype=ix.dtype)[:, None]
    diff = ix[..., None, :] - w
    return jnp.where(jnp.abs(diff) < 1.0, -jnp.sign(diff),
                     0.0).astype(dtype)


def _warp_values(templates, alpha, Wx, Wy):
    """(V, Alogit): (B,M,C,P) and (B,M,P); final outputs f32.

    Intermediates that get consumed in tap dtype are PRODUCED in tap
    dtype (no preferred_element_type): an f32 einsum output followed by a
    bf16 cast materializes the (B,M,taps,P)-sized tensor twice — measured
    as the single largest HBM cost of the train step (tools/step_cost.py).
    """
    tap = Wx.dtype
    S = jnp.einsum("bmchw,bmwp->bmchp", templates.astype(tap), Wx)
    V = jnp.einsum("bmchp,bmhp->bmcp", S, Wy,
                   preferred_element_type=jnp.float32)
    Sa = jnp.einsum("bmhw,bmwp->bmhp", alpha.astype(tap), Wx)
    Alogit = jnp.einsum("bmhp,bmhp->bmp", Sa, Wy,
                        preferred_element_type=jnp.float32)
    return V, Alogit, S, Sa


def _mixture_ll(V, Alogit, presence, bg_value, bg_mixing_logit, scale,
                target_flat):
    """Shared tail: per-pixel ll + LSE terms.

    target_flat: (B, C, P). Returns (ll, num_lse, den_lse, lp_bg).
    """
    inv_2var = 1.0 / (2.0 * scale * scale)
    log_scale = jnp.log(scale)

    mix = Alogit + log_safe(presence)[..., None]           # (B, M, P)
    mix_bg = jnp.broadcast_to(bg_mixing_logit, mix.shape[:1] + (1,)
                              + mix.shape[2:])             # (B, 1, P)

    def lp_of(v):
        d = target_flat[:, None] - v                        # (B, M, C, P)
        return -(d * d) * inv_2var - log_scale - _LOG_SQRT_2PI

    lp = lp_of(V)                                           # (B, M, C, P)
    lp_bg = lp_of(jnp.broadcast_to(
        bg_value, V.shape[:1] + (1,) + V.shape[2:]))        # (B, 1, C, P)

    num_terms = jnp.concatenate(
        [mix[:, :, None] + lp, mix_bg[:, :, None] + lp_bg], axis=1)
    den_terms = jnp.concatenate([mix, mix_bg], axis=1)      # (B, M+1, P)
    num_lse = jax.nn.logsumexp(num_terms, axis=1)           # (B, C, P)
    den_lse = jax.nn.logsumexp(den_terms, axis=1)           # (B, P)
    ll = num_lse - den_lse[:, None]                         # (B, C, P)
    return ll, num_lse, den_lse, mix, lp, mix_bg, lp_bg


def _forward(templates, alpha, pose, presence, bg_value, bg_mixing_logit,
             scale, target, out_size, tap_dtype):
    B, M, C, Ht, Wt = templates.shape
    H, W = out_size
    P = H * W
    ix, iy, _, _ = _coords(pose, (Ht, Wt), out_size)
    Wx = _taps(ix, Wt, tap_dtype)
    Wy = _taps(iy, Ht, tap_dtype)
    alpha_b = jnp.broadcast_to(alpha[:, :, 0], (B, M, Ht, Wt))
    V, Alogit, S, Sa = _warp_values(templates, alpha_b, Wx, Wy)
    tgt = target.reshape(B, C, P)
    ll, num_lse, den_lse, *_ = _mixture_ll(
        V, Alogit, presence, bg_value, bg_mixing_logit, scale, tgt)
    return ll.reshape(B, C, H, W), (V, Alogit, num_lse, den_lse,
                                    Wx, Wy, S, Sa)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_decoder_ll(templates, alpha, pose, presence, bg_value,
                     bg_mixing_logit, scale, target,
                     out_size: Tuple[int, int], tap_dtype=jnp.bfloat16):
    """Per-pixel reconstruction mixture log-likelihood (B, C, H, W).

    Args mirror TemplateBasedImageDecoder internals AFTER their
    nonlinearities: bg_value = sigmoid(bg_param) (or a scalar), and
    bg_mixing_logit = softplus(bg_mix_param); scale is the final scalar.
    alpha: (1 or B, M, 1, Ht, Wt) alpha-channel logits.
    """
    ll, _ = _forward(templates, alpha, pose, presence, bg_value,
                     bg_mixing_logit, scale, target, out_size, tap_dtype)
    return ll


def _fwd(templates, alpha, pose, presence, bg_value, bg_mixing_logit,
         scale, target, out_size, tap_dtype):
    ll, saved = _forward(templates, alpha, pose, presence, bg_value,
                         bg_mixing_logit, scale, target, out_size,
                         tap_dtype)
    V, Alogit, num_lse, den_lse, Wx, Wy, S, Sa = saved
    residuals = (templates, alpha, pose, presence, bg_value,
                 bg_mixing_logit, scale, target, V, Alogit, num_lse,
                 den_lse, Wx, Wy, S, Sa)
    return ll, residuals


def _bwd(out_size, tap_dtype, residuals, g):
    (templates, alpha, pose, presence, bg_value, bg_mixing_logit, scale,
     target, V, Alogit, num_lse, den_lse, Wx, Wy, S, Sa) = residuals
    B, M, C, Ht, Wt = templates.shape
    H, W = out_size
    P = H * W
    g = g.reshape(B, C, P)                                  # dL/dll
    tgt = target.reshape(B, C, P)

    inv_2var = 1.0 / (2.0 * scale * scale)
    log_scale = jnp.log(scale)
    presq = log_safe(presence)

    # taps Wx/Wy and the partial products S/Sa are fwd residuals (saved,
    # not recomputed: this path is HBM-bandwidth bound and a recompute
    # costs an extra write+read of each tap-sized tensor); only the cheap
    # (B, M, P) source coordinates are recomputed for the tap derivative
    ix, iy, gx, gy = _coords(pose, (Ht, Wt), out_size)

    mix = Alogit + presq[..., None]                         # (B, M, P)
    diff = tgt[:, None] - V                                 # (B, M, C, P)
    lp = -(diff * diff) * inv_2var - log_scale - _LOG_SQRT_2PI
    q = jnp.exp(mix[:, :, None] + lp - num_lse[:, None])    # (B, M, C, P)
    r = jnp.exp(mix - den_lse[:, None])                     # (B, M, P)

    gq = g[:, None] * q                                     # (B, M, C, P)
    g_sum_c = jnp.sum(g, axis=1)                            # (B, P)

    # --- component-parameter grads
    gV = gq * diff * (2.0 * inv_2var)                       # (B, M, C, P)
    gmix = jnp.sum(gq, axis=2) - g_sum_c[:, None] * r       # (B, M, P)

    # background component
    diff_bg = tgt - bg_value                                # (B, C, P)
    lp_bg = -(diff_bg * diff_bg) * inv_2var - log_scale - _LOG_SQRT_2PI
    q_bg = jnp.exp(bg_mixing_logit + lp_bg - num_lse)       # (B, C, P)
    r_bg = jnp.exp(bg_mixing_logit - den_lse)               # (B, P)
    gq_bg = g * q_bg
    g_bg_value = jnp.sum(gq_bg * diff_bg) * 2.0 * inv_2var
    g_bg_mix = jnp.sum(gq_bg) - jnp.sum(g_sum_c * r_bg)

    # scale grad: dlp/dscale = (diff^2)/s^3 - 1/s for every component
    g_scale = (jnp.sum(gq * (diff * diff)) + jnp.sum(gq_bg * (diff_bg
                                                              * diff_bg))) \
        / (scale ** 3) - (jnp.sum(gq) + jnp.sum(gq_bg)) / scale

    # presence grad through log_safe (derivative 1/p where p >= eps)
    g_presq = jnp.sum(gmix, axis=-1)                        # (B, M)
    g_presence = jnp.where(presence < 1e-16, 0.0, g_presq / presence)

    # target grad: lp = -(t-v)^2*inv_2var - ...; dlp/dt = -2*(t-v)*inv_2var
    g_target = ((jnp.sum(gq * diff, axis=1) + gq_bg * diff_bg)
                * (-2.0 * inv_2var)).reshape(B, C, H, W)

    # --- warp transposes (tap dtype, f32 accumulation)
    gV_t = gV.astype(tap_dtype)
    gmix_t = gmix.astype(tap_dtype)

    # g_T[c,h,w] = sum_p gV * Wy_h * Wx_w.
    # (B, M, taps, P)-sized intermediates are produced directly in the
    # tap dtype — an f32 einsum + cast would materialize them twice
    # (tools/step_cost.py); the small (B, M, ..., taps, taps) gradient
    # outputs keep f32 accumulation.
    U = jnp.einsum("bmcp,bmhp->bmchp", gV_t, Wy)            # tap dtype
    g_templates = jnp.einsum("bmchp,bmwp->bmchw", U, Wx,
                             preferred_element_type=jnp.float32)
    Ua = gmix_t[:, :, None] * Wy                            # (B, M, Ht, P)
    g_alpha_full = jnp.einsum("bmhp,bmwp->bmhw", Ua, Wx,
                              preferred_element_type=jnp.float32)
    # alpha may be broadcast over batch: reduce to its true shape
    if alpha.shape[0] == 1:
        g_alpha = jnp.sum(g_alpha_full, axis=0, keepdims=True)[:, :, None]
    else:
        g_alpha = g_alpha_full[:, :, None]

    # g_Wx[w,p] = sum_{c,h} gV*T*Wy + gmix*A*Wy  (then chain to ix).
    # Reuses U/Ua (= cotangent x Wy) from the template-grad path and
    # contracts them against the SMALL template/alpha tensors, instead of
    # building separate T(x)Wy / A(x)Wy tap-sized products — two fewer
    # (B, M, taps, P) materializations on a bandwidth-bound step.
    T_t = templates.astype(tap_dtype)
    alpha_t = jnp.broadcast_to(alpha[:, :, 0], (B, M, Ht, Wt)) \
        .astype(tap_dtype)
    g_Wx = jnp.einsum("bmchp,bmchw->bmwp", U, T_t) \
        + jnp.einsum("bmhp,bmhw->bmwp", Ua, alpha_t)
    g_ix = jnp.sum(g_Wx * _dtaps(ix, Wt, tap_dtype), axis=2,
                   dtype=jnp.float32)                       # (B, M, P)

    # g_Wy reuses the FORWARD partial products: S = T(x)Wx and
    # Sa = A(x)Wx, so no new tap-sized tensors are built at all:
    # g_Wy[h,p] = sum_cw gV*T*Wx = sum_c gV[c,p]*S[c,h,p];
    # alpha part = gmix[p]*Sa[h,p].
    g_Wy = jnp.einsum("bmcp,bmchp->bmhp", gV_t, S) \
        + gmix_t[:, :, None] * Sa
    g_iy = jnp.sum(g_Wy * _dtaps(iy, Ht, tap_dtype), axis=2,
                   dtype=jnp.float32)                       # (B, M, P)

    # pose chain: ix = ((a x + b y + tx + 1) Wt - 1)/2
    cx = 0.5 * Wt
    cy = 0.5 * Ht
    g_a = jnp.einsum("bmp,p->bm", g_ix, gx) * cx
    g_b = jnp.einsum("bmp,p->bm", g_ix, gy) * cx
    g_tx = jnp.sum(g_ix, axis=-1) * cx
    g_c = jnp.einsum("bmp,p->bm", g_iy, gx) * cy
    g_d = jnp.einsum("bmp,p->bm", g_iy, gy) * cy
    g_ty = jnp.sum(g_iy, axis=-1) * cy
    g_pose = jnp.stack([g_a, g_b, g_tx, g_c, g_d, g_ty], axis=-1)

    def like(g, ref):
        # scalar-valued grads may carry a stray (1,) from broadcasting
        # against (1,)-shaped params; total size always matches ref's
        return jnp.asarray(g, jnp.float32).reshape(jnp.shape(ref))

    return (g_templates, g_alpha, g_pose, g_presence,
            like(g_bg_value, bg_value), like(g_bg_mix, bg_mixing_logit),
            like(g_scale, scale), g_target)


fused_decoder_ll.defvjp(_fwd, _bwd)
