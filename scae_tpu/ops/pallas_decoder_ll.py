"""Single-kernel Pallas fused decoder reconstruction log-likelihood.

The XLA fused path (ops/decoder_ll.py) is HBM-bandwidth bound: even with
bf16 taps and residual reuse it moves ~6.6 GB/step of (B, M, taps, H*W)
tensors at the flagship config (BASELINE.md). This kernel keeps the entire
per-example working set in VMEM: tap weights are recomputed from the pose
inside the kernel, the warp, mixture and logsumexp never touch HBM, and the
only step-level traffic is the inputs (a few MB), the per-pixel ll, and the
two small LSE residuals.

Math is identical to ops/decoder_ll.py (which itself mirrors the reference
TemplateBasedImageDecoder + GaussianMixture.log_prob pipeline,
reference torch_scae/part_decoder.py:152-243, distributions.py:41-48):

    value_m[c,p] = sum_{h,w} T_m[c,h,w] * wy_m[h,p] * wx_m[w,p]
    alogit_m[p]  = sum_{h,w} A_m[h,w]   * wy_m[h,p] * wx_m[w,p]
    mix_m[p]     = alogit_m[p] + log_safe(presence_m)
    lp_m[c,p]    = -(t[c,p]-value_m[c,p])^2/(2 s^2) - log s - log sqrt(2pi)
    ll[c,p]      = LSE_{m,bg}(mix + lp) - LSE_{m,bg}(mix)

with wx_m[w,p] = relu(1 - |ix_m[p] - w|) (bilinear taps, zero padding free)
and ix from the affine pose in align_corners=False convention (ops/warp.py).

Kernel design notes (TPU, learned on real hardware):
  * grid = (B,): one program per example; M stays on sublanes, the pixel
    axis P = H*W on lanes — every vector op covers all M capsules at once.
  * loops over template rows run as ``lax.fori_loop`` (body traced ONCE):
    Mosaic allocates VMEM stack per *distinct value* in straight-line
    code, so a fully unrolled (Ht x Wt) nest blows the 16 MB budget with
    per-iteration temporaries it never reuses (measured: 28 MB+ OOM).
  * templates/alpha arrive pre-transposed as (B, Ht, M, C*Wt) so the
    fori index lands on a *leading* block dim (cheap dynamic index) and
    the per-(w) scalar extraction is a static lane slice.
  * no in-kernel full-array scalar reductions and no SMEM outputs (they
    serialize the grid pipeline): scalar-gradient *integrand rows* (1, P)
    leave the kernel as a (B, 3, P) output summed outside by XLA.
  * the backward recomputes taps/values in VMEM (compute is cheaper than
    any tap-sized HBM round trip) and reuses the forward's saved LSE
    tensors, mirroring the residual strategy of the XLA path.
"""

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scae_tpu.ops.warp import _base_grid

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)
_PRES_EPS = 1e-16  # log_safe floor (reference math_ops.py:18-22)

# perf-probe hook (tools/ab_pallas_ll.py --phases): names of backward
# sections to skip when timing phase costs. Never set in production.
_DEBUG_SKIP = frozenset()

# dtype of the backward's g_T/g_A MXU contractions. bfloat16 (default)
# matches the precision class of the XLA bench path's bf16 taps
# (BASELINE.md); float32 buys exact parity at ~3x MXU cost (6-pass f32).
MXU_DTYPE = jnp.bfloat16


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tap(coord, k):
    """Bilinear tap weight relu(1 - |coord - k|) for tap index k."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord - k))


def _dtap(coord, k):
    """d tap / d coord = -sign(coord - k) where |coord - k| < 1."""
    d = coord - k
    return jnp.where(jnp.abs(d) < 1.0, -jnp.sign(d), 0.0)


def _coords_mp(pose, gx, gy, Ht, Wt):
    """Source pixel coords (M, P) from pose (M, 6) and grid rows (1, P)."""
    sx = pose[:, 0:1] * gx + pose[:, 1:2] * gy + pose[:, 2:3]
    sy = pose[:, 3:4] * gx + pose[:, 4:5] * gy + pose[:, 5:6]
    ix = ((sx + 1.0) * Wt - 1.0) * 0.5
    iy = ((sy + 1.0) * Ht - 1.0) * 0.5
    return ix, iy


def _log_safe(x):
    is_small = x < _PRES_EPS
    safe = jnp.where(is_small, jnp.ones_like(x), x)
    return jnp.where(is_small, jnp.full_like(x, -1e8), jnp.log(safe))


def _warp_fori(T_ref, A_ref, wx, ix, iy, C, Ht, Wt,
               s_scr=None, sa_scr=None):
    """Warp all M templates: V_c (M, P) values + Alog (M, P) alpha logits.

    T_ref block: (1, Ht, M, C*Wt); A_ref block: (1, Ht, M, Wt); wx is the
    hoisted list of Wt tap planes (loop-invariant — rebuilding them per
    row costs ~40% of the kernel's VPU primitives). One fori_loop
    iteration per template row h. When ``s_scr``/``sa_scr`` VMEM scratch
    refs are given, the per-row partial products S/Sa are cached there for
    the backward's reuse (saves recomputing 2*Ht*Wt FMAs in pass 2).
    """

    def body(h, carry):
        V, Alog = carry
        hf = h.astype(ix.dtype)
        wyh = _tap(iy, hf)                              # (M, P)
        Th = T_ref[0, h]                                # (M, C*Wt)
        Ah = A_ref[0, h]                                # (M, Wt)
        s = [jnp.zeros_like(ix) for _ in range(C)]
        sa = jnp.zeros_like(ix)
        for w in range(Wt):
            for c in range(C):
                s[c] = s[c] + Th[:, c * Wt + w:c * Wt + w + 1] * wx[w]
            sa = sa + Ah[:, w:w + 1] * wx[w]
        if s_scr is not None:
            for c in range(C):
                s_scr[h, c] = s[c]
            sa_scr[h] = sa
        V = [V[c] + s[c] * wyh for c in range(C)]
        Alog = Alog + sa * wyh
        return V, Alog

    V0 = [jnp.zeros_like(ix) for _ in range(C)]
    return jax.lax.fori_loop(0, Ht, body, (V0, jnp.zeros_like(ix)))


def _fwd_kernel(T_ref, A_ref, pose_ref, pres_ref, tgt_ref, gx_ref, gy_ref,
                scal_ref, ll_ref, num_ref, den_ref, *, C, Ht, Wt):
    pose = pose_ref[0]                              # (M, 6)
    pres = pres_ref[0]                              # (M, 1)
    gx = gx_ref[:]                                  # (1, P)
    gy = gy_ref[:]
    bg_value = scal_ref[0, 0]
    bg_mix = scal_ref[0, 1]
    scale = scal_ref[0, 2]

    inv_2var = 1.0 / (2.0 * scale * scale)
    neg_const = -jnp.log(scale) - _LOG_SQRT_2PI

    ix, iy = _coords_mp(pose, gx, gy, Ht, Wt)
    wx = [_tap(ix, float(w)) for w in range(Wt)]    # hoisted tap planes
    V, Alog = _warp_fori(T_ref, A_ref, wx, ix, iy, C, Ht, Wt)

    mix = Alog + _log_safe(pres)                    # (M, P)
    dmx = jnp.maximum(jnp.max(mix, axis=0, keepdims=True),
                      jnp.full_like(mix[:1], bg_mix))
    dsum = (jnp.sum(jnp.exp(mix - dmx), axis=0, keepdims=True)
            + jnp.exp(bg_mix - dmx))
    den_lse = jnp.log(dsum) + dmx                   # (1, P)
    den_ref[0] = den_lse

    for c in range(C):
        tc = tgt_ref[0, c:c + 1, :]                 # (1, P)
        d = tc - V[c]
        lp = -(d * d) * inv_2var + neg_const        # (M, P)
        d_bg = tc - bg_value
        lp_bg = -(d_bg * d_bg) * inv_2var + neg_const
        terms = mix + lp
        mx = jnp.maximum(jnp.max(terms, axis=0, keepdims=True),
                         bg_mix + lp_bg)
        ssum = (jnp.sum(jnp.exp(terms - mx), axis=0, keepdims=True)
                + jnp.exp(bg_mix + lp_bg - mx))
        num_lse = jnp.log(ssum) + mx
        num_ref[0, c:c + 1, :] = num_lse
        ll_ref[0, c:c + 1, :] = num_lse - den_lse


def _bwd_kernel(T_ref, A_ref, pose_ref, pres_ref, tgt_ref, gx_ref, gy_ref,
                scal_ref, g_ref, num_ref, den_ref,
                gT_ref, gA_ref, gpose_ref, gpres_ref, gtgt_ref, grow_ref,
                s_scr, sa_scr, *, C, Ht, Wt):
    pose = pose_ref[0]
    pres = pres_ref[0]
    gx = gx_ref[:]
    gy = gy_ref[:]
    bg_value = scal_ref[0, 0]
    bg_mix = scal_ref[0, 1]
    scale = scal_ref[0, 2]

    inv_2var = 1.0 / (2.0 * scale * scale)
    neg_const = -jnp.log(scale) - _LOG_SQRT_2PI

    ix, iy = _coords_mp(pose, gx, gy, Ht, Wt)
    wx = [_tap(ix, float(w)) for w in range(Wt)]
    dwx = [_dtap(ix, float(w)) for w in range(Wt)]
    # pass 1: recompute the warp in VMEM (bandwidth-free; mirrors the XLA
    # path's residual strategy where only the small LSE tensors are
    # saved), caching the S/Sa row slices in scratch for pass 2
    if "pass1" in _DEBUG_SKIP:
        V, Alog = [ix for _ in range(C)], iy
    else:
        V, Alog = _warp_fori(T_ref, A_ref, wx, ix, iy, C, Ht, Wt,
                             s_scr=s_scr, sa_scr=sa_scr)
    presq = _log_safe(pres)
    mix = Alog + presq

    den_lse = den_ref[0]                             # (1, P)
    g = [g_ref[0, c:c + 1, :] for c in range(C)]     # C x (1, P)

    r = jnp.exp(mix - den_lse)                       # (M, P)
    r_bg = jnp.exp(bg_mix - den_lse)                 # (1, P)
    g_sum_c = g[0]
    for c in range(1, C):
        g_sum_c = g_sum_c + g[c]

    gV = []
    gmix = -(g_sum_c * r)                            # (M, P)
    gq_bg_sum = jnp.zeros_like(den_lse)
    g_bgv_row = jnp.zeros_like(den_lse)
    sq_row = jnp.zeros_like(den_lse)                 # sum gq*diff^2 terms
    q_row = jnp.zeros_like(den_lse)                  # sum gq terms
    for c in range(C):
        tc = tgt_ref[0, c:c + 1, :]
        num_lse = num_ref[0, c:c + 1, :]
        diff = tc - V[c]                             # (M, P)
        lp = -(diff * diff) * inv_2var + neg_const
        q = jnp.exp(mix + lp - num_lse)              # (M, P)
        gq = g[c] * q
        gV.append(gq * diff * (2.0 * inv_2var))
        gmix = gmix + gq

        d_bg = tc - bg_value                         # (1, P)
        lp_bg = -(d_bg * d_bg) * inv_2var + neg_const
        q_bg = jnp.exp(bg_mix + lp_bg - num_lse)
        gq_bg = g[c] * q_bg
        gq_bg_sum = gq_bg_sum + gq_bg
        g_bgv_row = g_bgv_row + gq_bg * d_bg
        gtgt_ref[0, c:c + 1, :] = (
            jnp.sum(gq * diff, axis=0, keepdims=True) + gq_bg * d_bg
        ) * (-2.0 * inv_2var)
        sq_row = (sq_row
                  + jnp.sum(gq * (diff * diff), axis=0, keepdims=True)
                  + gq_bg * (d_bg * d_bg))
        q_row = q_row + jnp.sum(gq, axis=0, keepdims=True) + gq_bg

    # scalar-gradient integrand rows; summed over (b, p) outside (XLA):
    #   row 0 -> g_bg_value = sum(2*inv_2var * gq_bg * d_bg)
    #   row 1 -> g_bg_mix   = sum(gq_bg) - sum(g_sum_c * r_bg)
    #   row 2 -> g_scale    = sum(sq)/s^3 - sum(q)/s
    grow_ref[0, 0:1, :] = g_bgv_row * (2.0 * inv_2var)
    grow_ref[0, 1:2, :] = gq_bg_sum - g_sum_c * r_bg
    grow_ref[0, 2:3, :] = sq_row / (scale * scale * scale) - q_row / scale

    # presence grad through log_safe (derivative 1/p where p >= eps)
    g_presq = jnp.sum(gmix, axis=1, keepdims=True)   # (M, 1)
    gpres_ref[0] = jnp.where(pres < _PRES_EPS, jnp.zeros_like(pres),
                             g_presq / pres)

    # pass 2: warp transposes.
    #   g_T[m,c,h,w] = sum_p gV_c * wy_h * wx_w
    #   g_A[m,h,w]   = sum_p gmix * wy_h * wx_w
    #   g_ix        += (sum_c U_c*T[c,h,w] + Ua*A[h,w]) * dwx_w
    #   g_iy        += (sum_c gV_c*S[c,h,:] + gmix*Sa[h,:]) * dwy_h
    #
    # The P-contractions for g_T/g_A run on the MXU (overlapping the
    # VPU body): per row h one batched matmul
    #   G = [U_0..U_{C-1}; Ua] @ R^T,  R[(w,m'),p] = wx_w[m',p]
    # then the needed [row_m == m'] entries are pulled out with a mask
    # and a tiny one-hot matmul — 242 multi-tile lane reduces become
    # 11 well-shaped MXU calls (measured: a lane reduce costs ~2.5 FMA
    # passes on the VPU, the dominant pass-2 cost).
    M = ix.shape[0]
    mxu_prec = (jax.lax.Precision.HIGHEST
                if MXU_DTYPE == jnp.float32 else None)
    R = jnp.concatenate(wx, axis=0).astype(MXU_DTYPE)      # (Wt*M, P)
    # mask D[r, (w, m')] = (r % M == m'); rows r are c-major then alpha
    r_m = jax.lax.broadcasted_iota(jnp.int32, ((C + 1) * M, Wt * M), 0) % M
    col_m = jax.lax.broadcasted_iota(jnp.int32,
                                     ((C + 1) * M, Wt * M), 1) % M
    D = (r_m == col_m).astype(jnp.float32)
    # one-hot E[(w, m'), w'] = (w == w') collapses the masked m' axis
    e_w = jax.lax.broadcasted_iota(jnp.int32, (Wt * M, Wt), 0) // M
    e_w2 = jax.lax.broadcasted_iota(jnp.int32, (Wt * M, Wt), 1)
    E = (e_w == e_w2).astype(MXU_DTYPE)

    def body(h, carry):
        g_ix, g_iy = carry
        hf = h.astype(ix.dtype)
        wyh = _tap(iy, hf)
        dwyh = _dtap(iy, hf)
        Th = T_ref[0, h]                             # (M, C*Wt)
        Ah = A_ref[0, h]                             # (M, Wt)
        U = [gV[c] * wyh for c in range(C)]
        Ua = gmix * wyh
        # g_wy from pass 1's cached S/Sa slices — no recompute
        g_wy_h = gmix * sa_scr[h]
        for c in range(C):
            g_wy_h = g_wy_h + gV[c] * s_scr[h, c]
        # MXU: all g_T/g_A row-h entries in two matmuls
        if "mxu" not in _DEBUG_SKIP:
            Z = jnp.concatenate(U + [Ua], axis=0).astype(MXU_DTYPE)
            G = jax.lax.dot_general(Z, R, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=mxu_prec)
            GT = jax.lax.dot_general((G * D).astype(MXU_DTYPE), E,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=mxu_prec)
            # GT rows: C blocks of M (g_T[c]) then M of g_A; cols = w
            gT_ref[0, h] = jnp.concatenate(
                [GT[c * M:(c + 1) * M, :] for c in range(C)], axis=1)
            gA_ref[0, h] = GT[C * M:, :]
        else:
            gT_ref[0, h] = jnp.zeros((M, C * Wt), jnp.float32)
            gA_ref[0, h] = jnp.zeros((M, Wt), jnp.float32)
        if "inner" not in _DEBUG_SKIP:
            for w in range(Wt):
                inner = None
                for c in range(C):
                    t_val = Th[:, c * Wt + w:c * Wt + w + 1]   # (M, 1)
                    contrib = U[c] * t_val
                    inner = contrib if inner is None else inner + contrib
                a_val = Ah[:, w:w + 1]
                inner = inner + Ua * a_val
                g_ix = g_ix + inner * dwx[w]
        g_iy = g_iy + g_wy_h * dwyh
        return g_ix, g_iy

    g_ix, g_iy = jax.lax.fori_loop(
        0, Ht, body, (jnp.zeros_like(ix), jnp.zeros_like(ix)))

    # pose chain: ix = ((a gx + b gy + tx + 1) Wt - 1)/2
    cx = 0.5 * Wt
    cy = 0.5 * Ht
    gpose_ref[0, :, 0:1] = jnp.sum(g_ix * gx, axis=1, keepdims=True) * cx
    gpose_ref[0, :, 1:2] = jnp.sum(g_ix * gy, axis=1, keepdims=True) * cx
    gpose_ref[0, :, 2:3] = jnp.sum(g_ix, axis=1, keepdims=True) * cx
    gpose_ref[0, :, 3:4] = jnp.sum(g_iy * gx, axis=1, keepdims=True) * cy
    gpose_ref[0, :, 4:5] = jnp.sum(g_iy * gy, axis=1, keepdims=True) * cy
    gpose_ref[0, :, 5:6] = jnp.sum(g_iy, axis=1, keepdims=True) * cy


def _prep(templates, alpha, pose, presence, target, out_size):
    """Reshape inputs into kernel-friendly layouts.

    templates (B,M,C,Ht,Wt) -> (B, Ht, M, C*Wt): the fori row index h is a
    leading block dim; (c, w) extraction is a static lane slice.
    """
    B, M, C, Ht, Wt = templates.shape
    H, W = out_size
    P = H * W
    T = jnp.transpose(templates.astype(jnp.float32),
                      (0, 3, 1, 2, 4)).reshape(B, Ht, M, C * Wt)
    Ba = alpha.shape[0]
    A = jnp.transpose(alpha.reshape(Ba, M, Ht, Wt).astype(jnp.float32),
                      (0, 2, 1, 3))                  # (Ba, Ht, M, Wt)
    pose = pose.astype(jnp.float32)
    pres = presence.reshape(B, M, 1).astype(jnp.float32)
    tgt = target.reshape(B, C, P).astype(jnp.float32)
    gx, gy = _base_grid(out_size, jnp.float32)
    gx = gx.reshape(1, P)
    gy = gy.reshape(1, P)
    return T, A, pose, pres, tgt, gx, gy, (B, M, C, Ht, Wt, H, W, P, Ba)


def _scalars(bg_value, bg_mixing_logit, scale):
    return jnp.stack([
        jnp.asarray(bg_value, jnp.float32).reshape(()),
        jnp.asarray(bg_mixing_logit, jnp.float32).reshape(()),
        jnp.asarray(scale, jnp.float32).reshape(()),
        jnp.zeros((), jnp.float32),
    ]).reshape(1, 4)


def _common_in_specs(B, M, C, Ht, Wt, P, Ba):
    row = lambda b: (b, 0, 0)  # noqa: E731
    row4 = lambda b: (b, 0, 0, 0)  # noqa: E731
    alpha_row = row4 if Ba != 1 else (lambda b: (0, 0, 0, 0))
    return [
        pl.BlockSpec((1, Ht, M, C * Wt), row4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Ht, M, Wt), alpha_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, 6), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, 1), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C, P), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4), lambda b: (0, 0), memory_space=pltpu.SMEM),
    ]


def _fwd_call(T, A, pose, pres, tgt, gx, gy, scal, dims):
    B, M, C, Ht, Wt, H, W, P, Ba = dims
    kern = functools.partial(_fwd_kernel, C=C, Ht=Ht, Wt=Wt)
    row = lambda b: (b, 0, 0)  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=_common_in_specs(B, M, C, Ht, Wt, P, Ba),
        out_specs=[
            pl.BlockSpec((1, C, P), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, P), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C, P), jnp.float32),
            jax.ShapeDtypeStruct((B, C, P), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, P), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(T, A, pose, pres, tgt, gx, gy, scal)


def _bwd_call(T, A, pose, pres, tgt, gx, gy, scal, g, num_lse, den_lse,
              dims):
    B, M, C, Ht, Wt, H, W, P, Ba = dims
    kern = functools.partial(_bwd_kernel, C=C, Ht=Ht, Wt=Wt)
    row = lambda b: (b, 0, 0)  # noqa: E731
    row4 = lambda b: (b, 0, 0, 0)  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=_common_in_specs(B, M, C, Ht, Wt, P, Ba) + [
            pl.BlockSpec((1, C, P), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, P), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Ht, M, C * Wt), row4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ht, M, Wt), row4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, 6), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, P), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, P), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Ht, M, C * Wt), jnp.float32),
            jax.ShapeDtypeStruct((B, Ht, M, Wt), jnp.float32),
            jax.ShapeDtypeStruct((B, M, 6), jnp.float32),
            jax.ShapeDtypeStruct((B, M, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, C, P), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, P), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Ht, C, M, P), jnp.float32),   # cached S slices
            pltpu.VMEM((Ht, M, P), jnp.float32),      # cached Sa slices
        ],
        interpret=_use_interpret(),
    )(T, A, pose, pres, tgt, gx, gy, scal, g, num_lse, den_lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def pallas_decoder_ll(templates, alpha, pose, presence, bg_value,
                      bg_mixing_logit, scale, target,
                      out_size: Tuple[int, int]):
    """Drop-in Pallas twin of ops.decoder_ll.fused_decoder_ll.

    Same argument contract (post-nonlinearity bg/scale values, alpha as
    (1 or B, M, 1, Ht, Wt) logits); returns the per-pixel reconstruction
    mixture log-likelihood (B, C, H, W) in float32.
    """
    ll, _ = _pallas_fwd(templates, alpha, pose, presence, bg_value,
                        bg_mixing_logit, scale, target, out_size)
    return ll


def _pallas_fwd(templates, alpha, pose, presence, bg_value,
                bg_mixing_logit, scale, target, out_size):
    T, A, pose_f, pres, tgt, gx, gy, dims = _prep(
        templates, alpha, pose, presence, target, out_size)
    scal = _scalars(bg_value, bg_mixing_logit, scale)
    ll, num_lse, den_lse = _fwd_call(T, A, pose_f, pres, tgt, gx, gy,
                                     scal, dims)
    B, M, C, Ht, Wt, H, W, P, Ba = dims
    res = (templates, alpha, pose, presence, bg_value, bg_mixing_logit,
           scale, target, num_lse, den_lse)
    return ll.reshape(B, C, H, W), res


def _pallas_bwd(out_size, res, g):
    (templates, alpha, pose, presence, bg_value, bg_mixing_logit, scale,
     target, num_lse, den_lse) = res
    T, A, pose_f, pres, tgt, gx, gy, dims = _prep(
        templates, alpha, pose, presence, target, out_size)
    B, M, C, Ht, Wt, H, W, P, Ba = dims
    scal = _scalars(bg_value, bg_mixing_logit, scale)
    g2 = g.reshape(B, C, P).astype(jnp.float32)
    gT, gA, gpose, gpres, gtgt, grows = _bwd_call(
        T, A, pose_f, pres, tgt, gx, gy, scal, g2, num_lse, den_lse, dims)

    # undo the (B, Ht, M, C*Wt) kernel layout
    g_templates = jnp.transpose(gT.reshape(B, Ht, M, C, Wt),
                                (0, 2, 3, 1, 4))
    gA_full = jnp.transpose(gA, (0, 2, 1, 3))        # (B, M, Ht, Wt)
    if Ba == 1:
        g_alpha = jnp.sum(gA_full, axis=0, keepdims=True)
    else:
        g_alpha = gA_full
    g_alpha = g_alpha.reshape(alpha.shape)
    g_pose = gpose.reshape(pose.shape)
    g_presence = gpres.reshape(presence.shape)
    g_target = gtgt.reshape(target.shape)
    s = jnp.sum(grows, axis=(0, 2))                  # (3,)

    def like(v, ref):
        return jnp.asarray(v, jnp.float32).reshape(jnp.shape(ref))

    return (g_templates, g_alpha, g_pose, g_presence,
            like(s[0], bg_value), like(s[1], bg_mixing_logit),
            like(s[2], scale), g_target)


pallas_decoder_ll.defvjp(_pallas_fwd, _pallas_bwd)
