"""Gather-based (exact 4-tap) Pallas fused decoder log-likelihood.

Third-generation kernel. The dense kernels (ops/pallas_decoder_ll.py v4
and the XLA path) warp by looping over all Ht template rows per pixel —
~300 vector ops per (capsule, pixel) plane — even though bilinear
resampling touches exactly 4 template texels per (m, p). The banded/
windowed kernel (ops/pallas_decoder_ll_banded.py) cut the row loop
~2x but paid per-(band, group) iteration overhead that ate the win
(tools/probe_banded.py).

This kernel computes the 4 taps DIRECTLY with Mosaic's per-lane dynamic
gather (`tpu.dynamic_gather` via jnp.take_along_axis, verified exact on
v5e): each capsule's template lives in one 128-lane vector register
per channel (two, half-selected, for templates up to 256 texels), and
the warp is

    V[m, p] = sum_{a,b in {0,1}}  wy_a * wx_b * T[m, tex(h0+a, w0+b)]

with h0 = floor(iy), w0 = floor(ix) and fractional weights — 4 gathers
+ ~10 FMAs per (m, p) plane per channel, no row loop, no banding, no
capsule sorting. Out-of-template taps get zero weight (masked), which
reproduces grid_sample's zero padding exactly; the FORWARD is EXACT f32
bilinear (better precision than the bf16-tap XLA path). Precision is
asymmetric: the backward's template/alpha-gradient MXU contractions cast
operands to MXU_DTYPE (bf16, mirroring the XLA path's bf16 taps), which
is why grad-parity tests carry a ~3e-2 relative tolerance; set
MXU_DTYPE = jnp.float32 for strict-f32 gradients at ~2x gT cost.

The backward reuses the same gathered texels for the coordinate
gradients (dV/dix = sum_a wy_a * (T~[a,1] - T~[a,0]), etc.); only the
template gradient needs the tap-weight transpose, which runs as the
per-(row, group-of-8) masked MXU contraction inherited from v4 (MXU is
otherwise idle; see _bwd_kernel).

Math and argument contract are identical to ops/decoder_ll.py (which
mirrors the reference TemplateBasedImageDecoder + GaussianMixture
.log_prob pipeline, reference torch_scae/part_decoder.py:152-243,
distributions.py:41-48). Requires Ht*Wt <= 256; larger templates fall
back to other impls at the call site.
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

GROUP = 8           # capsules per masked-matmul block in the gT loop
TBL = 128           # one f32 vector register of texels (gather unit)
TBL_MAX = 256       # two-vreg tables: gather each half, select on idx
MXU_DTYPE = jnp.bfloat16
_MXU_PREC = jax.lax.Precision.DEFAULT

# template-gradient contraction strategy (see _bwd_kernel / _gt_kernel):
#   'split'        — the main backward emits the per-capsule upstream
#       planes (gV/gmix) and a SECOND pallas_call with grid (B, G)
#       contracts one capsule group per grid step:
#       Z (Ht*CC*G8, P) @ R^T (P, Wt*G8). Cross-capsule waste is G8=8x
#       (vs M=40x fullwidth) with MXU-sized tiles, and the kernel body
#       stays small (one group) so Mosaic compiles it quickly.
#   'fullwidth'    — per-row (CC*M, P) @ (P, Wt*M) inside the main
#       backward: M-times waste, Ht issues, corner-bound row skipping.
#   'grouped_rows' — the same group-batched contraction UNROLLED over
#       all G groups inside the main backward. WARNING: wedges the
#       Mosaic compiler for >1 h at the flagship shape — kept only as
#       the documented negative result that motivated 'split'.
import os as _os

# TPU-measured (tools/probe_gather_bwd.py / tools/ab_step_impl.py,
# flagship shape): fullwidth decoder fwd+bwd 2.99 ms (gT 1.56);
# split 1.98 ms -> full train step 4.36 -> 3.32 ms, 38.5k img/s/chip.
GT_MODE = _os.environ.get("SCAE_TPU_GT_MODE", "split")

# perf-probe hook (tools/probe_gather_bwd.py): backward sections to skip
# when timing phase costs. Never set in production.
_DEBUG_SKIP = frozenset()


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def supports(template_size) -> bool:
    return template_size[0] * template_size[1] <= TBL_MAX


def _table_width(Ht, Wt) -> int:
    return TBL if Ht * Wt <= TBL else TBL_MAX


def _tap(coord, k):
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord - k))


def _log_safe(x):
    is_small = x < _PRES_EPS
    safe = jnp.where(is_small, jnp.ones_like(x), x)
    return jnp.where(is_small, jnp.full_like(x, -1e8), jnp.log(safe))


def _coords_mp(pose, gx, gy, Ht, Wt):
    sx = pose[:, 0:1] * gx + pose[:, 1:2] * gy + pose[:, 2:3]
    sy = pose[:, 3:4] * gx + pose[:, 4:5] * gy + pose[:, 5:6]
    ix = ((sx + 1.0) * Wt - 1.0) * 0.5
    iy = ((sy + 1.0) * Ht - 1.0) * 0.5
    return ix, iy


def _gather_tab(tab, idx, P):
    """Chunked per-lane gather: tab (M, TBL or 2*TBL), idx (M, P) -> (M, P).

    Mosaic's dynamic_gather needs the source to be a single vreg along
    the gather (lane) dim, so gather in 128-lane chunks of the pixel
    axis (tail chunk padded). Tables wider than one vreg (templates up
    to 256 texels) gather each half and select on the index.
    """
    M, TW = tab.shape
    two = TW > TBL
    if two:
        tab_lo = tab[:, :TBL]
        tab_hi = tab[:, TBL:]
    outs = []
    for j in range(0, P, TBL):
        c = min(TBL, P - j)
        piece = idx[:, j:j + c]
        if c < TBL:
            piece = jnp.concatenate(
                [piece, jnp.zeros((M, TBL - c), piece.dtype)], axis=1)
        if two:
            hi = piece >= TBL
            g = jnp.where(
                hi,
                jnp.take_along_axis(tab_hi,
                                    jnp.maximum(piece - TBL, 0), axis=1),
                jnp.take_along_axis(tab_lo,
                                    jnp.minimum(piece, TBL - 1), axis=1))
        else:
            g = jnp.take_along_axis(tab, piece, axis=1)
        outs.append(g[:, :c] if c < TBL else g)
    return jnp.concatenate(outs, axis=1)


def _row_window(pose, Ht, H, W):
    """Global active template-row window per example: [lo, hi] int32
    (B, 2). Exact corner bounds of the linear map over the whole canvas,
    unioned over capsules — rows outside have zero wy taps for every
    (m, p), so the gT loop can skip them (padded for fp noise)."""
    xs = (2.0 * jnp.arange(W, dtype=jnp.float32) + 1.0) / W - 1.0
    ys = (2.0 * jnp.arange(H, dtype=jnp.float32) + 1.0) / H - 1.0
    c = pose[..., 3]
    d = pose[..., 4]
    ty = pose[..., 5]
    corners = [c * x + d * y + ty
               for x in (xs[0], xs[-1]) for y in (ys[0], ys[-1])]
    sy_min = jnp.minimum(jnp.minimum(corners[0], corners[1]),
                         jnp.minimum(corners[2], corners[3]))
    sy_max = jnp.maximum(jnp.maximum(corners[0], corners[1]),
                         jnp.maximum(corners[2], corners[3]))
    iy_min = ((sy_min + 1.0) * Ht - 1.0) * 0.5      # (B, M)
    iy_max = ((sy_max + 1.0) * Ht - 1.0) * 0.5
    lo = jnp.clip(jnp.floor(jnp.min(iy_min, axis=1) - 1.0 - 1e-3) + 1.0,
                  0, Ht - 1)
    hi = jnp.clip(jnp.ceil(jnp.max(iy_max, axis=1) + 1.0 + 1e-3) - 1.0,
                  -1, Ht - 1)
    return jnp.stack([lo, hi + 1.0],
                     axis=-1).astype(jnp.int32)[:, None]     # (B, 1, 2)


def _taps_4(ix, iy, Ht, Wt):
    """Fractional weights, validity-folded; clipped texel indices.

    Returns (wy0, wy1, wx0, wx1, vh0, vh1, vw0, vw1, idx) where idx is
    a list of 4 int32 (M, P) texel index planes [00, 01, 10, 11]
    (a = h tap, b = w tap).
    """
    h0 = jnp.floor(iy)
    w0 = jnp.floor(ix)
    fy = iy - h0
    fx = ix - w0
    one = jnp.ones_like(fy)

    def valid(v, n):
        return jnp.where((v >= 0.0) & (v <= n - 1.0), one, 0.0)

    vh0 = valid(h0, Ht)
    vh1 = valid(h0 + 1.0, Ht)
    vw0 = valid(w0, Wt)
    vw1 = valid(w0 + 1.0, Wt)
    ih0 = jnp.clip(h0, 0.0, Ht - 1.0).astype(jnp.int32)
    ih1 = jnp.clip(h0 + 1.0, 0.0, Ht - 1.0).astype(jnp.int32)
    iw0 = jnp.clip(w0, 0.0, Wt - 1.0).astype(jnp.int32)
    iw1 = jnp.clip(w0 + 1.0, 0.0, Wt - 1.0).astype(jnp.int32)
    r0 = ih0 * Wt
    r1 = ih1 * Wt
    idx = [r0 + iw0, r0 + iw1, r1 + iw0, r1 + iw1]
    return (1.0 - fy), fy, (1.0 - fx), fx, vh0, vh1, vw0, vw1, idx


def _warp_gather(tab_ref, idx, vmask, wy0, wy1, wx0, wx1, CC, P):
    """4-tap warp for all capsules: returns CC planes (M, P) plus the
    validity-masked texel planes (for gradient reuse in the backward).

    tab_ref block: (1, CC, M, TBL). vmask: 4 validity products
    [v00, v01, v10, v11].
    """
    V, texels = [], []
    for cc in range(CC):
        tab = tab_ref[0, cc]
        t = [_gather_tab(tab, idx[s], P) * vmask[s] for s in range(4)]
        texels.append(t)
        s0 = wx0 * t[0] + wx1 * t[1]
        s1 = wx0 * t[2] + wx1 * t[3]
        V.append(wy0 * s0 + wy1 * s1)
    return V, texels


def _fwd_kernel(tab_ref, pose_ref, pres_ref, tgt_ref, gx_ref, gy_ref,
                scal_ref, ll_ref, num_ref, den_ref, *, C, Ht, Wt, P):
    CC = C + 1
    bg_value = scal_ref[0, 0]
    bg_mix = scal_ref[0, 1]
    scale = scal_ref[0, 2]
    inv_2var = 1.0 / (2.0 * scale * scale)
    neg_const = -jnp.log(scale) - _LOG_SQRT_2PI

    pose = pose_ref[0]
    pres = pres_ref[0]
    gx = gx_ref[:]
    gy = gy_ref[:]
    ix, iy = _coords_mp(pose, gx, gy, Ht, Wt)
    wy0, wy1, wx0, wx1, vh0, vh1, vw0, vw1, idx = _taps_4(ix, iy, Ht, Wt)
    vmask = [vh0 * vw0, vh0 * vw1, vh1 * vw0, vh1 * vw1]
    V, _ = _warp_gather(tab_ref, idx, vmask, wy0, wy1, wx0, wx1, CC, P)

    mix = V[C] + _log_safe(pres)                    # (M, P)
    dmx = jnp.maximum(jnp.max(mix, axis=0, keepdims=True),
                      jnp.full_like(mix[:1], bg_mix))
    dsum = (jnp.sum(jnp.exp(mix - dmx), axis=0, keepdims=True)
            + jnp.exp(bg_mix - dmx))
    den_lse = jnp.log(dsum) + dmx
    den_ref[0] = den_lse

    for c in range(C):
        tc = tgt_ref[0, c:c + 1, :]
        d = tc - V[c]
        lp = -(d * d) * inv_2var + neg_const
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


def _bwd_kernel(tab_ref, pose_ref, pres_ref, tgt_ref, gx_ref, gy_ref,
                scal_ref, g_ref, num_ref, den_ref, hwin_ref,
                gT_ref, gpose_ref, gpres_ref, gtgt_ref, grow_ref,
                *, C, Ht, Wt, P, G, split_gt=False):
    CC = C + 1
    G8 = GROUP
    bg_value = scal_ref[0, 0]
    bg_mix = scal_ref[0, 1]
    scale = scal_ref[0, 2]
    inv_2var = 1.0 / (2.0 * scale * scale)
    neg_const = -jnp.log(scale) - _LOG_SQRT_2PI

    pose = pose_ref[0]
    pres = pres_ref[0]
    gx = gx_ref[:]
    gy = gy_ref[:]
    ix, iy = _coords_mp(pose, gx, gy, Ht, Wt)
    wy0, wy1, wx0, wx1, vh0, vh1, vw0, vw1, idx = _taps_4(ix, iy, Ht, Wt)
    vmask = [vh0 * vw0, vh0 * vw1, vh1 * vw0, vh1 * vw1]
    V, texels = _warp_gather(tab_ref, idx, vmask, wy0, wy1, wx0, wx1,
                             CC, P)

    presq = _log_safe(pres)
    mix = V[C] + presq
    den_lse = den_ref[0]
    g = [g_ref[0, c:c + 1, :] for c in range(C)]
    g_sum_c = g[0]
    for c in range(1, C):
        g_sum_c = g_sum_c + g[c]

    r = jnp.exp(mix - den_lse)
    r_bg = jnp.exp(bg_mix - den_lse)
    gV = []
    gmix = -(g_sum_c * r)
    gq_bg_sum = jnp.zeros_like(den_lse)
    g_bgv_row = jnp.zeros_like(den_lse)
    sq_row = jnp.zeros_like(den_lse)
    q_row = jnp.zeros_like(den_lse)
    for c in range(C):
        tc = tgt_ref[0, c:c + 1, :]
        num_lse = num_ref[0, c:c + 1, :]
        diff = tc - V[c]
        lp = -(diff * diff) * inv_2var + neg_const
        q = jnp.exp(mix + lp - num_lse)
        gq = g[c] * q
        gV.append(gq * diff * (2.0 * inv_2var))
        gmix = gmix + gq

        d_bg = tc - bg_value
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

    grow_ref[0, 0:1, :] = g_bgv_row * (2.0 * inv_2var)
    grow_ref[0, 1:2, :] = gq_bg_sum - g_sum_c * r_bg
    grow_ref[0, 2:3, :] = sq_row / (scale * scale * scale) - q_row / scale

    g_presq = jnp.sum(gmix, axis=1, keepdims=True)
    gpres_ref[0] = jnp.where(pres < _PRES_EPS, jnp.zeros_like(pres),
                             g_presq / pres)

    # coordinate gradients reuse the gathered (validity-masked) texels:
    #   dV/dix = wy0*(t01-t00) + wy1*(t11-t10)
    #   dV/diy = wx0*(t10-t00) + wx1*(t11-t01)
    g_ix = jnp.zeros_like(ix)
    g_iy = jnp.zeros_like(ix)
    for cc in range(CC):
        gval = gV[cc] if cc < C else gmix
        t = texels[cc]
        g_ix = g_ix + gval * (wy0 * (t[1] - t[0]) + wy1 * (t[3] - t[2]))
        g_iy = g_iy + gval * (wx0 * (t[2] - t[0]) + wx1 * (t[3] - t[1]))

    cx = 0.5 * Wt
    cy = 0.5 * Ht
    gpose_ref[0, :, 0:1] = jnp.sum(g_ix * gx, axis=1, keepdims=True) * cx
    gpose_ref[0, :, 1:2] = jnp.sum(g_ix * gy, axis=1, keepdims=True) * cx
    gpose_ref[0, :, 2:3] = jnp.sum(g_ix, axis=1, keepdims=True) * cx
    gpose_ref[0, :, 3:4] = jnp.sum(g_iy * gx, axis=1, keepdims=True) * cy
    gpose_ref[0, :, 4:5] = jnp.sum(g_iy * gy, axis=1, keepdims=True) * cy
    gpose_ref[0, :, 5:6] = jnp.sum(g_iy, axis=1, keepdims=True) * cy

    # template gradient: g_T[m,cc,h,w] = sum_p Ucc_m * wx_w  (U = g*wy_h)
    # via the per-(row, group) masked MXU contraction (v4 pattern):
    # MXU is idle here; the full tap-weight transpose never materializes.
    e_w = jax.lax.broadcasted_iota(jnp.int32, (Wt * G8, Wt), 0) // G8
    e_w2 = jax.lax.broadcasted_iota(jnp.int32, (Wt * G8, Wt), 1)
    E = (e_w == e_w2).astype(MXU_DTYPE)
    r_m = jax.lax.broadcasted_iota(jnp.int32, (CC * G8, Wt * G8), 0) % G8
    c_m = jax.lax.broadcasted_iota(jnp.int32, (CC * G8, Wt * G8), 1) % G8
    D = (r_m == c_m).astype(jnp.float32)

    if split_gt:
        # 'split' mode: gT_ref is the gvmix output (CC, M, P) — the
        # upstream planes the dedicated _gt_kernel contracts per group
        for cc in range(CC):
            gT_ref[0, cc] = ((gV[cc] if cc < C else gmix)
                             .astype(gT_ref.dtype))
        return

    gT_ref[0] = jnp.zeros((Ht, G, G8, CC * Wt), jnp.float32)
    if "gT" in _DEBUG_SKIP:
        return

    M = G * G8
    if GT_MODE == "grouped_rows":
        # Round-3 formulation. gT[m,cc,h,w] = sum_p gval[cc,m,p] *
        # wy_h[m,p] * wx_w[m,p]. The masked-MXU contraction pays for
        # cross-capsule products it throws away: full-width (one
        # (CC*M, P) @ (P, Wt*M) per row) wastes M=40x, measured 1.55 ms.
        # Instead, batch ALL rows and channels of one GROUP of G8=8
        # capsules into a single matmul:
        #     Z_g (Ht*CC*G8, P) @ R_g^T (P, Wt*G8) -> (Ht*CC*G8, Wt*G8)
        # waste is G8=8x, tiles are MXU-sized (176x1600x88 at the
        # flagship shape), and there are G=5 matmul issues total instead
        # of Ht per-row issues. The in-group m-diagonal is extracted by
        # the same mask + one-hot collapse as before.
        rows = Ht * CC * G8
        cols = Wt * G8
        r_m = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) % G8
        c_m = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) % G8
        Dm = (r_m == c_m).astype(jnp.float32)
        e_w = jax.lax.broadcasted_iota(jnp.int32, (cols, Wt), 0) // G8
        e_w2 = jax.lax.broadcasted_iota(jnp.int32, (cols, Wt), 1)
        Em = (e_w == e_w2).astype(MXU_DTYPE)
        gvals = [gV[cc] if cc < C else gmix for cc in range(CC)]
        for gi in range(G):
            sl = slice(gi * G8, (gi + 1) * G8)
            iy_g = iy[sl]
            ix_g = ix[sl]
            g_g = [gvals[cc][sl] for cc in range(CC)]
            Z = jnp.concatenate(
                [g_g[cc] * _tap(iy_g, float(h))
                 for h in range(Ht) for cc in range(CC)],
                axis=0).astype(MXU_DTYPE)               # (Ht*CC*G8, P)
            Rg = jnp.concatenate(
                [_tap(ix_g, float(w)) for w in range(Wt)],
                axis=0).astype(MXU_DTYPE)               # (Wt*G8, P)
            Gm = jax.lax.dot_general(
                Z, Rg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_MXU_PREC)                    # (rows, cols)
            GT = jax.lax.dot_general(
                (Gm * Dm).astype(MXU_DTYPE), Em, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_MXU_PREC)                    # (rows, Wt)
            for h in range(Ht):
                gT_ref[0, h, gi] = jnp.concatenate(
                    [GT[(h * CC + cc) * G8:(h * CC + cc + 1) * G8]
                     for cc in range(CC)], axis=1)
        return

    # legacy full-width row loop (kept for A/B): one (CC*M, P) @
    # (P, Wt*M) per template row, m-diagonal by mask + one-hot collapse;
    # rows outside the global corner-bound window are skipped
    wxp = [_tap(ix, float(w)) for w in range(Wt)]   # (M, P) tap planes
    R = jnp.concatenate(wxp, axis=0).astype(MXU_DTYPE)      # (Wt*M, P)
    r_m = jax.lax.broadcasted_iota(jnp.int32, (CC * M, Wt * M), 0) % M
    c_m = jax.lax.broadcasted_iota(jnp.int32, (CC * M, Wt * M), 1) % M
    Dm = (r_m == c_m).astype(jnp.float32)
    e_w = jax.lax.broadcasted_iota(jnp.int32, (Wt * M, Wt), 0) // M
    e_w2 = jax.lax.broadcasted_iota(jnp.int32, (Wt * M, Wt), 1)
    Em = (e_w == e_w2).astype(MXU_DTYPE)

    def row_body(h, _):
        wyh = _tap(iy, h.astype(iy.dtype))
        U = [(gV[cc] if cc < C else gmix) * wyh for cc in range(CC)]
        Z = jnp.concatenate(U, axis=0).astype(MXU_DTYPE)    # (CC*M, P)
        Gm = jax.lax.dot_general(
            Z, R, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_MXU_PREC)                    # (CC*M, Wt*M)
        GT = jax.lax.dot_general(
            (Gm * Dm).astype(MXU_DTYPE), Em, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_MXU_PREC)                    # (CC*M, Wt)
        for gi in range(G):
            gT_ref[0, h, gi] = jnp.concatenate(
                [GT[cc * M + gi * G8:cc * M + (gi + 1) * G8]
                 for cc in range(CC)], axis=1)
        return 0

    # rows outside the global window have zero wy taps for every (m, p)
    # (exact corner bounds, computed outside) — skip them; gT was zeroed
    jax.lax.fori_loop(hwin_ref[0, 0, 0], hwin_ref[0, 0, 1], row_body, 0)


def _gt_kernel(pose_ref, gx_ref, gy_ref, gvmix_ref, gT_ref,
               *, C, Ht, Wt, P):
    """Template/alpha gradient for ONE capsule group (grid = (B, G)).

    gT[m,cc,h,w] = sum_p gvmix[cc,m,p] * wy_h[m,p] * wx_w[m,p], computed
    as a single group-batched MXU contraction:
        Z (Ht*CC*G8, P) @ R^T (P, Wt*G8)  ->  in-group m-diagonal
    (8x cross-capsule waste vs the fullwidth row loop's M-times; the
    body covers one group so the Mosaic compile stays small — the
    all-groups unrolled variant wedged the compiler, see GT_MODE).
    """
    CC = C + 1
    G8 = GROUP
    pose = pose_ref[0]                      # (G8, 6)
    gx = gx_ref[:]
    gy = gy_ref[:]
    ix, iy = _coords_mp(pose, gx, gy, Ht, Wt)       # (G8, P)

    rows = Ht * CC * G8
    cols = Wt * G8
    r_m = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) % G8
    c_m = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) % G8
    Dm = (r_m == c_m).astype(jnp.float32)
    e_w = jax.lax.broadcasted_iota(jnp.int32, (cols, Wt), 0) // G8
    e_w2 = jax.lax.broadcasted_iota(jnp.int32, (cols, Wt), 1)
    Em = (e_w == e_w2).astype(MXU_DTYPE)

    gv = [gvmix_ref[0, cc].astype(jnp.float32) for cc in range(CC)]
    Z = jnp.concatenate(
        [gv[cc] * _tap(iy, float(h))
         for h in range(Ht) for cc in range(CC)],
        axis=0).astype(MXU_DTYPE)                   # (Ht*CC*G8, P)
    Rg = jnp.concatenate(
        [_tap(ix, float(w)) for w in range(Wt)],
        axis=0).astype(MXU_DTYPE)                   # (Wt*G8, P)
    Gm = jax.lax.dot_general(
        Z, Rg, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_MXU_PREC)                        # (rows, cols)
    GT = jax.lax.dot_general(
        (Gm * Dm).astype(MXU_DTYPE), Em, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_MXU_PREC)                        # (rows, Wt)
    for h in range(Ht):
        gT_ref[0, h, 0] = jnp.concatenate(
            [GT[(h * CC + cc) * G8:(h * CC + cc + 1) * G8]
             for cc in range(CC)], axis=1)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _prep(templates, alpha_b, pose, presence, target, out_size):
    B, M, C, Ht, Wt = templates.shape
    H, W = out_size
    P = H * W
    CC = C + 1
    TW = _table_width(Ht, Wt)
    TAc = jnp.concatenate([templates.astype(jnp.float32),
                           alpha_b.astype(jnp.float32)], axis=2)
    tab = TAc.reshape(B, M, CC, Ht * Wt)
    tab = jnp.concatenate(
        [tab, jnp.zeros((B, M, CC, TW - Ht * Wt), jnp.float32)], axis=-1)
    tab = jnp.transpose(tab, (0, 2, 1, 3))          # (B, CC, M, TW)
    pose_k = pose.astype(jnp.float32)
    pres_k = presence.reshape(B, M, 1).astype(jnp.float32)
    tgt = target.reshape(B, C, P).astype(jnp.float32)
    gx, gy = _base_grid(out_size, jnp.float32)
    dims = (B, M, C, Ht, Wt, H, W, P)
    return tab, pose_k, pres_k, tgt, gx.reshape(1, P), gy.reshape(1, P), \
        dims


def _scalars(bg_value, bg_mixing_logit, scale):
    return jnp.stack([
        jnp.asarray(bg_value, jnp.float32).reshape(()),
        jnp.asarray(bg_mixing_logit, jnp.float32).reshape(()),
        jnp.asarray(scale, jnp.float32).reshape(()),
        jnp.zeros((), jnp.float32),
    ]).reshape(1, 4)


def _in_specs(dims):
    B, M, C, Ht, Wt, H, W, P = dims
    CC = C + 1
    row = lambda b: (b, 0, 0)  # noqa: E731
    return [
        pl.BlockSpec((1, CC, M, _table_width(Ht, Wt)),
                     lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, 6), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, 1), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C, P), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4), lambda b: (0, 0), memory_space=pltpu.SMEM),
    ]


def _fwd_call(tab, pose_k, pres_k, tgt, gx, gy, scal, dims):
    B, M, C, Ht, Wt, H, W, P = dims
    kern = functools.partial(_fwd_kernel, C=C, Ht=Ht, Wt=Wt, P=P)
    row = lambda b: (b, 0, 0)  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=_in_specs(dims),
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
    )(tab, pose_k, pres_k, tgt, gx, gy, scal)


def _bwd_call(tab, pose_k, pres_k, tgt, gx, gy, scal, g, num, den, hwin,
              dims):
    B, M, C, Ht, Wt, H, W, P = dims
    CC = C + 1
    G = M // GROUP
    split = GT_MODE == "split"
    kern = functools.partial(_bwd_kernel, C=C, Ht=Ht, Wt=Wt, P=P, G=G,
                             split_gt=split)
    row = lambda b: (b, 0, 0)  # noqa: E731
    if split:
        # first output carries the upstream planes for the gT kernel
        # (bf16: the contraction casts to MXU_DTYPE anyway)
        first_spec = pl.BlockSpec((1, CC, M, P), lambda b: (b, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        first_shape = jax.ShapeDtypeStruct((B, CC, M, P), MXU_DTYPE)
    else:
        first_spec = pl.BlockSpec((1, Ht, G, GROUP, CC * Wt),
                                  lambda b: (b, 0, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        first_shape = jax.ShapeDtypeStruct((B, Ht, G, GROUP, CC * Wt),
                                           jnp.float32)
    first, gpose, gpres, gtgt, grow = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=_in_specs(dims) + [
            pl.BlockSpec((1, C, P), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, P), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            first_spec,
            pl.BlockSpec((1, M, 6), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, P), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, P), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            first_shape,
            jax.ShapeDtypeStruct((B, M, 6), jnp.float32),
            jax.ShapeDtypeStruct((B, M, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, C, P), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, P), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(tab, pose_k, pres_k, tgt, gx, gy, scal, g, num, den, hwin)
    if not split:
        return first, gpose, gpres, gtgt, grow

    gt_kern = functools.partial(_gt_kernel, C=C, Ht=Ht, Wt=Wt, P=P)
    gT = pl.pallas_call(
        gt_kern,
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, GROUP, 6), lambda b, gi: (b, gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda b, gi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda b, gi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CC, GROUP, P), lambda b, gi: (b, 0, gi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Ht, 1, GROUP, CC * Wt),
                               lambda b, gi: (b, 0, gi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ht, G, GROUP, CC * Wt),
                                       jnp.float32),
        interpret=_use_interpret(),
    )(pose_k, gx, gy, first)
    return gT, gpose, gpres, gtgt, grow


# ---------------------------------------------------------------------------
# GSPMD/Shardy partitioning: batch-dim data parallelism for the kernel
# ---------------------------------------------------------------------------
# A pallas_call has no built-in partitioning rule, so inside a jit with
# sharded inputs it would be fully replicated (or rejected). Every
# input/output of both kernels is independent per example (grid=(B,);
# the only cross-example reductions happen outside), so batch-dim
# partitioning is exact: declare it via custom_partitioning, with every
# non-batch factor marked need-replication. Each shard then runs the
# kernel on its local batch. Validated on the virtual CPU mesh by
# tests/test_pallas_decoder_impls.py::test_gather_partitions_over_data.

from jax.experimental.custom_partitioning import (  # noqa: E402
    custom_partitioning,
)
from jax.sharding import NamedSharding  # noqa: E402
from jax.sharding import PartitionSpec as PSpec  # noqa: E402

_FWD_RULE = ("b c m t, b m s, b m q, b d p, u p, u p, u w "
             "-> b d p, b d p, b q p")
_BWD_RULE = ("b c m t, b m s, b m q, b d p, u p, u p, u w, "
             "b d p, b d p, b q p, b q h "
             "-> b e f k i, b m s, b m q, b d p, b r p")
_FWD_REPL = ("c", "m", "t", "s", "q", "d", "p", "u", "w")
_BWD_REPL = _FWD_REPL + ("h", "e", "f", "k", "i", "r")


def _make_partitioned(fn, batched_args, n_args, out_ndims, rule, repl):
    fp = custom_partitioning(fn)

    def partition(mesh, arg_shapes, result_shape):
        spec0 = getattr(arg_shapes[0].sharding, "spec", None)
        b_axis = spec0[0] if spec0 else None

        def sharded(ndim, batched):
            spec = [None] * ndim
            if batched:
                spec[0] = b_axis
            return NamedSharding(mesh, PSpec(*spec))

        arg_shardings = tuple(
            sharded(len(a.shape), i in batched_args)
            for i, a in enumerate(arg_shapes))
        out_shardings = tuple(sharded(nd, True) for nd in out_ndims)

        def lower_fn(*args):
            return fn(*args)

        return mesh, lower_fn, out_shardings, arg_shardings

    fp.def_partition(partition=partition, sharding_rule=rule,
                     need_replication_factors=repl)
    return fp


@functools.lru_cache(maxsize=None)
def _partitioned_calls(M, C, Ht, Wt, H, W):
    P = H * W

    def dims_of(B):
        return (B, M, C, Ht, Wt, H, W, P)

    def fwd_fn(tab, pose_k, pres_k, tgt, gx, gy, scal):
        return tuple(_fwd_call(tab, pose_k, pres_k, tgt, gx, gy, scal,
                               dims_of(tab.shape[0])))

    def bwd_fn(tab, pose_k, pres_k, tgt, gx, gy, scal, g, num, den,
               hwin):
        return tuple(_bwd_call(tab, pose_k, pres_k, tgt, gx, gy, scal,
                               g, num, den, hwin,
                               dims_of(tab.shape[0])))

    fwd_p = _make_partitioned(fwd_fn, batched_args={0, 1, 2, 3},
                              n_args=7, out_ndims=(3, 3, 3),
                              rule=_FWD_RULE, repl=_FWD_REPL)
    bwd_p = _make_partitioned(bwd_fn,
                              batched_args={0, 1, 2, 3, 7, 8, 9, 10},
                              n_args=11, out_ndims=(5, 3, 3, 3, 3),
                              rule=_BWD_RULE, repl=_BWD_REPL)
    return fwd_p, bwd_p


# ---------------------------------------------------------------------------
# custom_vjp + public wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _core(templates, alpha_b, pose, presence, bg_value, bg_mixing_logit,
          scale, target, out_size: Tuple[int, int]):
    ll, _ = _core_fwd(templates, alpha_b, pose, presence, bg_value,
                      bg_mixing_logit, scale, target, out_size)
    return ll


def _core_fwd(templates, alpha_b, pose, presence, bg_value,
              bg_mixing_logit, scale, target, out_size):
    tab, pose_k, pres_k, tgt, gx, gy, dims = _prep(
        templates, alpha_b, pose, presence, target, out_size)
    B, M, C, Ht, Wt, H, W, P = dims
    scal = _scalars(bg_value, bg_mixing_logit, scale)
    fwd_p, _ = _partitioned_calls(M, C, Ht, Wt, H, W)
    ll, num, den = fwd_p(tab, pose_k, pres_k, tgt, gx, gy, scal)
    res = (templates, alpha_b, pose, presence, bg_value, bg_mixing_logit,
           scale, target, num, den)
    return ll.reshape(B, C, H, W), res


def _core_bwd(out_size, res, g):
    (templates, alpha_b, pose, presence, bg_value, bg_mixing_logit, scale,
     target, num, den) = res
    tab, pose_k, pres_k, tgt, gx, gy, dims = _prep(
        templates, alpha_b, pose, presence, target, out_size)
    B, M, C, Ht, Wt, H, W, P = dims
    CC = C + 1
    scal = _scalars(bg_value, bg_mixing_logit, scale)
    g2 = g.reshape(B, C, P).astype(jnp.float32)
    hwin = _row_window(pose_k, Ht, H, W)
    _, bwd_p = _partitioned_calls(M, C, Ht, Wt, H, W)
    gT, gpose, gpres, gtgt, grow = bwd_p(
        tab, pose_k, pres_k, tgt, gx, gy, scal, g2, num, den, hwin)

    gT = gT.reshape(B, Ht, M, CC, Wt).transpose(0, 2, 3, 1, 4)
    g_templates = gT[:, :, :C]
    g_alpha = gT[:, :, C:]
    g_pose = gpose.reshape(pose.shape)
    g_presence = gpres.reshape(presence.shape)
    g_target = gtgt.reshape(target.shape)
    s = jnp.sum(grow, axis=(0, 2))

    def like(v, ref):
        return jnp.asarray(v, jnp.float32).reshape(jnp.shape(ref))

    return (g_templates, g_alpha.reshape(alpha_b.shape), g_pose,
            g_presence, like(s[0], bg_value),
            like(s[1], bg_mixing_logit), like(s[2], scale), g_target)


_core.defvjp(_core_fwd, _core_bwd)


def pallas_decoder_ll_gather(templates, alpha, pose, presence, bg_value,
                             bg_mixing_logit, scale, target,
                             out_size: Tuple[int, int]):
    """Drop-in gather-based twin of ops.decoder_ll.fused_decoder_ll.

    Same argument contract (post-nonlinearity bg/scale values, alpha as
    (1 or B, M, 1, Ht, Wt) logits); returns the per-pixel reconstruction
    mixture log-likelihood (B, C, H, W) in float32. Requires
    Ht*Wt <= 256.
    """
    B, M, C, Ht, Wt = templates.shape
    if not supports((Ht, Wt)):
        raise ValueError(f"template {Ht}x{Wt} exceeds the {TBL_MAX}-texel "
                         "gather table; use fused_impl='xla' or 'pallas'")
    alpha_b = jnp.broadcast_to(alpha.reshape(-1, M, 1, Ht, Wt),
                               (B, M, 1, Ht, Wt))
    pad = (-M) % GROUP
    if pad:
        # presence-0 capsules contribute nothing (log_safe(0) = -1e8)
        zt = jnp.zeros((B, pad, C, Ht, Wt), templates.dtype)
        za = jnp.zeros((B, pad, 1, Ht, Wt), alpha_b.dtype)
        zp = jnp.zeros((B, pad, 6), pose.dtype)
        templates = jnp.concatenate([templates, zt], axis=1)
        alpha_b = jnp.concatenate([alpha_b, za], axis=1)
        pose = jnp.concatenate([pose, zp], axis=1)
        presence = jnp.concatenate(
            [presence, jnp.zeros((B, pad), presence.dtype)], axis=1)
        ll = _core(templates, alpha_b, pose, presence, bg_value,
                   bg_mixing_logit, scale, target, out_size)
        return ll
    return _core(templates, alpha_b, pose, presence, bg_value,
                 bg_mixing_logit, scale, target, out_size)
