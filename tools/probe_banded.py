"""Isolate where the banded kernel's time goes.

Variants (flagship shape, measured init poses):
  fwd-only and fwd+bwd, for: v4, banded(MXU), banded(VPU),
  banded(dense windows) — the last isolates loop overhead from the
  window savings by forcing trips=Ht, lo=0.

Usage: python tools/probe_banded.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import scae_tpu.ops.pallas_decoder_ll_banded as banded_mod
from scae_tpu.ops.decoder_ll import fused_decoder_ll
from scae_tpu.ops.pallas_decoder_ll import pallas_decoder_ll

B, M, C, Ht, Wt, H, W = 128, 40, 1, 11, 11, 40, 40
K = 50

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
templates = jax.random.uniform(ks[0], (B, M, C, Ht, Wt))
alpha = jax.random.normal(ks[1], (1, M, 1, Ht, Wt)) * 0.5
pose = jnp.asarray(np.load("/tmp/scae_pose_0.npy"))
presence = jax.random.uniform(ks[6], (B, M))
target = jax.random.uniform(ks[7], (B, C, H, W))
bg_value = jnp.float32(0.3)
bg_mix = jnp.float32(0.7)
scale = jnp.asarray([1.0], jnp.float32)
args4 = (templates, alpha, pose, presence)


def run(tag, fn, extra, mode):
    if mode == "fwd":
        @jax.jit
        def scan_k(tpl, al, po, pr):
            def body(carry, _):
                t, a, p, q = carry
                v = jnp.sum(fn(t, a, p, q, bg_value, bg_mix, scale,
                               target, (H, W), *extra))
                return (t + 1e-12 * v, a, p, q), v
            return jax.lax.scan(body, (tpl, al, po, pr), None, length=K)
    else:
        def loss(t, a, p, q):
            return jnp.sum(fn(t, a, p, q, bg_value, bg_mix, scale,
                              target, (H, W), *extra))
        vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))

        @jax.jit
        def scan_k(tpl, al, po, pr):
            def body(carry, _):
                t, a, p, q = carry
                v, g = vg(t, a, p, q)
                return (t + 1e-12 * g[0], a + 1e-12 * g[1],
                        p + 1e-12 * g[2], q + 1e-12 * g[3]), v
            return jax.lax.scan(body, (tpl, al, po, pr), None, length=K)

    t0 = time.perf_counter()
    _, vs = scan_k(*args4)
    float(vs[-1])
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        _, vs = scan_k(*args4)
        float(vs[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{tag:28s} {mode}: {best*1e3:7.3f} ms/iter "
          f"(compile {comp:.0f}s)")
    return best


real_windows = banded_mod._h_windows


def dense_windows(pose, Ht, Wt, H, W, band_rows):
    w = real_windows(pose, Ht, Wt, H, W, band_rows)
    lo = jnp.zeros_like(w[..., 0])
    trips = jnp.full_like(w[..., 1], Ht)
    return jnp.stack([lo, trips], axis=-1)


for mode in ("fwd", "fwdbwd"):
    run("v4", pallas_decoder_ll, (), mode)
    run("xla_bf16", fused_decoder_ll, (jnp.bfloat16,), mode)
    banded_mod.WARP_MXU = True
    run("banded mxu", banded_mod.pallas_decoder_ll_banded, (), mode)
    banded_mod.WARP_MXU = False
    run("banded vpu", banded_mod.pallas_decoder_ll_banded, (), mode)
    banded_mod._h_windows = dense_windows
    banded_mod.WARP_MXU = True
    run("banded mxu dense-win", banded_mod.pallas_decoder_ll_banded, (),
        mode)
    banded_mod.WARP_MXU = False
    run("banded vpu dense-win", banded_mod.pallas_decoder_ll_banded, (),
        mode)
    banded_mod._h_windows = real_windows
    banded_mod.WARP_MXU = True
