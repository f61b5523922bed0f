"""Correctness check: banded/windowed kernel vs XLA fused_decoder_ll.

Runs value + all-gradient comparisons at several shapes (flagship-like,
multi-channel, non-multiple-of-8 capsule count). Interpret mode on CPU,
real kernel on TPU.

Usage: [JAX_PLATFORMS=cpu] python tools/check_banded_ll.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the container's sitecustomize registers the axon plugin before env
    # vars are read; flip the backend in-process (tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np

from scae_tpu.ops.decoder_ll import fused_decoder_ll
from scae_tpu.ops.pallas_decoder_ll_banded import pallas_decoder_ll_banded
from scae_tpu.ops.pallas_decoder_ll_gather import pallas_decoder_ll_gather

IMPL = {
    "banded": pallas_decoder_ll_banded,
    "gather": pallas_decoder_ll_gather,
}[os.environ.get("SCAE_CHECK_IMPL", "banded")]


def make_inputs(key, B, M, C, Ht, Wt, H, W):
    ks = jax.random.split(key, 8)
    templates = jax.random.uniform(ks[0], (B, M, C, Ht, Wt))
    alpha = jax.random.normal(ks[1], (1, M, 1, Ht, Wt))
    raw = jax.random.normal(ks[2], (B, M, 6)) * 0.6
    from scae_tpu.ops.geometry import geometric_transform
    pose = geometric_transform(raw)
    presence = jax.random.uniform(ks[3], (B, M))
    bg_value = jnp.asarray(0.3)
    bg_mix = jnp.asarray(0.7)
    scale = jnp.asarray(1.0)
    target = jax.random.uniform(ks[4], (B, C, H, W))
    return templates, alpha, pose, presence, bg_value, bg_mix, scale, \
        target


def compare(name, B, M, C, Ht, Wt, H, W, tol):
    args = make_inputs(jax.random.PRNGKey(0), B, M, C, Ht, Wt, H, W)

    def loss_ref(*a):
        return jnp.sum(fused_decoder_ll(*a, (H, W), jnp.float32) ** 2)

    def loss_new(*a):
        return jnp.sum(IMPL(*a, (H, W)) ** 2)

    ll_ref = fused_decoder_ll(*args, (H, W), jnp.float32)
    ll_new = IMPL(*args, (H, W))
    err = float(jnp.max(jnp.abs(ll_ref - ll_new)))
    scale_ll = float(jnp.max(jnp.abs(ll_ref)))

    g_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    g_new = jax.grad(loss_new, argnums=tuple(range(8)))(*args)
    names = ["templates", "alpha", "pose", "presence", "bg_value",
             "bg_mix", "scale", "target"]
    print(f"[{name}] ll max err {err:.2e} (|ll|max {scale_ll:.1f})")
    ok = err < tol * max(1.0, scale_ll)
    for n, a, b in zip(names, g_ref, g_new):
        d = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(a))) + 1e-30
        rel = d / s
        flag = "OK" if rel < tol else "FAIL"
        if rel >= tol:
            ok = False
        print(f"  grad {n:10s} max abs err {d:.2e}  rel {rel:.2e} {flag}")
    return ok


if __name__ == "__main__":
    tol = float(sys.argv[1]) if len(sys.argv) > 1 else 3e-2
    ok = True
    ok &= compare("flagship-small", 2, 16, 1, 11, 11, 40, 40, tol)
    ok &= compare("multi-channel", 2, 16, 3, 7, 7, 32, 32, tol)
    ok &= compare("pad-M", 2, 13, 1, 5, 5, 24, 24, tol)
    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)
