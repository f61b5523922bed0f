"""In-process A/B: XLA fused vs pallas v4 vs banded/windowed kernel.

Unlike tools/ab_pallas_ll.py this uses REALISTIC poses (the banded
kernel's row windows depend on pose statistics): poses come from
tools/footprint_stats.py's cache (/tmp/scae_pose_{0,700}.npy — run it
first) or, failing that, geometric_transform of unit-normal raw poses.

K value+grad iterations fused into one lax.scan dispatch; sync via host
value reads (axon discipline, BASELINE.md).

Usage: python tools/ab_banded_ll.py [pose_steps] [impls...]
  impls from {xla, v4, banded}; default all.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.ops.decoder_ll import fused_decoder_ll
from scae_tpu.ops.pallas_decoder_ll import pallas_decoder_ll
from scae_tpu.ops.pallas_decoder_ll_banded import pallas_decoder_ll_banded
from scae_tpu.ops.pallas_decoder_ll_gather import pallas_decoder_ll_gather

B, M, C, Ht, Wt, H, W = 128, 40, 1, 11, 11, 40, 40
K = 50

pose_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 0
which = sys.argv[2:] or ["xla", "v4", "gather"]

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
templates = jax.random.uniform(ks[0], (B, M, C, Ht, Wt))
alpha = jax.random.normal(ks[1], (1, M, 1, Ht, Wt)) * 0.5
try:
    pose = jnp.asarray(np.load(f"/tmp/scae_pose_{pose_steps}.npy"))
    print(f"using measured poses (train_steps={pose_steps})")
except OSError:
    from scae_tpu.ops.geometry import geometric_transform
    pose = geometric_transform(jax.random.normal(ks[2], (B, M, 6)) * 0.6)
    print("using synthetic geometric_transform poses")
presence = jax.random.uniform(ks[6], (B, M))
target = jax.random.uniform(ks[7], (B, C, H, W))
bg_value = jnp.float32(0.3)
bg_mix = jnp.float32(0.7)
scale = jnp.asarray([1.0], jnp.float32)
args4 = (templates, alpha, pose, presence)


def make(fn, extra):
    def loss(tpl, al, po, pr):
        return jnp.sum(fn(tpl, al, po, pr, bg_value, bg_mix, scale,
                          target, (H, W), *extra))
    vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))

    @jax.jit
    def scan_k(tpl, al, po, pr):
        def body(carry, _):
            t, a, p, q = carry
            v, g = vg(t, a, p, q)
            t = t + 1e-12 * g[0]
            a = a + 1e-12 * g[1]
            p = p + 1e-12 * g[2]
            q = q + 1e-12 * g[3]
            return (t, a, p, q), v
        carry, vs = jax.lax.scan(body, (tpl, al, po, pr), None, length=K)
        return carry, vs
    return vg, scan_k


def bench(name, vg, scan_k):
    t0 = time.perf_counter()
    _, vs = scan_k(*args4)
    float(vs[-1])
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s "
          f"value={float(vs[0]):.3f}")
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        _, vs = scan_k(*args4)
        float(vs[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name}: best fwd+bwd {best*1e3:.3f} ms/iter")
    v, g = vg(*args4)
    float(v)
    return v, g, best


impls = {
    "xla": (fused_decoder_ll, (jnp.bfloat16,)),
    "v4": (pallas_decoder_ll, ()),
    "banded": (pallas_decoder_ll_banded, ()),
    "gather": (pallas_decoder_ll_gather, ()),
}
results = {}
for name in which:
    fn, extra = impls[name]
    vg, sc = make(fn, extra)
    results[name] = bench(name, vg, sc)

names = list(results)
ref = names[0]
v1, g1, t1 = results[ref]
for name in names[1:]:
    v2, g2, t2 = results[name]
    print(f"[{ref} vs {name}] value rel diff:",
          abs(float(v1 - v2)) / abs(float(v1)))
    for i, n in enumerate(["templates", "alpha", "pose", "presence"]):
        d = float(jnp.max(jnp.abs(g1[i] - g2[i])))
        m = float(jnp.max(jnp.abs(g1[i])))
        print(f"  grad {n}: max abs diff {d:.3e} (scale {m:.3e})")
    print(f"  speedup vs {ref}: {t1/t2:.2f}x")
