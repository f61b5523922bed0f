"""In-process A/B: XLA fused_decoder_ll vs pallas_decoder_ll at the
flagship shape. K value+grad iterations are fused into one lax.scan
dispatch so tunnel latency amortizes; sync via host value reads
(axon discipline, BASELINE.md)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

from scae_tpu.ops.decoder_ll import fused_decoder_ll
from scae_tpu.ops.pallas_decoder_ll import pallas_decoder_ll

B, M, C, Ht, Wt, H, W = 128, 40, 1, 11, 11, 40, 40
K = 50  # iterations per dispatch
key = jax.random.PRNGKey(0); ks = jax.random.split(key, 8)
templates = jax.random.uniform(ks[0], (B, M, C, Ht, Wt))
alpha = jax.random.normal(ks[1], (1, M, 1, Ht, Wt)) * 0.5
pose = jax.random.uniform(ks[2], (B, M, 6), minval=-0.8, maxval=1.2)
presence = jax.random.uniform(ks[6], (B, M))
target = jax.random.uniform(ks[7], (B, C, H, W))
bg_value = jnp.float32(0.3); bg_mix = jnp.float32(0.7)
scale = jnp.asarray([1.0], jnp.float32)
args = (templates, alpha, pose, presence, bg_value, bg_mix, scale, target)

def make(fn, extra):
    def loss(tpl, al, po, pr):
        return jnp.sum(fn(tpl, al, po, pr, bg_value, bg_mix, scale, target,
                          (H, W), *extra))
    vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))

    @jax.jit
    def scan_k(tpl, al, po, pr):
        def body(carry, _):
            t, a, p, q = carry
            v, g = vg(t, a, p, q)
            # feed grads back so iterations can't be CSE'd away
            t = t + 1e-12 * g[0]; a = a + 1e-12 * g[1]
            p = p + 1e-12 * g[2]; q = q + 1e-12 * g[3]
            return (t, a, p, q), v
        carry, vs = jax.lax.scan(body, (tpl, al, po, pr), None, length=K)
        return carry, vs
    return vg, scan_k

def bench(name, vg, scan_k):
    t0 = time.perf_counter()
    (tpl, al, po, pr), vs = scan_k(*args[:4]); float(vs[-1])
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s value={float(vs[0]):.3f}")
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        _, vs = scan_k(*args[:4]); float(vs[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name}: best fwd+bwd {best*1e3:.3f} ms/iter")
    v, g = vg(*args[:4]); float(v)
    return v, g, best

vg1, sc1 = make(fused_decoder_ll, (jnp.bfloat16,))
vg2, sc2 = make(pallas_decoder_ll, ())
v1, g1, t1 = bench("xla_bf16", vg1, sc1)
v2, g2, t2 = bench("pallas  ", vg2, sc2)
print("value rel diff:", abs(float(v1-v2))/abs(float(v1)))
for i, n in enumerate(["templates", "alpha", "pose", "presence"]):
    d = float(jnp.max(jnp.abs(g1[i]-g2[i]))); m = float(jnp.max(jnp.abs(g2[i])))
    print(f"grad {n}: max abs diff {d:.3e} (scale {m:.3e})")
print(f"speedup: {t1/t2:.2f}x")
