"""Phase costs of the gather kernel's backward: full vs gT-loop-skipped.
python tools/probe_gather_bwd.py"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import importlib
gmod = importlib.import_module("scae_tpu.ops.pallas_decoder_ll_gather")

B, M, C, Ht, Wt, H, W = 128, 40, 1, 11, 11, 40, 40
K = 50
ks = jax.random.split(jax.random.PRNGKey(0), 8)
templates = jax.random.uniform(ks[0], (B, M, C, Ht, Wt))
alpha = jax.random.normal(ks[1], (1, M, 1, Ht, Wt)) * 0.5
pose = jnp.asarray(np.load("/tmp/scae_pose_0.npy"))
presence = jax.random.uniform(ks[6], (B, M))
target = jax.random.uniform(ks[7], (B, C, H, W))
extra = (jnp.float32(0.3), jnp.float32(0.7), jnp.asarray([1.0]), target)

def run(tag):
    def loss(t, a, p, q):
        return jnp.sum(gmod.pallas_decoder_ll_gather(
            t, a, p, q, *extra, (H, W)))
    vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))
    @jax.jit
    def scan_k(t, a, p, q):
        def body(carry, _):
            t, a, p, q = carry
            v, g = vg(t, a, p, q)
            return (t + 1e-12*g[0], a + 1e-12*g[1], p + 1e-12*g[2],
                    q + 1e-12*g[3]), v
        return jax.lax.scan(body, (t, a, p, q), None, length=K)
    _, vs = scan_k(templates, alpha, pose, presence); float(vs[-1])
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        _, vs = scan_k(templates, alpha, pose, presence); float(vs[-1])
        best = min(best, (time.perf_counter()-t0)/K)
    print(f"{tag}: {best*1e3:.3f} ms/iter fwd+bwd")
    return best

full = run("full")
gmod._DEBUG_SKIP = frozenset({"gT"})
nog = run("skip gT loop")
print(f"gT loop cost ~= {(full-nog)*1e3:.3f} ms")
