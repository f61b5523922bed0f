"""Phase-level timing of the pallas decoder-ll backward: scan-fused,
sections disabled via the module's _DEBUG_SKIP probe hook."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import scae_tpu.ops.pallas_decoder_ll  # noqa
K = sys.modules['scae_tpu.ops.pallas_decoder_ll']

B, M, C, Ht, Wt, H, W = 128, 40, 1, 11, 11, 40, 40
P = H * W
ks = jax.random.split(jax.random.PRNGKey(0), 8)
templates = jax.random.uniform(ks[0], (B, M, C, Ht, Wt))
alpha = jax.random.normal(ks[1], (1, M, 1, Ht, Wt)) * 0.5
pose = jax.random.uniform(ks[2], (B, M, 6), minval=-0.8, maxval=1.2)
presence = jax.random.uniform(ks[6], (B, M))
target = jax.random.uniform(ks[7], (B, C, H, W))
T, A, pose_f, pres, tgt, gx, gy, dims = K._prep(templates, alpha, pose,
                                                presence, target, (H, W))
scal = K._scalars(0.3, 0.7, 1.0)
g = jnp.ones((B, C, P), jnp.float32)
num_lse = jnp.zeros((B, C, P), jnp.float32)
den_lse = jnp.zeros((B, 1, P), jnp.float32)
KITER = 40

def timed(name, call, args):
    @jax.jit
    def scan_k(*a):
        def body(carry, _):
            outs = call(*a)
            return carry + jnp.sum(outs[2][0, 0]), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=KITER)
        return acc
    acc = scan_k(*args); float(acc)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); acc = scan_k(*args); float(acc)
        best = min(best, (time.perf_counter() - t0) / KITER)
    print(f"{name}: {best*1e3:.2f} ms/iter")
    return best

fargs = (T, A, pose_f, pres, tgt, gx, gy, scal)
bargs = fargs + (g, num_lse, den_lse)
timed("fwd            ", lambda *a: K._fwd_call(*a, dims), fargs)
for skip, name in [
    (frozenset(), "bwd full       "),
    (frozenset({"pass1"}), "bwd -pass1     "),
    (frozenset({"mxu"}), "bwd -mxu       "),
    (frozenset({"inner"}), "bwd -inner     "),
    (frozenset({"pass1", "mxu", "inner"}), "bwd -all3      "),
]:
    K._DEBUG_SKIP = skip
    timed(name, lambda *a: K._bwd_call(*a, dims), bargs)
K._DEBUG_SKIP = frozenset()
