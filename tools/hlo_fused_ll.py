"""Count tap-sized materializations in the SHIPPING fused decoder-ll path
(ops/decoder_ll.py custom-VJP, bf16 taps) + full train-step bytes."""
import sys
sys.path.insert(0, "/root/repo")
import re
import jax, jax.numpy as jnp, numpy as np
from scae_tpu.ops.decoder_ll import fused_decoder_ll

B, M, C, Ht, Wt, H, W = 128, 40, 1, 11, 11, 40, 40
rng = np.random.RandomState(0)
templates = jnp.asarray(rng.rand(B, M, C, Ht, Wt), jnp.float32)
alpha = jnp.asarray(rng.randn(1, M, 1, Ht, Wt) * .5, jnp.float32)
pose = jnp.asarray(rng.randn(B, M, 6) * .1 + np.asarray([1,0,0,0,1,0]), jnp.float32)
presence = jnp.asarray(rng.rand(B, M), jnp.float32)
target = jnp.asarray(rng.rand(B, C, H, W), jnp.float32)

def loss(t, a, po, pr):
    return jnp.sum(fused_decoder_ll(t, a, po, pr, jnp.float32(0.3),
                                    jnp.float32(0.7),
                                    jnp.asarray([1.0], jnp.float32),
                                    target, (H, W), jnp.bfloat16))

g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))
compiled = g.lower(templates, alpha, pose, presence).compile()
ca = compiled.cost_analysis()
if isinstance(ca, list): ca = ca[0]
print("flops:", ca.get("flops"), " bytes accessed:", ca.get("bytes accessed"))
txt = compiled.as_text()
open("/tmp/fused_ll_hlo.txt", "w").write(txt)
# only MATERIALIZING ops: fusion roots / convolution / copy / dot etc.
# (instructions inside fusion bodies do not hit HBM)
pat = re.compile(r"= (f32|bf16)\[([0-9,]+)\]\S* "
                 r"(fusion|convolution|copy|dot|reduce|transpose|"
                 r"custom-call|all-reduce)\(")
counts = {}
for line in txt.splitlines():
    m2 = pat.search(line)
    if not m2:
        continue
    dims = [int(x) for x in m2.group(2).split(",")]
    n = int(np.prod(dims))
    if n >= 50_000_000:  # tap-tensor scale (>= ~0.6 of B*M*11*1600)
        key = (m2.group(1), m2.group(3), tuple(dims))
        counts[key] = counts.get(key, 0) + 1
bytes_total = 0
for (dt, kind, dims), c in sorted(counts.items(), key=lambda kv: -kv[1]):
    sz = int(np.prod(dims)) * (2 if dt == "bf16" else 4)
    bytes_total += c * sz
    print(f"{c:3d} x {kind:12s} {dt}{list(dims)}  ({sz/1e6:.0f} MB each)")
print(f"tap-scale OUTPUT bytes total: {bytes_total/1e9:.2f} GB (write side only)")
