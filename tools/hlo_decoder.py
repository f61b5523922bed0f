import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.factory import make_scae

BATCH, M = 128, 40
model = make_scae(dict(image_shape=(1, 40, 40), n_classes=10,
                       n_part_caps=40, n_obj_caps=32,
                       scae_params=dict(reconstruct_alternatives=False)))
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(BATCH, 1, 40, 40), jnp.float32)
templates = jnp.asarray(rng.rand(BATCH, M, 1, 11, 11), jnp.float32)
pose = jnp.asarray(rng.randn(BATCH, M, 6) * 0.1
                   + np.asarray([1, 0, 0, 0, 1, 0]), jnp.float32)
presence = jnp.asarray(rng.rand(BATCH, M), jnp.float32)
variables = model.init({"params": jax.random.PRNGKey(0)}, img)
params = variables["params"]


def lf(t, po, pr):
    out = model.part_decoder.apply({"params": params["part_decoder"]},
                                   t, po, pr)
    return jnp.sum(out.pdf.log_prob(img))


g = jax.jit(lambda t, po, pr: jax.grad(lf, argnums=(0, 1, 2))(t, po, pr))
lowered = g.lower(templates, pose, presence)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
print("flops:", ca.get("flops"), " bytes:", ca.get("bytes accessed"))

txt = compiled.as_text()
print("total HLO lines:", len(txt.splitlines()))
# find the fusions with largest output shapes
import re
sizes = []
for line in txt.splitlines():
    m2 = re.search(r"= (f32|bf16)\[([0-9,]*)\][^ ]* (fusion|convolution|dot|reduce|transpose|copy)\(", line)
    if m2:
        dims = [int(x) for x in m2.group(2).split(",") if x]
        n = int(np.prod(dims)) if dims else 1
        sizes.append((n, m2.group(3), m2.group(2), line.strip()[:140]))
sizes.sort(reverse=True)
for n, kind, shape, line in sizes[:22]:
    print(f"{n/1e6:9.1f}M {kind:12s} [{shape}]")
