"""Cost analysis + top tensors of the CURRENT compiled train step."""

import re
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.factory import make_scae
from scae_tpu.optim import make_optimizer
from scae_tpu.parallel.train_step import (
    create_train_state,
    make_fused_train_step,
)
from scae_tpu.train.loop import make_augment_fn

BATCH = 128
model = make_scae(dict(
    image_shape=(1, 40, 40), n_classes=10, n_part_caps=40, n_obj_caps=32,
    pcae_cnn_encoder_params=dict(compute_dtype="bfloat16"),
    pcae_decoder_params=dict(fused_tap_dtype="bfloat16"),
    scae_params=dict(reconstruct_alternatives=False),
))
tx = make_optimizer("rmsprop", 3e-5, batch_size=BATCH)
augment = make_augment_fn(canvas=40, max_shift=6)
step = make_fused_train_step(model, tx, augment)

rng = np.random.RandomState(0)
n_data = 1024
data = {"image": jnp.asarray(rng.randint(0, 256, (n_data, 28, 28)),
                             jnp.uint8),
        "label": jnp.asarray(rng.randint(0, 10, n_data), jnp.int32)}
example = {"image": jnp.zeros((BATCH, 1, 40, 40), jnp.float32),
           "label": jnp.zeros((BATCH,), jnp.int32)}
state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
idx = jnp.asarray(rng.randint(0, n_data, (BATCH,)).astype(np.int32))

jstep = jax.jit(step)
compiled = jstep.lower(state, data, idx).compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
flops = float(ca.get("flops", 0))
by = float(ca.get("bytes accessed", 0))
print(f"per step: {flops/1e9:.2f} GFLOP, {by/1e6:.0f} MB accessed")
print(f"bandwidth-bound floor @819GB/s: {by/819e9*1e3:.2f} ms")

txt = compiled.as_text()
sizes = {}
for line in txt.splitlines():
    m2 = re.search(
        r"= (f32|bf16|u8|s32|pred)\[([0-9,]*)\][^ ]* "
        r"(fusion|convolution|dot|reduce|transpose|copy|scatter)\(", line)
    if m2:
        dt, dims, kind = m2.group(1), m2.group(2), m2.group(3)
        d = [int(x) for x in dims.split(",") if x]
        n = int(np.prod(d)) if d else 1
        bytes_ = n * (2 if dt == "bf16" else 4 if dt in ("f32", "s32")
                      else 1)
        key = (kind, dims, dt)
        sizes[key] = sizes.get(key, 0) + 1
items = sorted(sizes.items(),
               key=lambda kv: -np.prod([int(x) for x in
                                        kv[0][1].split(",") if x])
               * kv[1])
total_big = 0
for (kind, dims, dt), count in items[:15]:
    d = [int(x) for x in dims.split(",") if x]
    n = int(np.prod(d))
    b = n * (2 if dt == "bf16" else 4) * count
    total_big += b
    print(f"{count:3d}x {kind:12s} {dt}[{dims}] ~{b/1e6:.0f} MB total")
print(f"top-15 output bytes: {total_big/1e6:.0f} MB")
