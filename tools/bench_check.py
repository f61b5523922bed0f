import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.factory import make_scae
from scae_tpu.optim import make_optimizer
from scae_tpu.parallel.train_step import create_train_state, make_train_scan
from scae_tpu.train.loop import make_augment_fn

BATCH = 128
model = make_scae(dict(image_shape=(1, 40, 40), n_classes=10,
                       n_part_caps=40, n_obj_caps=32,
                       scae_params=dict(reconstruct_alternatives=False)))
tx = make_optimizer("rmsprop", 3e-5, batch_size=BATCH)
rng = np.random.RandomState(0)
n_data = 4096
data = {
    "image": jnp.asarray(rng.randint(0, 256, (n_data, 28, 28)), jnp.uint8),
    "label": jnp.asarray(rng.randint(0, 10, n_data), jnp.int32),
}
example = {"image": jnp.zeros((BATCH, 1, 40, 40), jnp.float32),
           "label": jnp.zeros((BATCH,), jnp.int32)}
state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
augment = make_augment_fn(canvas=40, max_shift=6)
scan_fn = make_train_scan(model, tx, augment_fn=augment, donate=False)

K = 20
idxs = jnp.asarray(rng.randint(0, n_data, (K, BATCH)).astype(np.int32))

lowered = scan_fn.lower(state, data, idxs)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
print("flops estimate:", ca.get("flops", "n/a"))
print("bytes accessed:", ca.get("bytes accessed", "n/a"))

s1, m1 = scan_fn(state, data, idxs)
jax.block_until_ready(m1["loss"])
print("losses chunk1 first/last:", float(m1["loss"][0]), float(m1["loss"][-1]))

t0 = time.perf_counter()
N = 5
s = s1
for c in range(N):
    s, m = scan_fn(s, data, idxs)
jax.block_until_ready(m["loss"])
dt = time.perf_counter() - t0
print(f"{N * K} steps in {dt * 1e3:.1f} ms -> {dt / (N * K) * 1e3:.3f} ms/step "
      f"-> {N * K * BATCH / dt:.0f} img/s")
print("losses chunk6 first/last:", float(m["loss"][0]), float(m["loss"][-1]))
flops = float(ca.get("flops", 0.0))
print(f"implied TFLOPS: {flops * N / dt / 1e12:.1f}")
