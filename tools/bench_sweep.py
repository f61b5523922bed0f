"""Batch-size throughput sweep for the flagship config (in one process)."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.factory import make_scae
from scae_tpu.optim import make_optimizer
from scae_tpu.parallel.train_step import create_train_state, make_train_scan
from scae_tpu.train.loop import make_augment_fn

model = make_scae(dict(
    image_shape=(1, 40, 40), n_classes=10, n_part_caps=40, n_obj_caps=32,
    pcae_cnn_encoder_params=dict(compute_dtype="bfloat16"),
    pcae_decoder_params=dict(fused_tap_dtype="bfloat16"),
    scae_params=dict(reconstruct_alternatives=False),
))
augment = make_augment_fn(canvas=40, max_shift=6)
rng = np.random.RandomState(0)
n_data = 4096
data = {"image": jnp.asarray(rng.randint(0, 256, (n_data, 28, 28)),
                             jnp.uint8),
        "label": jnp.asarray(rng.randint(0, 10, n_data), jnp.int32)}

for BATCH in (128, 256, 512, 1024):
    K = max(4, 2048 // BATCH * 2)
    tx = make_optimizer("rmsprop", 3e-5, batch_size=BATCH)
    scan_fn = make_train_scan(model, tx, augment_fn=augment, donate=False)
    example = {"image": jnp.zeros((BATCH, 1, 40, 40), jnp.float32),
               "label": jnp.zeros((BATCH,), jnp.int32)}
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    idxs = jnp.asarray(rng.randint(0, n_data, (K, BATCH)).astype(np.int32))
    _, m = scan_fn(state, data, idxs)
    float(m["loss"][-1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, m = scan_fn(state, data, idxs)
        float(m["loss"][-1])
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1e3
    print(f"B={BATCH:5d}: {ms:7.3f} ms/step -> {BATCH / ms * 1e3:8.0f}"
          f" img/s", flush=True)
