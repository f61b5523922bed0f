"""In-process A/B of FULL train-step variants (flagship config)."""

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

BATCH, K = 128, 30


def build(tag, **model_overrides):
    params = dict(
        image_shape=(1, 40, 40), n_classes=10,
        n_part_caps=40, n_obj_caps=32,
        pcae_decoder_params=dict(fused_tap_dtype="bfloat16"),
        scae_params=dict(reconstruct_alternatives=False),
    )
    for k, v in model_overrides.items():
        params.setdefault(k, {})
        params[k] = {**params.get(k, {}), **v} if isinstance(v, dict) else v
    model = make_scae(params)
    tx = make_optimizer("rmsprop", 3e-5, batch_size=BATCH)
    augment = make_augment_fn(canvas=40, max_shift=6)
    return tag, model, tx, make_train_scan(model, tx, augment_fn=augment,
                                           donate=False)


variants = [
    build("base (bf16 taps)        "),
    build("+ bf16 CNN              ",
          pcae_cnn_encoder_params=dict(compute_dtype="bfloat16")),
    build("unfused decoder         ",
          pcae_decoder_params=dict(use_fused_ll=False)),
]

rng = np.random.RandomState(0)
n_data = 2048
data = {"image": jnp.asarray(rng.randint(0, 256, (n_data, 28, 28)),
                             jnp.uint8),
        "label": jnp.asarray(rng.randint(0, 10, n_data), jnp.int32)}
example = {"image": jnp.zeros((BATCH, 1, 40, 40), jnp.float32),
           "label": jnp.zeros((BATCH,), jnp.int32)}
idxs = jnp.asarray(rng.randint(0, n_data, (K, BATCH)).astype(np.int32))

states = {}
for tag, model, tx, scan_fn in variants:
    states[tag] = create_train_state(model, tx, example,
                                     jax.random.PRNGKey(0))
    _, m = scan_fn(states[tag], data, idxs)
    print(f"{tag} compiled, loss[0]={float(m['loss'][0]):.1f}", flush=True)

results = {tag: [] for tag, *_ in variants}
for rep in range(3):
    for tag, model, tx, scan_fn in variants:
        t0 = time.perf_counter()
        _, m = scan_fn(states[tag], data, idxs)
        float(m["loss"][-1])
        results[tag].append((time.perf_counter() - t0) / K * 1e3)

for tag, times in results.items():
    best = min(times)
    print(f"{tag}: best {best:.3f} ms/step -> {BATCH / best * 1e3:.0f} "
          f"img/s   all {[round(t, 2) for t in times]}")
