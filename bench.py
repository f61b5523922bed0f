"""Benchmark: SCAE training throughput (images/sec/chip) on the flagship
MNIST config (40x40, M=40 part caps, O=32 object caps, batch 128).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the driver-supplied north star of
20_000 MNIST train images/sec/chip (BASELINE.json; the reference itself
publishes no throughput numbers - BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR = 20_000.0  # images/sec/chip, BASELINE.json north_star
BATCH = 128
WARMUP_STEPS = 5
BENCH_STEPS = 30


def main():
    import optax

    from scae_tpu.factory import make_scae
    from scae_tpu.optim import make_optimizer
    from scae_tpu.parallel.train_step import create_train_state
    from scae_tpu.train.data import random_translate

    model = make_scae(dict(
        image_shape=(1, 40, 40),
        n_classes=10,
        n_part_caps=40,
        n_obj_caps=32,
        scae_params=dict(reconstruct_alternatives=False),
    ))
    tx = make_optimizer("rmsprop", 3e-5, batch_size=BATCH,
                        lr_decay_rate=0.997, decay_steps=429)

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(BATCH, 1, 40, 40), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 10, BATCH), jnp.int32),
    }
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))

    def train_step(state, batch):
        aug_rng = jax.random.fold_in(state.rng, state.step)
        images = random_translate(batch["image"], aug_rng, max_shift=6)
        step_rng = jax.random.fold_in(state.rng, state.step + 1)

        def lf(params):
            res = model.apply({"params": params}, images,
                              deterministic=False,
                              rngs={"noise": step_rng})
            loss, log = model.loss(res, images, batch["label"])
            return loss, log

        (loss, _), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss

    step_fn = jax.jit(train_step, donate_argnums=(0,))

    for _ in range(WARMUP_STEPS):
        state, loss = step_fn(state, batch)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(BENCH_STEPS):
        state, loss = step_fn(state, batch)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    images_per_sec = BENCH_STEPS * BATCH / dt
    print(json.dumps({
        "metric": "mnist_scae_train_images_per_sec_per_chip",
        "value": round(images_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / NORTH_STAR, 4),
    }))


if __name__ == "__main__":
    main()
