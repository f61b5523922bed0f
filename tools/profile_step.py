"""Break down train-step time on the real chip: which stage dominates?

Usage: python tools/profile_step.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scae_tpu.factory import make_scae
from scae_tpu.optim import make_optimizer
from scae_tpu.parallel.train_step import create_train_state
from scae_tpu.train.data import random_translate

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128


def timeit(fn, *args, n=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    model = make_scae(dict(
        image_shape=(1, 40, 40), n_classes=10,
        n_part_caps=40, n_obj_caps=32,
        scae_params=dict(reconstruct_alternatives=False),
    ))
    tx = make_optimizer("rmsprop", 3e-5, batch_size=BATCH)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(BATCH, 1, 40, 40), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 10, BATCH), jnp.int32),
    }
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    params = state.params
    key = jax.random.PRNGKey(1)

    # stage 1: part encoder only
    pe_fn = jax.jit(lambda p, x: model.part_encoder.apply(
        {"params": p["part_encoder"]}, x))
    print(f"part_encoder fwd: {timeit(pe_fn, params, batch['image']):.3f} ms")

    # full forward
    fwd = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, deterministic=True).obj.log_prob)
    print(f"full fwd:         {timeit(fwd, params, batch['image']):.3f} ms")

    # forward + loss
    def floss(p, x, y):
        res = model.apply({"params": p}, x, deterministic=True)
        return model.loss(res, x, y)[0]

    fl = jax.jit(floss)
    print(f"fwd+loss:         "
          f"{timeit(fl, params, batch['image'], batch['label']):.3f} ms")

    # grad
    gr = jax.jit(lambda p, x, y: jax.grad(floss)(p, x, y))
    g = gr(params, batch["image"], batch["label"])
    print(f"fwd+loss+grad:    "
          f"{timeit(gr, params, batch['image'], batch['label']):.3f} ms")

    # full step
    def step(state, batch):
        aug_rng = jax.random.fold_in(state.rng, state.step)
        images = random_translate(batch["image"], aug_rng, max_shift=6)
        step_rng = jax.random.fold_in(state.rng, state.step + 1)

        def lf(p):
            res = model.apply({"params": p}, images, deterministic=False,
                              rngs={"noise": step_rng})
            return model.loss(res, images, batch["label"])[0]

        loss, grads = jax.value_and_grad(lf)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=opt_state), loss

    stf = jax.jit(step)

    def run_step(s, b):
        s2, l = stf(s, b)
        return l

    print(f"full train step:  {timeit(run_step, state, batch):.3f} ms"
          f"  (-> {BATCH / (timeit(run_step, state, batch) / 1e3):.0f}"
          " img/s)")

    # decoder-only (warp + GMM ll) timing
    B, M = BATCH, 40
    templates = jnp.asarray(rng.rand(B, M, 1, 11, 11), jnp.float32)
    pose = jnp.asarray(rng.randn(B, M, 6) * 0.1 + np.asarray(
        [1, 0, 0, 0, 1, 0]), jnp.float32)
    presence = jnp.asarray(rng.rand(B, M), jnp.float32)

    def dec_ll(p, t, po, pr, target):
        out = model.part_decoder.apply({"params": p["part_decoder"]},
                                       t, po, pr)
        return jnp.sum(out.pdf.log_prob(target))

    dl = jax.jit(dec_ll)
    print(f"decoder+ll fwd:   "
          f"{timeit(dl, params, templates, pose, presence, batch['image']):.3f}"
          " ms")
    dlg = jax.jit(jax.grad(dec_ll, argnums=(1, 2, 3)))
    out = dlg(params, templates, pose, presence, batch["image"])
    print(f"decoder+ll grad:  "
          f"{timeit(dlg, params, templates, pose, presence, batch['image']):.3f}"
          " ms")


if __name__ == "__main__":
    main()
