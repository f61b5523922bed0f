"""Per-stage timing on the real chip with TRUE host sync (value read).

The axon platform's block_until_ready can return early; every timing here
forces a scalar transfer. Usage: python tools/profile_step.py [batch]
"""

import sys
import time

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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / n * 1e3  # ms


def scalarize(f):
    """Reduce outputs to one scalar so only tiny transfers happen."""
    def g(*args):
        out = f(*args)
        return jax.tree.map(lambda x: jnp.sum(x),
                            jax.tree.leaves(out)[0])
    return g


def main():
    model = make_scae(dict(
        image_shape=(1, 40, 40), n_classes=10,
        n_part_caps=40, n_obj_caps=32,
        scae_params=dict(reconstruct_alternatives=False),
    ))
    tx = make_optimizer("rmsprop", 3e-5, batch_size=BATCH)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BATCH, 1, 40, 40), jnp.float32)
    label = jnp.asarray(rng.randint(0, 10, BATCH), jnp.int32)
    batch = {"image": img, "label": label}
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    params = state.params

    report = {}

    # sub-stage forwards
    pe = jax.jit(scalarize(lambda p, x: model.part_encoder.apply(
        {"params": p["part_encoder"]}, x).pose))
    report["part_encoder fwd"] = timeit(pe, params, img)

    def fwd_all(p, x):
        return model.apply({"params": p}, x, deterministic=True)

    f_fwd = jax.jit(scalarize(lambda p, x: fwd_all(p, x).obj.log_prob))
    report["full fwd"] = timeit(f_fwd, params, img)

    def floss(p, x, y):
        res = model.apply({"params": p}, x, deterministic=True)
        return model.loss(res, x, y)[0]

    report["fwd+loss"] = timeit(jax.jit(floss), params, img, label)

    def fgrad(p, x, y):
        loss, grads = jax.value_and_grad(floss)(p, x, y)
        return loss + sum(jnp.sum(jnp.abs(g))
                          for g in jax.tree.leaves(grads)) * 0.0
    report["fwd+loss+grad"] = timeit(jax.jit(fgrad), params, img, label)

    # full fused step (as trained)
    augment = make_augment_fn(canvas=40, max_shift=6)
    step = make_fused_train_step(model, tx, augment)
    n_data = 1024
    data = {"image": jnp.asarray(rng.randint(0, 256, (n_data, 28, 28)),
                                 jnp.uint8),
            "label": jnp.asarray(rng.randint(0, 10, n_data), jnp.int32)}
    idx = jnp.asarray(rng.randint(0, n_data, (BATCH,)).astype(np.int32))
    jstep = jax.jit(lambda s, d, i: step(s, d, i)[1]["loss"])
    report["full train step"] = timeit(jstep, state, data, idx)

    # decoder + ll alone
    M = 40
    templates = jnp.asarray(rng.rand(BATCH, M, 1, 11, 11), jnp.float32)
    pose = jnp.asarray(rng.randn(BATCH, M, 6) * 0.1
                       + np.asarray([1, 0, 0, 0, 1, 0]), jnp.float32)
    presence = jnp.asarray(rng.rand(BATCH, M), jnp.float32)

    def dec_ll(p, t, po, pr, tgt):
        out = model.part_decoder.apply({"params": p["part_decoder"]},
                                       t, po, pr)
        return jnp.sum(out.pdf.log_prob(tgt))

    report["decoder+ll fwd"] = timeit(jax.jit(dec_ll), params, templates,
                                      pose, presence, img)
    dgrad = jax.jit(lambda p, t, po, pr, tgt: sum(
        jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(
            jax.grad(dec_ll, argnums=(1, 2, 3))(p, t, po, pr, tgt))))
    report["decoder+ll grad"] = timeit(dgrad, params, templates, pose,
                                       presence, img)

    # set transformer alone
    pwt = jnp.asarray(rng.rand(BATCH, M, 144), jnp.float32)
    st = jax.jit(scalarize(lambda p, x, pr: model.obj_encoder.apply(
        {"params": p["obj_encoder"]}, x, pr)))
    report["set_transformer fwd"] = timeit(st, params, pwt, presence)

    # capsule decoder alone
    enc = jnp.asarray(rng.rand(BATCH, 32, 256), jnp.float32)
    od = jax.jit(scalarize(lambda p, e, po, pr: model.obj_decoder.apply(
        {"params": p["obj_decoder"]}, e, po, pr).log_prob))
    report["obj_decoder fwd"] = timeit(od, params, enc, pose, presence)

    for k, v in report.items():
        print(f"{k:24s} {v:8.3f} ms")
    print(f"train-step throughput: {BATCH / report['full train step']:.1f}"
          " img/ms")


if __name__ == "__main__":
    main()
