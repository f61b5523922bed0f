"""Reliable per-stage device timing: chain K iterations of each stage in
one lax.scan dispatch (serial dependency through the carry), sync with a
value read. python tools/profile_scan.py [batch]
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
K = 30


def timed_scan(stage_fn, feed):
    """Run K chained iterations of stage_fn; returns ms/iter.

    stage_fn: (carry_scalar, feed) -> scalar; the scalar carry chains
    iterations so XLA cannot parallelize or elide them.
    """

    def body(carry, _):
        out = stage_fn(carry, feed)
        return out, ()

    @jax.jit
    def run(feed):
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return out

    float(run(feed))  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(feed))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def main():
    import os
    model = make_scae(dict(
        image_shape=(1, 40, 40), n_classes=10,
        n_part_caps=40, n_obj_caps=32,
        pcae_cnn_encoder_params=dict(compute_dtype=os.environ.get(
            "SCAE_PROFILE_CNN_DTYPE", "float32")),
        pcae_decoder_params=dict(
            fused_tap_dtype="bfloat16",
            fused_impl=os.environ.get("SCAE_PROFILE_IMPL", "xla")),
        scae_params=dict(reconstruct_alternatives=False),
    ))
    tx = make_optimizer("rmsprop", 3e-5, batch_size=BATCH)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BATCH, 1, 40, 40), jnp.float32)
    label = jnp.asarray(rng.randint(0, 10, BATCH), jnp.int32)
    state = create_train_state(model, tx, {"image": img, "label": label},
                               jax.random.PRNGKey(0))
    params = state.params
    M = 40

    def perturb(x, c):
        return x + c * 1e-12

    report = {}

    # --- part encoder fwd
    def pe(c, feed):
        res = model.part_encoder.apply({"params": params["part_encoder"]},
                                       perturb(feed, c))
        return jnp.sum(res.pose) * 1e-12 + c
    report["part_encoder fwd"] = timed_scan(pe, img)
    print("part_encoder fwd", report["part_encoder fwd"], flush=True)

    # --- full fwd + loss
    def fl(c, feed):
        res = model.apply({"params": params}, perturb(feed, c),
                          deterministic=True)
        loss, _ = model.loss(res, feed, label)
        return loss * 1e-12 + c
    report["fwd+loss"] = timed_scan(fl, img)
    print("fwd+loss", report["fwd+loss"], flush=True)

    # --- fwd+loss+grad (sum of grads feeds carry)
    def fg(c, feed):
        def lf(p):
            res = model.apply({"params": p}, perturb(feed, c),
                              deterministic=True)
            return model.loss(res, feed, label)[0]
        loss, grads = jax.value_and_grad(lf)(params)
        gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
        return (loss + gsum) * 1e-12 + c
    report["fwd+loss+grad"] = timed_scan(fg, img)
    print("fwd+loss+grad", report["fwd+loss+grad"], flush=True)

    # --- decoder + ll fwd
    templates = jnp.asarray(rng.rand(BATCH, M, 1, 11, 11), jnp.float32)
    pose = jnp.asarray(rng.randn(BATCH, M, 6) * 0.1
                       + np.asarray([1, 0, 0, 0, 1, 0]), jnp.float32)
    presence = jnp.asarray(rng.rand(BATCH, M), jnp.float32)

    def dec(c, feed):
        out = model.part_decoder.apply({"params": params["part_decoder"]},
                                       perturb(feed, c), pose, presence,
                                       target=img)
        return jnp.sum(out.target_ll) * 1e-12 + c
    report["decoder+ll fwd"] = timed_scan(dec, templates)
    print("decoder+ll fwd", report["decoder+ll fwd"], flush=True)

    def decg(c, feed):
        def lf(t, po, pr):
            out = model.part_decoder.apply(
                {"params": params["part_decoder"]}, t, po, pr, target=img)
            return jnp.sum(out.target_ll)
        g = jax.grad(lf, argnums=(0, 1, 2))(perturb(feed, c), pose,
                                            presence)
        return sum(jnp.sum(x) for x in g) * 1e-12 + c
    report["decoder+ll grad"] = timed_scan(decg, templates)
    print("decoder+ll grad", report["decoder+ll grad"], flush=True)

    # --- set transformer fwd / grad
    pwt = jnp.asarray(rng.rand(BATCH, M, 144), jnp.float32)

    def st(c, feed):
        out = model.obj_encoder.apply({"params": params["obj_encoder"]},
                                      perturb(feed, c), presence)
        return jnp.sum(out) * 1e-12 + c
    report["set_transformer fwd"] = timed_scan(st, pwt)

    def stg(c, feed):
        g = jax.grad(lambda x: jnp.sum(model.obj_encoder.apply(
            {"params": params["obj_encoder"]}, x, presence)))(
            perturb(feed, c))
        return jnp.sum(g) * 1e-12 + c
    report["set_transformer grad"] = timed_scan(stg, pwt)

    # --- capsule obj decoder fwd / grad
    enc = jnp.asarray(rng.rand(BATCH, 32, 256), jnp.float32)

    def od(c, feed):
        out = model.obj_decoder.apply({"params": params["obj_decoder"]},
                                      perturb(feed, c), pose, presence)
        return out.log_prob * 1e-12 + c
    report["obj_decoder fwd"] = timed_scan(od, enc)

    def odg(c, feed):
        g = jax.grad(lambda x: model.obj_decoder.apply(
            {"params": params["obj_decoder"]}, x, pose,
            presence).log_prob)(perturb(feed, c))
        return jnp.sum(g) * 1e-12 + c
    report["obj_decoder grad"] = timed_scan(odg, enc)

    # --- cnn encoder fwd/grad only
    def cnng(c, feed):
        g = jax.grad(lambda x: jnp.sum(model.part_encoder.apply(
            {"params": params["part_encoder"]}, x).pose))(perturb(feed, c))
        return jnp.sum(g) * 1e-12 + c
    report["part_encoder grad"] = timed_scan(cnng, img)

    # --- full train step via scan (ground truth)
    augment = make_augment_fn(canvas=40, max_shift=6)
    step = make_fused_train_step(model, tx, augment)
    n_data = 1024
    data = {"image": jnp.asarray(rng.randint(0, 256, (n_data, 28, 28)),
                                 jnp.uint8),
            "label": jnp.asarray(rng.randint(0, 10, n_data), jnp.int32)}
    idxs = jnp.asarray(rng.randint(0, n_data, (K, BATCH)).astype(np.int32))

    @jax.jit
    def run_steps(state, idxs):
        def body(s, idx):
            s2, m = step(s, data, idx)
            return s2, m["loss"]
        s, losses = jax.lax.scan(body, state, idxs)
        return losses[-1]

    float(run_steps(state, idxs))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_steps(state, idxs))
        best = min(best, time.perf_counter() - t0)
    report["FULL train step"] = best / K * 1e3

    for k, v in report.items():
        print(f"{k:24s} {v:8.3f} ms")
    print(f"throughput: {BATCH / report['FULL train step'] * 1000:.0f} img/s")


if __name__ == "__main__":
    main()
