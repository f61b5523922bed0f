"""Benchmark: SCAE training throughput (images/sec/chip) + MFU.

Measures the real training path per config: device-resident dataset,
on-device pad+random-translate augmentation, fused fwd + 8-term loss +
grad + optimizer, K steps per dispatch via lax.scan (scae_tpu.parallel).

Prints ONE JSON line. The primary metric is the flagship MNIST 40x40
config (B=128, M=40, O=32) against the driver north star of 20_000
images/sec/chip (BASELINE.json; the reference publishes no throughput
numbers - BASELINE.md). Extra keys: "mfu" (model FLOPs utilization from
XLA's compiled cost analysis against the chip's bf16 peak) and "configs"
(staged workloads from BASELINE.json: mnist28 / svhn / cifar10), measured
while the total run stays inside a time budget.

Env knobs:
  SCAE_BENCH_IMPL=auto|xla|pallas|gather
      fused decoder-ll implementation. Default 'auto' = the gather
      kernel (exact 4-tap warp, tools/ab_banded_ll.py: 2.4x over the
      dense kernels) where the template fits a 256-texel table (TBL_MAX
      in pallas_decoder_ll_gather.py; >128 texels use the two-vreg
      gather+select path the svhn/cifar configs rely on), XLA einsum
      path otherwise.
  SCAE_BENCH_FLAGSHIP_ONLY=1   skip the staged configs

MFU accounting: flops/step comes from XLA's cost analysis of the
einsum-path step (fused_impl='xla') regardless of the benched impl —
Pallas kernel internals are invisible to XLA's cost model, and model
FLOPs are implementation-independent, so this is the honest numerator.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR = 20_000.0  # images/sec/chip, BASELINE.json north_star
# B=128 is the reference's training batch (mnist/hparams) and the
# headline metric; SCAE_BENCH_BATCH measures throughput/MFU scaling at
# other sizes (BASELINE.md batch-scaling table)
BATCH = int(os.environ.get("SCAE_BENCH_BATCH", "128"))
SCAN_STEPS = 100       # steps fused per dispatch (amortizes link latency)
REPEATS = 6            # timed dispatches; best-of is reported (the
                       # tunneled chip shows large run-to-run latency
                       # variance from the shared link)
TIME_BUDGET_S = 640    # stop starting new configs after this much wall

# v5e peak: 197 TFLOP/s bf16 / 98.5 f32 (public spec). MFU is reported
# against bf16 peak — the honest number for a mixed bf16/f32 step.
PEAK_FLOPS = 197e12

CONFIGS = {
    # name -> (model kwargs, image size fed to the pipeline, canvas)
    "mnist28": (dict(image_shape=(1, 28, 28), n_classes=10,
                     n_part_caps=24, n_obj_caps=24), 28, 28),
    "svhn": (dict(image_shape=(3, 32, 32), n_classes=10,
                  n_part_caps=24, n_obj_caps=32,
                  pcae_template_generator_params=dict(
                      template_size=(14, 14))), 32, 32),
    "cifar10": (dict(image_shape=(3, 32, 32), n_classes=10,
                     n_part_caps=32, n_obj_caps=64,
                     pcae_template_generator_params=dict(
                         template_size=(14, 14))), 32, 32),
}


def _bench_config(model_kwargs, data_size, canvas, scan_steps, repeats,
                  fused_impl):
    from scae_tpu.factory import make_scae
    from scae_tpu.optim import make_optimizer
    from scae_tpu.parallel.train_step import (
        create_train_state,
        make_train_scan,
    )
    from scae_tpu.train.loop import make_augment_fn

    def build(impl):
        mk = dict(model_kwargs)
        mk.setdefault("pcae_cnn_encoder_params",
                      dict(compute_dtype="bfloat16"))
        pd = dict(mk.get("pcae_decoder_params") or {})
        pd.setdefault("fused_tap_dtype", "bfloat16")
        pd["fused_impl"] = impl
        mk["pcae_decoder_params"] = pd
        sp = dict(mk.get("scae_params") or {})
        sp.setdefault("reconstruct_alternatives", False)
        mk["scae_params"] = sp
        return make_scae(mk), mk

    model, mk = build(fused_impl)
    tx = make_optimizer("rmsprop", 3e-5, batch_size=BATCH,
                        lr_decay_rate=0.997, decay_steps=429)

    c, h, _ = mk["image_shape"]
    rng = np.random.RandomState(0)
    n_data = 4096
    raw_shape = (n_data, data_size, data_size) if c == 1 else \
        (n_data, data_size, data_size, c)
    data = {
        "image": jnp.asarray(rng.randint(0, 256, raw_shape), jnp.uint8),
        "label": jnp.asarray(rng.randint(0, 10, n_data), jnp.int32),
    }
    example = {
        "image": jnp.zeros((BATCH, c, h, h), jnp.float32),
        "label": jnp.zeros((BATCH,), jnp.int32),
    }
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0))

    augment = make_augment_fn(canvas=canvas,
                              max_shift=6 if canvas > data_size else 0)
    scan_fn = make_train_scan(model, tx, augment_fn=augment)

    def chunk_idxs(seed):
        r = np.random.RandomState(seed)
        return jnp.asarray(
            r.randint(0, n_data, (scan_steps, BATCH)).astype(np.int32))

    # analytic FLOPs per TRAIN STEP from XLA's own cost model. The scan
    # program reports its while-body flops only once (not x trip count),
    # so lower a single fused step instead.
    flops_per_step = None
    try:
        from scae_tpu.parallel.train_step import make_fused_train_step

        # model FLOPs from the einsum-path lowering (see module doc)
        xla_model, _ = build("xla")
        single = jax.jit(make_fused_train_step(xla_model, tx,
                                               augment_fn=augment))
        ca = single.lower(state, data,
                          chunk_idxs(0)[0]).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_step = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    # warmup / compile. NOTE: sync via a host value read — on the
    # experimental axon platform block_until_ready can return before the
    # execution finishes, which would wildly overstate throughput.
    state, metrics = scan_fn(state, data, chunk_idxs(0))
    float(metrics["loss"][-1])

    best = float("inf")
    for i in range(repeats):
        idxs = chunk_idxs(100 + i)
        float(jnp.sum(idxs))
        t0 = time.perf_counter()
        state, metrics = scan_fn(state, data, idxs)
        float(metrics["loss"][-1])
        best = min(best, time.perf_counter() - t0)

    images_per_sec = scan_steps * BATCH / best
    mfu = None
    if flops_per_step:
        mfu = (flops_per_step * scan_steps / best) / PEAK_FLOPS
    return images_per_sec, mfu


def main():
    t_start = time.time()
    fused_impl = os.environ.get("SCAE_BENCH_IMPL", "auto")

    flagship = dict(
        image_shape=(1, 40, 40), n_classes=10,
        n_part_caps=40, n_obj_caps=32,
    )
    ips, mfu = _bench_config(flagship, 28, 40, SCAN_STEPS, REPEATS,
                             fused_impl)

    result = {
        "metric": "mnist_scae_train_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / NORTH_STAR, 4),
        "fused_impl": fused_impl,
    }
    if mfu is not None:
        result["mfu"] = round(mfu, 4)

    # The 100-step headline is knowingly ~12% dispatch-diluted vs the
    # traced 55.3k device ceiling (BASELINE.md round 4): each dispatch
    # pays ~30 ms tunnel RTT. Real training dispatches eval-period-long
    # scans, so ALSO measure the flagship at 200 steps/dispatch — the
    # same series-break treatment the staged configs got in round 4 —
    # and report both (VERDICT r4 ask #7). "value" stays the 100-step
    # series number for r1-r5 comparability.
    if not os.environ.get("SCAE_BENCH_FLAGSHIP_ONLY"):
        try:
            ips200, _ = _bench_config(flagship, 28, 40, scan_steps=200,
                                      repeats=3, fused_impl=fused_impl)
            result["value_200step_scan"] = round(ips200, 1)
        except Exception as e:  # pragma: no cover - defensive
            result["value_200step_scan"] = f"error:{type(e).__name__}"

    if not os.environ.get("SCAE_BENCH_FLAGSHIP_ONLY"):
        extras = {}
        for name, (mk, data_size, canvas) in CONFIGS.items():
            if time.time() - t_start > TIME_BUDGET_S:
                extras[name] = "skipped:time_budget"
                continue
            try:
                # 200 steps/dispatch: the staged shapes run 1.1-2.6 ms
                # device steps, so the ~30 ms tunnel-dispatch RTT was
                # 15-33% of a 50-step scan's wall (measured round 4 —
                # logs/r4_traces vs BENCH_r03). Real training dispatches
                # eval-period-long scans (train/loop.py chunking), so
                # long scans are the representative measurement.
                ips_c, mfu_c = _bench_config(mk, data_size, canvas,
                                             scan_steps=200, repeats=3,
                                             fused_impl=fused_impl)
                extras[name] = {"images_per_sec": round(ips_c, 1)}
                if mfu_c is not None:
                    extras[name]["mfu"] = round(mfu_c, 4)
            except Exception as e:  # pragma: no cover - defensive
                extras[name] = f"error:{type(e).__name__}"
        result["configs"] = extras

    print(json.dumps(result))


if __name__ == "__main__":
    main()
