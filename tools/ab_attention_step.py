"""In-step A/B of the Pallas attention kernel (the decisive measurement).

Op-level micro-benches through the tunneled axon link are dispatch-bound
(~1.3 ms floor at any shape — tools/ab_attention_regimes.py), so the
demotion decision (BASELINE.md round 3) rests on full-train-step A/Bs:

    flagship, GT_MODE=fullwidth:     4.27 -> 4.52 ms/step  (0.946x)
    flagship, GT_MODE=split:         3.40 -> 3.77 ms/step  (0.901x)
    ISAB n_inducing_points=256:      3.80 -> 4.75 ms/step  (0.801x)

Run on the TPU: python tools/ab_attention_step.py [--isab 256]
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.factory import make_scae
from scae_tpu.optim import make_optimizer
from scae_tpu.parallel.train_step import create_train_state, make_train_scan
from scae_tpu.train.loop import make_augment_fn

BATCH, K = 128, 50


def bench(pallas_attn, n_inducing):
    rng = np.random.RandomState(0)
    n_data = 4096
    data = {"image": jnp.asarray(rng.randint(0, 256, (n_data, 28, 28)),
                                 jnp.uint8),
            "label": jnp.asarray(rng.randint(0, 10, n_data), jnp.int32)}
    example = {"image": jnp.zeros((BATCH, 1, 40, 40), jnp.float32),
               "label": jnp.zeros((BATCH,), jnp.int32)}
    idxs = jnp.asarray(rng.randint(0, n_data, (K, BATCH)).astype(np.int32))

    st_params = dict(n_inducing_points=n_inducing)
    model = make_scae(dict(
        image_shape=(1, 40, 40), n_classes=10, n_part_caps=40, n_obj_caps=32,
        pcae_cnn_encoder_params=dict(compute_dtype="bfloat16"),
        pcae_decoder_params=dict(fused_tap_dtype="bfloat16",
                                 fused_impl="gather"),
        ocae_encoder_set_transformer_params=st_params,
        scae_params=dict(reconstruct_alternatives=False)))
    # the factory knob was removed (negative result); reach the
    # testing-only flag by rebuilding the obj_encoder module
    if pallas_attn:
        st2 = dataclasses.replace(model.obj_encoder,
                                  use_pallas_attention=True,
                                  parent=None, name=None)
        model = dataclasses.replace(model, obj_encoder=st2,
                                    parent=None, name=None)
    tx = make_optimizer("rmsprop", 3e-5, batch_size=BATCH)
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    scan_fn = make_train_scan(model, tx, augment_fn=make_augment_fn(40, 6))
    state, m = scan_fn(state, data, idxs)
    float(m["loss"][-1])
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        state, m = scan_fn(state, data, idxs)
        float(m["loss"][-1])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"pallas_attn={pallas_attn}: {best * 1e3:.2f} ms/step "
          f"-> {BATCH / best:.0f} img/s")
    return best


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--isab", type=int, default=None,
                    help="n_inducing_points (default: SAB path)")
    args = ap.parse_args()
    a = bench(False, args.isab)
    b = bench(True, args.isab)
    print(f"speedup from pallas: {a / b:.3f}x")
