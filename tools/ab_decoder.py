"""In-process A/B: unfused vs fused decoder-ll forward+grad (same chip,
same process, interleaved repeats)."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.factory import make_scae

B, M, K = 128, 40, 30
model_f32 = make_scae(dict(image_shape=(1, 40, 40), n_classes=10,
                           n_part_caps=40, n_obj_caps=32,
                           pcae_decoder_params=dict(use_fused_ll=False),
                           scae_params=dict(reconstruct_alternatives=False)))
model_fused = make_scae(dict(
    image_shape=(1, 40, 40), n_classes=10, n_part_caps=40, n_obj_caps=32,
    pcae_decoder_params=dict(use_fused_ll=True, fused_tap_dtype="bfloat16"),
    scae_params=dict(reconstruct_alternatives=False)))
model_fused32 = make_scae(dict(
    image_shape=(1, 40, 40), n_classes=10, n_part_caps=40, n_obj_caps=32,
    pcae_decoder_params=dict(use_fused_ll=True, fused_tap_dtype="float32"),
    scae_params=dict(reconstruct_alternatives=False)))

rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(B, 1, 40, 40), jnp.float32)
templates = jnp.asarray(rng.rand(B, M, 1, 11, 11), jnp.float32)
pose = jnp.asarray(rng.randn(B, M, 6) * 0.1
                   + np.asarray([1, 0, 0, 0, 1, 0]), jnp.float32)
presence = jnp.asarray(rng.rand(B, M), jnp.float32)
variables = model_f32.init({"params": jax.random.PRNGKey(0)}, img)
params = variables["params"]


def make_grad_fn(model, use_target):
    def lf(t, po, pr):
        out = model.part_decoder.apply({"params": params["part_decoder"]},
                                       t, po, pr,
                                       target=img if use_target else None)
        ll = out.target_ll if use_target else out.pdf.log_prob(img)
        return jnp.sum(ll)

    def chained(c, t):
        g = jax.grad(lf, argnums=(0, 1, 2))(t + c * 1e-12, pose, presence)
        return sum(jnp.sum(x) for x in g) * 1e-12 + c

    @jax.jit
    def run(t):
        out, _ = jax.lax.scan(lambda c, _: (chained(c, t), ()),
                              jnp.float32(0.0), None, length=K)
        return out

    return run


fns = {
    "unfused f32": make_grad_fn(model_f32, use_target=False),
    "fused f32  ": make_grad_fn(model_fused32, use_target=True),
    "fused bf16 ": make_grad_fn(model_fused, use_target=True),
}
for name, fn in fns.items():
    float(fn(templates))  # compile

results = {name: [] for name in fns}
for rep in range(3):
    for name, fn in fns.items():
        t0 = time.perf_counter()
        float(fn(templates))
        results[name].append((time.perf_counter() - t0) / K * 1e3)

for name, times in results.items():
    print(f"{name}: best {min(times):.3f} ms  all "
          f"{[round(t, 2) for t in times]}")
