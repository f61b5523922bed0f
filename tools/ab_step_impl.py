"""In-process A/B of the FULL train step across fused_impl choices.
Scan-fused (50 steps/dispatch), host-value-read sync.
Usage: python tools/ab_step_impl.py [impl ...]  (default: xla gather)"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from scae_tpu.factory import make_scae
from scae_tpu.optim import make_optimizer
from scae_tpu.parallel.train_step import create_train_state, make_train_scan
from scae_tpu.train.loop import make_augment_fn

BATCH, K = 128, 50
rng = np.random.RandomState(0)
n_data = 4096
data = {"image": jnp.asarray(rng.randint(0, 256, (n_data, 28, 28)), jnp.uint8),
        "label": jnp.asarray(rng.randint(0, 10, n_data), jnp.int32)}
example = {"image": jnp.zeros((BATCH, 1, 40, 40), jnp.float32),
           "label": jnp.zeros((BATCH,), jnp.int32)}
idxs = jnp.asarray(rng.randint(0, n_data, (K, BATCH)).astype(np.int32))

def bench(impl):
    model = make_scae(dict(
        image_shape=(1, 40, 40), n_classes=10, n_part_caps=40, n_obj_caps=32,
        pcae_cnn_encoder_params=dict(compute_dtype="bfloat16"),
        pcae_decoder_params=dict(fused_tap_dtype="bfloat16",
                                 fused_impl=impl),
        scae_params=dict(reconstruct_alternatives=False)))
    tx = make_optimizer("rmsprop", 3e-5, batch_size=BATCH)
    state = create_train_state(model, tx, example, jax.random.PRNGKey(0))
    scan_fn = make_train_scan(model, tx,
                              augment_fn=make_augment_fn(40, 6))
    t0 = time.perf_counter()
    state, m = scan_fn(state, data, idxs)
    float(m["loss"][-1])
    print(f"{impl}: compile+first {time.perf_counter()-t0:.1f}s")
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        state, m = scan_fn(state, data, idxs)
        float(m["loss"][-1])
        best = min(best, (time.perf_counter()-t0)/K)
    print(f"{impl}: best step {best*1e3:.2f} ms -> {BATCH/best:.0f} img/s")
    return best

which = sys.argv[1:] or ["xla", "gather"]
res = {name: bench(name) for name in which}
base = which[0]
for name in which[1:]:
    print(f"step speedup {name} vs {base}: {res[base]/res[name]:.3f}x")
