"""Capture a jax.profiler trace of the fused train step and print the
per-op device-time breakdown (top ops + per-phase totals).

The per-stage wall timers (profile_step/profile_scan) are dominated by
tunnel variance at ~1 ms granularity; the xplane trace gives exact
device-side op durations. Usage:

    python tools/trace_step.py [impl] [batch] [config]
    # impl: gather|xla|auto; config: flagship|mnist28|svhn|cifar10
    # (staged configs import bench.py's CONFIGS so the traced shapes
    # are exactly the benched shapes)

Parses the raw .xplane.pb with tensorflow's xplane proto (the
tensorboard profile plugin is too heavy to drive headless).
"""

import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

IMPL = sys.argv[1] if len(sys.argv) > 1 else "gather"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 128
CONFIG = sys.argv[3] if len(sys.argv) > 3 else "flagship"
SCAN_STEPS = 20


def _config():
    """(model kwargs, data size, canvas) — staged shapes from bench.py."""
    if CONFIG == "flagship":
        return (dict(image_shape=(1, 40, 40), n_classes=10,
                     n_part_caps=40, n_obj_caps=32), 28, 40)
    from bench import CONFIGS

    return CONFIGS[CONFIG]


def build_step():
    from scae_tpu.factory import make_scae
    from scae_tpu.optim import make_optimizer
    from scae_tpu.parallel.train_step import (
        create_train_state,
        make_train_scan,
    )
    from scae_tpu.train.loop import make_augment_fn

    mk, data_size, canvas = _config()
    mk = dict(mk)
    mk.setdefault("pcae_cnn_encoder_params",
                  dict(compute_dtype="bfloat16"))
    pd = dict(mk.get("pcae_decoder_params") or {})
    pd.setdefault("fused_tap_dtype", "bfloat16")
    pd["fused_impl"] = IMPL
    mk["pcae_decoder_params"] = pd
    sp = dict(mk.get("scae_params") or {})
    sp.setdefault("reconstruct_alternatives", False)
    mk["scae_params"] = sp
    model = make_scae(mk)
    c, h, _ = mk["image_shape"]
    tx = make_optimizer("rmsprop", 3e-5, batch_size=BATCH)
    augment = make_augment_fn(canvas=canvas,
                              max_shift=6 if canvas > data_size else 0)
    jscan = make_train_scan(model, tx, augment, donate=False)

    rng = np.random.RandomState(0)
    n_data = 1024
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
    idx = jnp.asarray(
        rng.randint(0, n_data, (SCAN_STEPS, BATCH)).astype(np.int32))
    return jscan, state, data, idx


def capture(jscan, state, data, idx, trace_dir):
    # warm (compile) outside the trace
    out = jscan(state, data, idx)
    jax.tree.leaves(out)[1].block_until_ready()
    float(jnp.sum(jax.tree.leaves(out)[1]))
    jax.profiler.start_trace(trace_dir)
    out = jscan(state, data, idx)
    float(jnp.sum(jax.tree.leaves(out)[1]))
    jax.profiler.stop_trace()


def parse(trace_dir):
    """Read the Chrome-format trace (pid 3 = the TPU device, tid 3 =
    'XLA Ops'); aggregate op durations by HLO category and print the
    top individual ops. The .xplane.pb twin needs protos this image
    doesn't ship; the json.gz carries the same per-op args
    (hlo_category, long_name, bytes_accessed)."""
    import gzip
    import json

    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace.json.gz captured")
        return
    with gzip.open(sorted(paths)[-1]) as f:
        tr = json.load(f)

    dev_pids = {
        e["pid"] for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    op_tids = {
        (e["pid"], e["tid"]) for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e.get("args", {}).get("name") == "XLA Ops"
        and e["pid"] in dev_pids
    }
    ev = [e for e in tr["traceEvents"]
          if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids]
    loops = [e for e in ev if e["name"].startswith("while")]
    ev = [e for e in ev if not e["name"].startswith("while")]
    for e in loops:
        print(f"{e['name']}: {e.get('dur', 0)/1e3/SCAN_STEPS:.3f} ms/step")

    cat = defaultdict(float)
    ccnt = defaultdict(int)
    per_op = defaultdict(float)
    long_names = {}
    for e in ev:
        a = e.get("args", {})
        dur = e.get("dur", 0) / 1e3  # us -> ms
        cat[a.get("hlo_category", "?")] += dur
        ccnt[a.get("hlo_category", "?")] += 1
        per_op[e["name"]] += dur
        long_names.setdefault(e["name"], a.get("long_name", ""))
    total = sum(cat.values())
    print(f"op total {total/SCAN_STEPS*1e3:.0f} us/step, "
          f"{len(ev)/SCAN_STEPS:.0f} ops/step")
    print("\nby category:")
    for c, ms in sorted(cat.items(), key=lambda kv: -kv[1]):
        print(f"{ms/SCAN_STEPS*1e3:9.1f} us/step x{ccnt[c]/SCAN_STEPS:7.1f}  {c}")
    print("\ntop ops:")
    for nm, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms/SCAN_STEPS*1e3:9.1f} us/step  {nm:32s} "
              f"{long_names[nm][:120]}")


def main():
    trace_dir = os.environ.get(
        "SCAE_TRACE_DIR", tempfile.mkdtemp(prefix="scae_trace_"))
    jscan, state, data, idx = build_step()
    capture(jscan, state, data, idx, trace_dir)
    print(f"trace dir: {trace_dir}")
    parse(trace_dir)


if __name__ == "__main__":
    main()
