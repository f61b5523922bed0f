"""Capture a jax.profiler trace of the fused train step and print the
per-op device-time breakdown (top ops + per-phase totals).

The per-stage wall timers (profile_step/profile_scan) are dominated by
tunnel variance at ~1 ms granularity; the xplane trace gives exact
device-side op durations. Usage:

    python tools/trace_step.py [impl] [batch]   # impl: gather|xla

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
SCAN_STEPS = 20


def build_step():
    from scae_tpu.factory import make_scae
    from scae_tpu.optim import make_optimizer
    from scae_tpu.parallel.train_step import (
        create_train_state,
        make_train_scan,
    )
    from scae_tpu.train.loop import make_augment_fn

    model = make_scae(dict(
        image_shape=(1, 40, 40), n_classes=10,
        n_part_caps=40, n_obj_caps=32,
        pcae_cnn_encoder_params=dict(compute_dtype="bfloat16"),
        pcae_decoder_params=dict(fused_impl=IMPL,
                                 fused_tap_dtype="bfloat16"),
        scae_params=dict(reconstruct_alternatives=False),
    ))
    tx = make_optimizer("rmsprop", 3e-5, batch_size=BATCH)
    augment = make_augment_fn(canvas=40, max_shift=6)
    jscan = make_train_scan(model, tx, augment, donate=False)

    rng = np.random.RandomState(0)
    n_data = 1024
    data = {
        "image": jnp.asarray(
            rng.randint(0, 256, (n_data, 28, 28)), jnp.uint8),
        "label": jnp.asarray(rng.randint(0, 10, n_data), jnp.int32),
    }
    example = {
        "image": jnp.zeros((BATCH, 1, 40, 40), jnp.float32),
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
