"""Inference throughput of a serving artifact (scae_tpu.serve).

Loads an exported artifact (tools/export_model.py) and measures
steady-state batch inference images/sec on this host's backend, plus
the same model driven live (jit of make_infer_fn) for comparison —
the AOT artifact should match the live path; a gap means the export
lowered something differently.

Prints one JSON line:
  {"artifact_images_per_sec": N, "live_images_per_sec": N,
   "batch_size": B, "backend": "...", "outputs": [...]}

Usage:
    python tools/bench_serving.py ARTIFACT_DIR [--repeats 20]
        [-- config overrides for the live comparison, e.g. model=mnist28]

The live comparison needs the artifact's model_config (recorded in the
manifest), so no overrides are usually necessary.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu import factory, serve


def _time_fn(fn, batch, repeats, sync_key):
    """Best-of timing with a host-value sync (block_until_ready can
    return early on the experimental axon platform — bench.py note)."""
    out = fn(batch)
    float(jnp.sum(out[sync_key]))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(batch)
        float(jnp.sum(out[sync_key]))
        best = min(best, time.perf_counter() - t0)
    return best


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:
        argv = argv[:argv.index("--")]
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("artifact_dir")
    ap.add_argument("--repeats", type=int, default=20)
    args = ap.parse_args(argv)

    served = serve.load_serving(args.artifact_dir)
    b, c, h, w = served.input_shape
    b = b or 128  # polymorphic-batch artifact: pick a serving batch
    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.rand(b, c, h, w), jnp.float32)
    sync_key = ("posterior_cls_prob"
                if "posterior_cls_prob" in served.manifest["outputs"]
                else "caps_presence")

    t_art = _time_fn(served, batch, args.repeats, sync_key)

    result = {
        "artifact_images_per_sec": round(b / t_art, 1),
        "batch_size": b,
        "backend": jax.default_backend(),
        "outputs": served.manifest["outputs"],
    }

    mk = served.manifest.get("model_config")
    if mk:
        model = factory.make_scae(dict(mk))
        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            image=jnp.zeros((b, c, h, w), jnp.float32),
            deterministic=True)["params"]
        # timing only — random params run the same program as trained ones
        live = jax.jit(serve.make_infer_fn(
            model, with_reconstruction=served.manifest[
                "with_reconstruction"]))
        t_live = _time_fn(lambda x: live(params, x), batch,
                          args.repeats, sync_key)
        result["live_images_per_sec"] = round(b / t_live, 1)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
