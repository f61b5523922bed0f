"""Export a trained run's best checkpoint as a serving artifact.

Restores the monitored-best checkpoint of a run (same selection rule as
`mode=test`), rebuilds the model on the portable XLA decoder path, and
writes a self-contained jax.export artifact + manifest via
`scae_tpu.serve.export_serving`. Replaces the reference's only
deployment story — re-running its training notebook to reinstantiate
the Lightning module (torch_scae_experiments/mnist/train.ipynb).

Usage:
    python tools/export_model.py CKPT_DIR --out exported/run1 \
        [--batch-size 128] [--with-reconstruction] [--platforms cpu tpu] \
        [-- config overrides matching the run, e.g. model=mnist28]

After export, sanity-verifies the artifact: deserializes it and checks
its outputs against the JITTED live model on a random batch (~1e-6
numeric agreement + exact prediction equality; see the in-code note on
why the comparison must be jit-to-jit).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu import factory, serve
from scae_tpu.config import load_config
from scae_tpu.train.checkpoint import CheckpointManager


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    overrides = []
    if "--" in argv:
        i = argv.index("--")
        argv, overrides = argv[:i], argv[i + 1:]
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt_dir", help="run checkpoint directory")
    ap.add_argument("--out", required=True, help="artifact output dir")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--with-reconstruction", action="store_true")
    ap.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    ap.add_argument("--rtol", type=float, default=1e-4)
    ap.add_argument("--atol", type=float, default=1e-5)
    ap.add_argument("--polymorphic-batch", action="store_true",
                    help="export with a symbolic batch dim: one artifact "
                         "serves any batch size (verified at "
                         "--batch-size and --batch-size//2+1)")
    args = ap.parse_args(argv)

    cfg = load_config("config", overrides=overrides)
    mk = dict(cfg["model"])
    # portable artifact: XLA decoder path (see scae_tpu/serve.py docs)
    pd = dict(mk.get("pcae_decoder_params") or {})
    pd["fused_impl"] = "xla"
    mk["pcae_decoder_params"] = pd
    model = factory.make_scae(mk)

    monitor = cfg["trainer"].get("monitor", "val_loss")
    mode = cfg["trainer"].get("monitor_mode", "min")
    mgr = CheckpointManager(args.ckpt_dir, monitor=monitor, mode=mode)
    step = mgr.best_step or mgr.latest_step
    assert step is not None, f"{args.ckpt_dir}: no checkpoints"
    params = mgr.restore_params(step=step)
    mgr.close()
    print(f"[export] {args.ckpt_dir}: restored step {step} "
          f"(monitor={monitor}/{mode})")

    out = serve.export_serving(
        model, params, image_shape=mk["image_shape"],
        batch_size=args.batch_size, out_dir=args.out,
        with_reconstruction=args.with_reconstruction,
        platforms=args.platforms, model_config=mk,
        polymorphic_batch=args.polymorphic_batch)
    size = os.path.getsize(os.path.join(out, serve.ARTIFACT_NAME))
    print(f"[export] wrote {out} ({size / 1e6:.1f} MB, "
          f"platforms={args.platforms})")

    # roundtrip sanity: artifact vs the JITTED live model. Compare
    # jit-to-jit: eager (unjitted) execution differs from compiled by up
    # to ~1e-1 on trained flagship weights (measured — op-by-op eager
    # arithmetic through sharp attention softmaxes amplifies), while the
    # deserialized artifact reproduces the jitted program to ~1e-6.
    # Prediction equality is the hard serving invariant on top.
    served = serve.load_serving(out)
    c, h, w = mk["image_shape"]
    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.rand(args.batch_size, c, h, w), jnp.float32)
    got = served(batch)
    want = jax.jit(serve.make_infer_fn(
        model, with_reconstruction=args.with_reconstruction))(params, batch)
    for k in sorted(want):
        g, v = np.asarray(got[k]), np.asarray(want[k])
        if k.endswith("prediction"):
            n_diff = int(np.sum(g != v))
            print(f"[export]   {k}: {n_diff}/{g.size} predictions differ")
            assert n_diff == 0, f"{k}: artifact predictions diverge"
        else:
            denom = np.maximum(np.abs(v), 1e-6)
            print(f"[export]   {k}: max_abs={np.max(np.abs(g - v)):.2e} "
                  f"max_rel={np.max(np.abs(g - v) / denom):.2e}")
            np.testing.assert_allclose(g, v, rtol=args.rtol, atol=args.atol,
                                       err_msg=k)
    pred = np.asarray(got.get("prediction", np.zeros(1)))
    print(f"[export] VERIFIED: {len(want)} outputs match the live model "
          f"(sample predictions: {pred[:8].tolist()})")
    if args.polymorphic_batch:
        # a symbolic-batch artifact must serve OTHER batch sizes too
        b2 = args.batch_size // 2 + 1
        got2 = served(batch[:b2])
        for k in sorted(want):
            g2, v2 = np.asarray(got2[k]), np.asarray(want[k])[:b2]
            if k.endswith("prediction"):
                assert int(np.sum(g2 != v2)) == 0, (
                    f"{k}: predictions diverge at batch {b2}")
            else:
                np.testing.assert_allclose(
                    g2, v2, rtol=args.rtol, atol=args.atol,
                    err_msg=f"{k} at batch {b2}")
        print(f"[export] VERIFIED polymorphic batch: outputs also match "
              f"at batch {b2}")
    print(json.dumps({"artifact": out, "step": int(step),
                      "outputs": served.manifest["outputs"]}))


if __name__ == "__main__":
    main()
