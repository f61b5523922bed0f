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
its outputs against the live model on a random batch (exact match — the
artifact embeds the same params and both run on this host's backend).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
        platforms=args.platforms, model_config=mk)
    size = os.path.getsize(os.path.join(out, serve.ARTIFACT_NAME))
    print(f"[export] wrote {out} ({size / 1e6:.1f} MB, "
          f"platforms={args.platforms})")

    # roundtrip sanity: artifact output == live model output
    served = serve.load_serving(out)
    c, h, w = mk["image_shape"]
    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.rand(args.batch_size, c, h, w), jnp.float32)
    got = served(batch)
    want = serve.make_infer_fn(
        model, with_reconstruction=args.with_reconstruction)(params, batch)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    pred = np.asarray(got.get("prediction", np.zeros(1)))
    print(f"[export] VERIFIED: {len(want)} outputs match the live model "
          f"(sample predictions: {pred[:8].tolist()})")
    print(json.dumps({"artifact": out, "step": int(step),
                      "outputs": served.manifest["outputs"]}))


if __name__ == "__main__":
    main()
