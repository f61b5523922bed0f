"""Close the serving<->quality loop (VERDICT r4 ask #6).

The deployment surface (`scae_tpu/serve.py`) serves `prediction` =
posterior-head argmax — exactly the head that `trainer.head_refit` /
`tools/probe_calibrate.py` rewrite with the fitted probe. This tool
proves the exported artifact serves the FIXED readout, not the
under-trained joint head: it evaluates an exported artifact's
`prediction` output over the run's own held-out TEST split and compares
the accuracy against an expected number (the member's recorded probe /
`mode=test` accuracy).

Usage:
    python tools/verify_serving_readout.py ARTIFACT_DIR \
        [--expect 0.8990 --tol 0.002] [--ckpt CKPT_DIR] \
        -- <config overrides matching the run>

`--ckpt` (the run's checkpoint dir) supplies train_seed.json so the
test split is derived exactly as `mode=test` derives it (probe-selected
winner seed, split_seed decoupling).

Reference being replaced: none — the torch reference has no deployment
story at all (its only artifact is the Lightning .ckpt consumed by
re-running the training notebook).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scae_tpu import serve
from scae_tpu.config import load_config
from scae_tpu.train import data as data_lib


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    overrides = []
    if "--" in argv:
        i = argv.index("--")
        argv, overrides = argv[:i], argv[i + 1:]
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("artifact", help="exported artifact dir")
    ap.add_argument("--ckpt", default=None,
                    help="run checkpoint dir (for train_seed.json)")
    ap.add_argument("--expect", type=float, default=None,
                    help="expected test accuracy (e.g. the member's "
                         "probe number)")
    ap.add_argument("--tol", type=float, default=0.002)
    args = ap.parse_args(argv)

    cfg = load_config("config", overrides=overrides)
    seed = cfg.get("seed", 42)
    split_seed = cfg["data_loader"].get("split_seed")
    if args.ckpt:
        with open(os.path.join(args.ckpt, "train_seed.json")) as f:
            rec = json.load(f)
        seed = int(rec["seed"])
        if rec.get("split_seed") is not None:
            split_seed = int(rec["split_seed"])
        print(f"[verify_serving] recorded training seed {seed} "
              f"split_seed {split_seed}")

    c, h, _ = cfg["model"]["image_shape"]
    _, _, test_ds, source = data_lib.load_datasets(
        data_dir=cfg["data_loader"].get("data_dir"), seed=seed,
        image_size=min(h, 28 if c == 1 else h), n_channels=c,
        source=cfg["data_loader"].get("source"),
        tint=cfg["data_loader"].get("tint"), split_seed=split_seed,
        val_size=cfg["data_loader"].get("val_size", 5000),
        synthetic_train=cfg["data_loader"].get("synthetic_train", 12000),
        synthetic_test=cfg["data_loader"].get("synthetic_test", 2000))

    model = serve.load_serving(args.artifact)
    in_shape = model.manifest["input"]["shape"]
    B = in_shape[0] or 128

    imgs = data_lib.pad_to_canvas(
        data_lib.to_nchw_float(test_ds.images), h)
    labels = np.asarray(test_ds.labels)
    n = len(labels)
    n_pad = (-n) % B
    imgs = np.pad(imgs, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
    preds = []
    for i in range(0, n + n_pad, B):
        out = model(imgs[i:i + B])
        preds.append(np.asarray(out["prediction"]))
    preds = np.concatenate(preds)[:n]
    acc = float(np.mean(preds == labels))

    result = {"artifact": args.artifact, "source": source,
              "n_test": int(n), "test_accuracy": round(acc, 6)}
    if args.expect is not None:
        result["expect"] = args.expect
        result["ok"] = bool(abs(acc - args.expect) <= args.tol)
    print(json.dumps(result))
    if args.expect is not None and not result["ok"]:
        raise SystemExit(
            f"serving readout mismatch: artifact test acc {acc:.4f} vs "
            f"expected {args.expect:.4f} (tol {args.tol})")
    return result


if __name__ == "__main__":
    main()
