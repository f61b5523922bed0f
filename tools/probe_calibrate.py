"""Bake a post-hoc linear probe INTO a checkpoint's posterior head.

The posterior classifier is a linear layer on `mass_explained_by_capsule`
(scae.py; reference stacked_capsule_auto_encoder.py:203-213) — exactly
the function class the post-hoc probe (tools/probe_eval.py, the paper's
§4 readout) fits properly. This tool fits the probe on the run's own
train split (C selected on val) and writes a NEW checkpoint whose
`posterior_classifier` kernel/bias are the probe weights. Every standard
consumer — `mode=test`, serving export, tools/ensemble_eval.py — then
reads out through the calibrated head with zero new code paths.

The trunk and all other parameters are byte-identical; only the
stop-gradient-isolated head changes, so nothing about reconstruction,
likelihood, or capsule behavior moves.

Usage:
    python tools/probe_calibrate.py RUN_DIR --out OUT_DIR \
        [--c-grid 0.1 1 10 100] [--batch-size N] -- <config overrides>

The overrides must reproduce the run's model + data config and set
data_loader.split_seed (verified against the run's train_seed.json).
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA disk cache (same as cli.main): these tools restore and
# re-jit full models; through the tunneled TPU a cold remote compile
# can take many minutes, and mid-round the remote compile service has
# been observed to degrade to 15-30+ min. Cached executables skip it.
from scae_tpu.train.cli import _enable_compilation_cache

_enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from scae_tpu import factory
from scae_tpu.config import load_config
from scae_tpu.train import data as data_lib
from scae_tpu.train.checkpoint import CheckpointManager
from tools.ensemble_pool import _check_split


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    overrides = []
    if "--" in argv:
        i = argv.index("--")
        argv, overrides = argv[:i], argv[i + 1:]
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run", help="source checkpoint dir")
    ap.add_argument("--out", required=True, help="calibrated checkpoint dir")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--c-grid", type=float, nargs="+",
                    default=[0.1, 1.0, 10.0, 100.0])
    ap.add_argument("--c-star", type=float, default=None,
                    help="skip per-member C selection and fit at this C "
                         "(use the POOL's shared C* so the baked head "
                         "reproduces the pooled-probe protocol exactly)")
    args = ap.parse_args(argv)

    from sklearn.linear_model import LogisticRegression

    cfg = load_config("config", overrides=overrides)
    split_seed = cfg["data_loader"].get("split_seed")
    if split_seed is None:
        raise SystemExit("probe_calibrate requires data_loader.split_seed "
                         "(the probe must fit on the run's own split)")
    _check_split(args.run, split_seed)

    model = factory.make_scae(dict(cfg["model"]))
    monitor = cfg["trainer"].get("monitor", "val_loss")
    mode = cfg["trainer"].get("monitor_mode", "min")
    c, h, _ = cfg["model"]["image_shape"]
    train_ds, val_ds, _, source = data_lib.load_datasets(
        data_dir=cfg["data_loader"].get("data_dir"),
        seed=cfg.get("seed", 42), split_seed=split_seed,
        image_size=min(h, 28 if c == 1 else h), n_channels=c,
        source=cfg["data_loader"].get("source"),
        tint=cfg["data_loader"].get("tint"))

    mgr = CheckpointManager(args.run, monitor=monitor, mode=mode)
    step = mgr.best_step or mgr.latest_step
    assert step is not None, f"{args.run}: no checkpoints"
    raw = mgr._mgr.restore(int(step), args=ocp.args.StandardRestore())
    metrics = mgr.metrics(step) or {}
    mgr.close()
    params = raw["params"] if isinstance(raw, dict) and "params" in raw \
        else raw.params

    @jax.jit
    def feats_and_post(params, images):
        res = model.apply({"params": params}, images, deterministic=True)
        return (jnp.sum(res.obj.posterior_mixing_prob, axis=-1),
                res.posterior_cls_prob)

    def run_split(ds):
        imgs = data_lib.pad_to_canvas(data_lib.to_nchw_float(ds.images), h)
        n = len(imgs)
        n_pad = (-n) % args.batch_size
        imgs = np.pad(imgs, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
        fs, ps = [], []
        for i in range(0, n + n_pad, args.batch_size):
            f, p = feats_and_post(params, imgs[i:i + args.batch_size])
            fs.append(np.asarray(f))
            ps.append(np.asarray(p))
        return (np.concatenate(fs)[:n], np.concatenate(ps)[:n],
                np.asarray(ds.labels))

    Xtr, _, ytr = run_split(train_ds)
    Xval, pval, yval = run_split(val_ds)
    before = float(np.mean(pval.argmax(-1) == yval))

    best = None
    c_grid = [args.c_star] if args.c_star is not None else args.c_grid
    for C in c_grid:
        clf = LogisticRegression(max_iter=5000, C=C).fit(Xtr, ytr)
        acc = float(np.mean(clf.predict(Xval) == yval))
        print(f"[calibrate] C={C}: val {acc:.4f}")
        if best is None or acc > best[1]:
            best = (clf, acc, C)
    clf, val_acc, c_star = best
    print(f"[calibrate] selected C*={c_star} "
          f"(val {before:.4f} -> {val_acc:.4f})")

    head = params["posterior_classifier"]
    kernel = np.asarray(clf.coef_.T, dtype=np.asarray(head["kernel"]).dtype)
    bias = np.asarray(clf.intercept_, dtype=np.asarray(head["bias"]).dtype)
    if kernel.shape != head["kernel"].shape:
        raise ValueError(f"probe shape {kernel.shape} != head "
                         f"{head['kernel'].shape}")
    head["kernel"], head["bias"] = kernel, bias

    out = CheckpointManager(args.out, monitor=monitor, mode=mode)
    out._mgr.save(int(step), args=ocp.args.StandardSave(raw),
                  metrics={k: float(v) for k, v in metrics.items()})
    out.wait()
    out.close()
    shutil.copy(os.path.join(args.run, "train_seed.json"),
                os.path.join(args.out, "train_seed.json"))

    # confirm through the model head (the whole point: standard paths now
    # read out the probe)
    vmgr = CheckpointManager(args.out, monitor=monitor, mode=mode)
    new_params = vmgr.restore_params(step=step)
    vmgr.close()
    imgs = data_lib.pad_to_canvas(data_lib.to_nchw_float(val_ds.images), h)
    n = len(imgs)
    n_pad = (-n) % args.batch_size
    imgs = np.pad(imgs, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
    ps = [np.asarray(feats_and_post(new_params, imgs[i:i + args.batch_size])[1])
          for i in range(0, n + n_pad, args.batch_size)]
    after = float(np.mean(np.concatenate(ps)[:n].argmax(-1) == yval))
    result = {"run": args.run, "out": args.out, "step": int(step),
              "c_star": c_star, "val_before": before,
              "val_probe": val_acc, "val_after": after}
    print(f"[calibrate] in-model posterior val acc: "
          f"{before:.4f} -> {after:.4f} (probe said {val_acc:.4f})")
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
