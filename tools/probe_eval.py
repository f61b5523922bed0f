"""Post-hoc linear-probe evaluation of SCAE capsule features — the
original paper's protocol (Kosiorek et al. 2019 §4: linear classifiers
trained on capsule presences AFTER unsupervised training).

The reference instead trains its classifier heads jointly with the
model (stacked_capsule_auto_encoder.py:66-74) through a double-softmax
cross-entropy (:281-282) at the shared tiny lr — which the RESULTS.md
class-8 diagnosis shows under-trains the head so badly that one class
never forms at all. This tool reads the SAME posterior feature the
reference head uses (`mass_explained_by_capsule`, the per-capsule sum
of posterior mixing probabilities) but fits the linear readout
properly, post hoc, on the train split.

Protocol (preregistered in RESULTS.md):
  * per member: features on train/val/test of the shared split
  * one GLOBAL LogisticRegression C selected on mean val accuracy
    across members (grid --c-grid); test untouched during selection
  * per-member probe test accuracy + probe-ensemble (averaged
    predict_proba) cumulative-K in spec order, per group and pooled

Usage:
    python tools/probe_eval.py SPEC.json [--batch-size N]
        [--c-grid 0.1 1 10 100] [--skip-test]

SPEC.json is the same group spec tools/ensemble_pool.py takes.
--skip-test runs only the val-selection phase (to fix C* before the
single preregistered test evaluation).
"""

import argparse
import json
import os
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

from scae_tpu import factory
from scae_tpu.config import load_config
from scae_tpu.train import data as data_lib
from scae_tpu.train.checkpoint import CheckpointManager
from tools.ensemble_pool import _check_split


def _group_features(cfg, runs, batch_size, split_seed):
    """Per member of one group: dict split -> (features, labels)."""
    model = factory.make_scae(dict(cfg["model"]))
    monitor = cfg["trainer"].get("monitor", "val_loss")
    mode = cfg["trainer"].get("monitor_mode", "min")
    c, h, _ = cfg["model"]["image_shape"]
    train_ds, val_ds, test_ds, source = data_lib.load_datasets(
        data_dir=cfg["data_loader"].get("data_dir"),
        seed=cfg.get("seed", 42), split_seed=split_seed,
        image_size=min(h, 28 if c == 1 else h), n_channels=c,
        source=cfg["data_loader"].get("source"),
        tint=cfg["data_loader"].get("tint"))

    @jax.jit
    def feats(params, images):
        res = model.apply({"params": params}, images, deterministic=True)
        return jnp.sum(res.obj.posterior_mixing_prob, axis=-1)

    def run_split(params, ds):
        imgs = data_lib.pad_to_canvas(data_lib.to_nchw_float(ds.images), h)
        n = len(imgs)
        n_pad = (-n) % batch_size
        imgs = np.pad(imgs, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
        out = [np.asarray(feats(params, imgs[i:i + batch_size]))
               for i in range(0, n + n_pad, batch_size)]
        return np.concatenate(out)[:n], np.asarray(ds.labels)

    members = []
    for run in runs:
        mgr = CheckpointManager(run, monitor=monitor, mode=mode)
        step = mgr.best_step or mgr.latest_step
        assert step is not None, f"{run}: no checkpoints"
        params = mgr.restore_params(step=step)
        mgr.close()
        members.append({split: run_split(params, ds)
                        for split, ds in (("train", train_ds),
                                          ("val", val_ds),
                                          ("test", test_ds))})
        print(f"[probe] {run}: features extracted (step {step}, {source})")
    return members


def _acc(pred, labels):
    return float(np.mean(pred == labels))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("spec", help="group spec JSON (ensemble_pool format)")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--c-grid", type=float, nargs="+",
                    default=[0.1, 1.0, 10.0, 100.0])
    ap.add_argument("--skip-test", action="store_true",
                    help="val selection only; no test evaluation")
    args = ap.parse_args(argv)

    from sklearn.linear_model import LogisticRegression

    with open(args.spec) as f:
        spec = json.load(f)
    split_seed = int(spec["split_seed"])

    members = []     # {name, group, splits{split: (X, y)}}
    labels_ref = {}
    for group in spec["groups"]:
        cfg = load_config("config", overrides=list(group["overrides"]))
        if cfg["data_loader"].get("split_seed") != split_seed:
            raise ValueError(f"group {group['name']!r}: split_seed mismatch")
        runs = [m["run"] for m in group["members"]]
        for run in runs:
            _check_split(run, split_seed)
        feats = _group_features(cfg, runs, args.batch_size, split_seed)
        for m, splits in zip(group["members"], feats):
            for split, (_, y) in splits.items():
                if split not in labels_ref:
                    labels_ref[split] = y
                elif not np.array_equal(y, labels_ref[split]):
                    raise ValueError(
                        f"{split} label sequence differs across groups — "
                        "not the same examples; refusing")
            members.append({
                "name": os.path.basename(m["run"].rstrip("/")),
                "group": group["name"], "splits": splits})

    # ---- global C selection on val ----
    y_tr, y_val = labels_ref["train"], labels_ref["val"]
    print(f"\n[probe] C selection on val ({len(y_val)} examples), "
          f"{len(members)} members:")
    best_c, best_mean = None, -1.0
    for C in args.c_grid:
        accs = []
        for m in members:
            clf = LogisticRegression(max_iter=5000, C=C)
            clf.fit(m["splits"]["train"][0], y_tr)
            accs.append(_acc(clf.predict(m["splits"]["val"][0]), y_val))
        mean = float(np.mean(accs))
        print(f"[probe]   C={C}: mean val acc {mean:.4f}")
        if mean > best_mean:
            best_c, best_mean = C, mean
    print(f"[probe] selected C*={best_c} (mean val {best_mean:.4f})")
    result = {"n_members": len(members), "c_star": best_c,
              "mean_val_acc": best_mean, "split_seed": split_seed}
    if args.skip_test:
        print(json.dumps(result))
        return result

    # ---- single preregistered test evaluation at C* ----
    y_te = labels_ref["test"]
    probs = []
    print(f"\n[probe] test evaluation ({len(y_te)} examples) at C*={best_c}:")
    for m in members:
        clf = LogisticRegression(max_iter=5000, C=best_c)
        clf.fit(m["splits"]["train"][0], y_tr)
        p = clf.predict_proba(m["splits"]["test"][0])
        probs.append(p)
        pred = p.argmax(-1)
        r8 = _acc(pred[y_te == 8], np.full((y_te == 8).sum(), 8))
        print(f"[probe] {m['group']}/{m['name']}: test={_acc(pred, y_te):.4f}"
              f" class8_recall={r8:.4f}")
    member_accs = [_acc(p.argmax(-1), y_te) for p in probs]
    result["member_test_accs"] = member_accs

    for group in spec["groups"]:
        g = [p for m, p in zip(members, probs) if m["group"] == group["name"]]
        acc = _acc(np.mean(g, axis=0).argmax(-1), y_te)
        print(f"[probe] group {group['name']} probe-ensemble (K={len(g)}): "
              f"test={acc:.4f}")
        result[f"group_{group['name']}_test"] = acc

    for k in range(2, len(probs)):
        acc = _acc(np.mean(probs[:k], axis=0).argmax(-1), y_te)
        print(f"[probe] K={k}: test={acc:.4f}")
    pooled = np.mean(probs, axis=0)
    pred = pooled.argmax(-1)
    r8 = _acc(pred[y_te == 8], np.full((y_te == 8).sum(), 8))
    print(f"[probe] POOLED probe-ensemble (K={len(probs)}): "
          f"test={_acc(pred, y_te):.4f} class8_recall={r8:.4f}")
    result.update(pooled_test=_acc(pred, y_te), pooled_class8_recall=r8)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
