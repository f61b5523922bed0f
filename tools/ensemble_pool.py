"""Cross-recipe test-time ensembling: pool members with DIFFERENT
model architectures / preprocessing over one shared data split.

`tools/ensemble_eval.py` averages class probabilities over runs of a
single model config. This tool generalizes it to GROUPS — each group
carries its own config overrides (e.g. the flagship 40x40 recipe and
the mnist28 native-resolution recipe) and evaluates its members under
its own preprocessing — then averages class probabilities across every
member on the SAME test examples. Valid because the split permutation
in train/data.py::real_digits depends only on split_seed, never on
image size; the tool still verifies it end to end (train_seed.json per
run + identical test-label sequences across groups) before averaging.

Reference anchor: stacked_capsule_auto_encoder.py:289-297 computes
accuracy from one model's class probabilities; here the probabilities
are a weighted mean over heterogeneous members.

Usage:
    python tools/ensemble_pool.py SPEC.json [--batch-size N]

SPEC.json:
    {
      "split_seed": 7,
      "groups": [
        {"name": "flagship",
         "overrides": ["data_loader.source=digits", ...],
         "members": [{"run": "checkpoints/.../f500",
                      "log": "logs/.../f500"}, ...]},
        ...
      ]
    }

Reported (all computed from one pass of member probabilities):
  * per-member prior/posterior accuracy + peak val_accuracy (from the
    member's log metrics.jsonl — used only for weighting variants)
  * within-group uniform ensembles (sanity anchors vs prior entries)
  * pooled cumulative-K curve in spec order (no member selection)
  * pooled uniform ensemble  (w1 — the headline convention)
  * val-accuracy-weighted ensemble, pooled and per group (w2)
  * top-half-by-val-accuracy selection, uniform weights (w3)
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
import numpy as np

from scae_tpu import factory
from scae_tpu.config import load_config
from scae_tpu.train import data as data_lib
from scae_tpu.train.checkpoint import CheckpointManager


def _check_split(run_dir: str, split_seed) -> None:
    """Same soundness gate as ensemble_eval.py: refuse runs whose
    recorded training split differs from the split being evaluated."""
    path = os.path.join(run_dir, "train_seed.json")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{run_dir}: no train_seed.json — cannot verify the run "
            "trained on this split")
    with open(path) as f:
        rec = json.load(f)
    if rec.get("split_seed") != split_seed:
        raise ValueError(
            f"{run_dir}: trained with split_seed={rec.get('split_seed')!r} "
            f"but the pool evaluates split_seed={split_seed!r} — "
            "ensembling runs from different splits leaks training data "
            "into the test set")


def _peak_val_accuracy(log_dir: str) -> float:
    best = None
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "val_accuracy" in rec:
                v = float(rec["val_accuracy"])
                best = v if best is None else max(best, v)
    if best is None:
        raise ValueError(f"{log_dir}: no val_accuracy in metrics.jsonl")
    return best


def _member_probs(cfg, runs, batch_size, split_seed):
    """All members of one group: ((prior, posterior) per run, labels)."""
    model = factory.make_scae(dict(cfg["model"]))
    monitor = cfg["trainer"].get("monitor", "val_loss")
    mode = cfg["trainer"].get("monitor_mode", "min")

    c, h, _ = cfg["model"]["image_shape"]
    _, _, test_ds, source = data_lib.load_datasets(
        data_dir=cfg["data_loader"].get("data_dir"),
        seed=cfg.get("seed", 42), split_seed=split_seed,
        image_size=min(h, 28 if c == 1 else h), n_channels=c,
        source=cfg["data_loader"].get("source"),
        tint=cfg["data_loader"].get("tint"))

    n = len(test_ds)
    n_pad = (-n) % batch_size
    images = data_lib.to_nchw_float(test_ds.images)
    images = data_lib.pad_to_canvas(images, h)
    images = np.pad(images, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
    labels = np.asarray(test_ds.labels)

    @jax.jit
    def cls_probs(params, batch):
        res = model.apply({"params": params}, batch, deterministic=True)
        return res.prior_cls_prob, res.posterior_cls_prob

    out = []
    for run in runs:
        mgr = CheckpointManager(run, monitor=monitor, mode=mode)
        step = mgr.best_step or mgr.latest_step
        assert step is not None, f"{run}: no checkpoints"
        params = mgr.restore_params(step=step)
        mgr.close()
        pri, post = [], []
        for i in range(0, n + n_pad, batch_size):
            p, q = cls_probs(params, images[i:i + batch_size])
            pri.append(np.asarray(p))
            post.append(np.asarray(q))
        out.append((np.concatenate(pri)[:n], np.concatenate(post)[:n]))
        print(f"[pool] {run}: restored step {step} ({source})")
    return out, labels


def _acc(probs, labels):
    return float(np.mean(np.argmax(probs, axis=-1) == labels))


def _ensemble(members, labels, weights=None):
    """Weighted mean of member probabilities -> (prior, posterior) acc."""
    w = np.ones(len(members)) if weights is None else np.asarray(
        weights, dtype=np.float64)
    if w.sum() <= 0:        # all-zero val accs (degenerate) -> uniform
        w = np.ones(len(members))
    w = w / w.sum()
    pri = sum(wi * m[0] for wi, m in zip(w, members))
    post = sum(wi * m[1] for wi, m in zip(w, members))
    return _acc(pri, labels), _acc(post, labels)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("spec", help="JSON spec file (see module docstring)")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--dump-probs", default=None, metavar="NPZ",
                    help="save per-member prior/posterior probs + labels "
                         "for offline analysis (error overlap etc.)")
    args = ap.parse_args(argv)

    with open(args.spec) as f:
        spec = json.load(f)
    split_seed = int(spec["split_seed"])

    members = []       # flat, spec order: dicts with probs/val/name/group
    labels_ref = None
    for group in spec["groups"]:
        cfg = load_config("config", overrides=list(group["overrides"]))
        got = cfg["data_loader"].get("split_seed")
        if got != split_seed:
            raise ValueError(
                f"group {group['name']!r}: overrides set "
                f"split_seed={got!r}, spec says {split_seed}")
        runs = [m["run"] for m in group["members"]]
        for run in runs:
            _check_split(run, split_seed)
        probs, labels = _member_probs(cfg, runs, args.batch_size, split_seed)
        if labels_ref is None:
            labels_ref = labels
        elif not np.array_equal(labels, labels_ref):
            raise ValueError(
                f"group {group['name']!r}: test label sequence differs "
                "from the first group's — the groups are NOT evaluating "
                "the same examples; refusing to pool")
        for m, pp in zip(group["members"], probs):
            members.append({
                "name": os.path.basename(m["run"].rstrip("/")),
                "group": group["name"], "probs": pp,
                "val": _peak_val_accuracy(m["log"]),
            })

    labels = labels_ref
    if args.dump_probs:
        np.savez(args.dump_probs, labels=labels,
                 names=np.array([f"{m['group']}/{m['name']}"
                                 for m in members]),
                 vals=np.array([m["val"] for m in members]),
                 prior=np.stack([m["probs"][0] for m in members]),
                 posterior=np.stack([m["probs"][1] for m in members]))
        print(f"[pool] dumped member probs -> {args.dump_probs}")
    print(f"\n[pool] {len(members)} members over {len(labels)} shared "
          f"test examples (split_seed={split_seed})")
    for m in members:
        pri, post = _acc(m["probs"][0], labels), _acc(m["probs"][1], labels)
        print(f"[pool] {m['group']}/{m['name']}: prior={pri:.4f} "
              f"posterior={post:.4f} peak_val={m['val']:.4f}")

    result = {"n_members": len(members), "n_test": int(len(labels)),
              "split_seed": split_seed}

    # within-group uniform ensembles (sanity anchors)
    for group in spec["groups"]:
        g = [m["probs"] for m in members if m["group"] == group["name"]]
        pri, post = _ensemble(g, labels)
        print(f"[pool] group {group['name']} uniform (K={len(g)}): "
              f"prior={pri:.4f} posterior={post:.4f}")
        result[f"group_{group['name']}_posterior"] = post

    # pooled cumulative-K curve, spec order, no selection
    flat = [m["probs"] for m in members]
    for k in range(2, len(flat)):
        pri, post = _ensemble(flat[:k], labels)
        print(f"[pool] K={k}: prior={pri:.4f} posterior={post:.4f}")

    pri, post = _ensemble(flat, labels)
    print(f"[pool] POOLED uniform (w1, K={len(flat)}): "
          f"prior={pri:.4f} posterior={post:.4f}")
    result.update(pooled_prior=pri, pooled_posterior=post)

    vals = [m["val"] for m in members]
    pri, post = _ensemble(flat, labels, weights=vals)
    print(f"[pool] POOLED val-weighted (w2): "
          f"prior={pri:.4f} posterior={post:.4f}")
    result.update(pooled_valw_posterior=post)
    for group in spec["groups"]:
        g = [(m["probs"], m["val"]) for m in members
             if m["group"] == group["name"]]
        pri_g, post_g = _ensemble([p for p, _ in g], labels,
                                  weights=[v for _, v in g])
        print(f"[pool] group {group['name']} val-weighted (w2): "
              f"prior={pri_g:.4f} posterior={post_g:.4f}")
        result[f"group_{group['name']}_valw_posterior"] = post_g

    half = max(1, len(members) // 2)
    top = sorted(members, key=lambda m: m["val"], reverse=True)[:half]
    pri, post = _ensemble([m["probs"] for m in top], labels)
    print(f"[pool] POOLED top-half by val (w3, K={half}: "
          f"{', '.join(m['name'] for m in top)}): "
          f"prior={pri:.4f} posterior={post:.4f}")
    result.update(pooled_tophalf_posterior=post)

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
