"""Test-time ensembling of independently-initialized SCAE runs.

Restores the best checkpoint of each given run directory and evaluates
the AVERAGED class probabilities (prior and posterior classifier heads,
reference stacked_capsule_auto_encoder.py:289-297's accuracy on the
ensemble mean instead of a single model) on the shared held-out test
split — the serving-side answer to the measured seed bimodality
(RESULTS.md): instead of betting on one probe winner, combine several.

Soundness precondition: every run must have trained on the SAME data
split, or their training sets leak into each other's test set. The tool
therefore requires `data_loader.split_seed` to be set and verifies each
run recorded that same split_seed in its train_seed.json (written by
train/loop.py; runs that predate split_seed fail the check).

Usage:
    python tools/ensemble_eval.py RUN_DIR [RUN_DIR ...] -- \
        data_loader.source=digits data_loader.split_seed=7 [overrides...]

where RUN_DIR is a run's checkpoint directory (trainer.checkpoint_dir)
and the overrides after `--` are the same dotted config overrides the
training CLI takes (they must reproduce the runs' model + data config).

Evaluates ALL test examples (the last partial batch is padded and
masked), unlike Trainer.run_test which drops the remainder — the two
accuracies differ by the remainder's contribution.
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


def _check_split(run_dir: str, split_seed) -> None:
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
            f"but the ensemble evaluates split_seed={split_seed!r} — "
            "ensembling runs from different splits leaks training data "
            "into the test set")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    overrides = []
    if "--" in argv:
        i = argv.index("--")
        argv, overrides = argv[:i], argv[i + 1:]
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("runs", nargs="+", help="checkpoint dirs of the runs")
    ap.add_argument("--batch-size", type=int, default=128)
    args = ap.parse_args(argv)

    cfg = load_config("config", overrides=overrides)
    split_seed = cfg["data_loader"].get("split_seed")
    if split_seed is None:
        raise SystemExit(
            "ensemble_eval requires data_loader.split_seed=<int> (and runs "
            "trained with it): with the legacy seed-keyed splits each run "
            "has a DIFFERENT test set, so an ensemble would be evaluated "
            "on some of its own members' training data")
    for run in args.runs:
        _check_split(run, split_seed)

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
    print(f"[ensemble] test split: {len(test_ds)} examples ({source}, "
          f"split_seed={split_seed})")

    params_list = []
    for run in args.runs:
        mgr = CheckpointManager(run, monitor=monitor, mode=mode)
        step = mgr.best_step or mgr.latest_step
        assert step is not None, f"{run}: no checkpoints"
        params_list.append(mgr.restore_params(step=step))
        mgr.close()
        print(f"[ensemble] {run}: restored step {step}")

    @jax.jit
    def cls_probs(params, images):
        res = model.apply({"params": params}, images, deterministic=True)
        return res.prior_cls_prob, res.posterior_cls_prob

    B = args.batch_size
    n = len(test_ds)
    n_pad = (-n) % B
    images = data_lib.to_nchw_float(test_ds.images)
    images = data_lib.pad_to_canvas(images, h)
    images = jnp.pad(images, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
    labels = np.asarray(test_ds.labels)

    per_model = []   # (prior_probs, posterior_probs) each (n, n_classes)
    for params in params_list:
        pri, post = [], []
        for i in range(0, n + n_pad, B):
            p, q = cls_probs(params, images[i:i + B])
            pri.append(np.asarray(p))
            post.append(np.asarray(q))
        per_model.append((np.concatenate(pri)[:n], np.concatenate(post)[:n]))

    def acc(probs):
        return float(np.mean(np.argmax(probs, axis=-1) == labels))

    print()
    for run, (pri, post) in zip(args.runs, per_model):
        print(f"[ensemble] {run}: "
              f"prior={acc(pri):.4f} posterior={acc(post):.4f} "
              f"best={max(acc(pri), acc(post)):.4f}")
    for k in range(2, len(per_model)):   # cumulative-K curve (run order)
        pri_k = np.mean([m[0] for m in per_model[:k]], axis=0)
        post_k = np.mean([m[1] for m in per_model[:k]], axis=0)
        print(f"[ensemble] K={k}: prior={acc(pri_k):.4f} "
              f"posterior={acc(post_k):.4f} "
              f"best={max(acc(pri_k), acc(post_k)):.4f}")
    mean_pri = np.mean([m[0] for m in per_model], axis=0)
    mean_post = np.mean([m[1] for m in per_model], axis=0)
    result = {
        "n_models": len(per_model),
        "n_test": n,
        "prior_acc": acc(mean_pri),
        "posterior_acc": acc(mean_post),
        "ensemble_acc": max(acc(mean_pri), acc(mean_post)),
    }
    print(f"[ensemble] ENSEMBLE ({result['n_models']} models): "
          f"prior={result['prior_acc']:.4f} "
          f"posterior={result['posterior_acc']:.4f} "
          f"best={result['ensemble_acc']:.4f}")
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
