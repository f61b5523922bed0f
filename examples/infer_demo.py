"""Batch inference from a trained checkpoint — the serving path.

The reference has no inference entry point at all (its only deploy
story is Lightning's `trainer.fit`; its `test_step` crashes,
`base_experiment.py:186-202` / SURVEY.md §2.4(3)). This demo is the
load-and-serve recipe for scae_tpu: restore the best Orbax checkpoint,
jit ONE forward function, and stream batches through it — emitting
per-image class predictions with confidences plus a reconstruction
grid.

Usage (same dotted overrides as the training CLI):

    python examples/infer_demo.py trainer.checkpoint_dir=./ckpt \
        data_loader.source=digits [model=... etc.]

Outputs, under --out (default ./infer_out):
    predictions.jsonl   one record per image: predicted class,
                        classifier confidence, true label, capsule
                        presence mass
    inference_grid.png  row 1 originals, row 2 reconstructions

Serving notes: the jitted forward is compiled once per (batch, image)
shape; keep batch fixed and pad the tail (as done below) for a single
compilation. The same function runs unchanged under a multi-chip
`Mesh` by sharding the batch axis (scae_tpu.parallel) — per-chip
throughput numbers are in BASELINE.md. For deployment WITHOUT the
model code, export a self-contained AOT artifact instead:
`tools/export_model.py` / `scae_tpu.serve` (jax.export StableHLO,
params baked in, optional mesh-sharded batch).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv):
    out_dir = "./infer_out"
    overrides = []
    for a in argv:
        if a.startswith("--out="):
            out_dir = a.split("=", 1)[1]
        else:
            overrides.append(a)

    from scae_tpu.config import load_config
    from scae_tpu.train import data as data_lib
    from scae_tpu.train.loop import Trainer
    from scae_tpu.utils.png import make_grid, write_png

    cfg = load_config("config", overrides=overrides)
    trainer = Trainer(cfg)

    # data split must match training: honor the recorded training seed
    seed = trainer._recorded_seed()
    if seed is None:
        seed = cfg.get("seed", 42)
    c, h, _ = cfg["model"]["image_shape"]
    train_ds, _, test_ds, source = data_lib.load_datasets(
        data_dir=cfg["data_loader"].get("data_dir"), seed=seed,
        image_size=min(h, 28 if c == 1 else h), n_channels=c,
        source=cfg["data_loader"].get("source"),
        **trainer._dataset_sizes())

    steps_per_epoch = max(len(train_ds) // trainer.batch_size, 1)
    trainer.build_steps(steps_per_epoch)
    state = trainer.init_state(seed)
    assert trainer.ckpt.latest_step is not None, "no checkpoint to serve"
    step = trainer.ckpt.best_step or trainer.ckpt.latest_step
    state = trainer.ckpt.restore(state, step=step)
    print(f"[infer] restored checkpoint {step} from "
          f"{trainer.ckpt.directory} (data: {source}, seed {seed})")

    model = trainer.model
    center_pad = trainer.center_pad

    @jax.jit
    def serve(params, images):
        x = center_pad({"image": images})["image"]
        res = model.apply({"params": params}, x, deterministic=True)
        cls_prob = (res.posterior_cls_prob
                    if res.posterior_cls_prob is not None
                    else res.prior_cls_prob)
        return {
            "pred": jnp.argmax(cls_prob, axis=-1),
            "confidence": jnp.max(cls_prob, axis=-1),
            "presence_mass": jnp.sum(res.obj.caps_presence, axis=-1),
            "recon": res.rec.pdf.mode(),
            "padded": x,
        }

    os.makedirs(out_dir, exist_ok=True)
    B = trainer.batch_size
    n = min(len(test_ds), 4 * B)
    images = data_lib.to_nchw_float(test_ds.images[:n])
    labels = np.asarray(test_ds.labels[:n])

    records, correct = [], 0
    first_out = None
    for i in range(0, n, B):
        batch = images[i:i + B]
        pad = B - len(batch)  # fixed shape -> one compilation
        if pad:
            batch = np.concatenate([batch, np.zeros_like(batch[:1])
                                    .repeat(pad, 0)])
        out = jax.device_get(serve(state.params, jnp.asarray(batch)))
        if first_out is None:
            first_out = out
        k = len(images[i:i + B])
        for j in range(k):
            rec = {
                "index": i + j,
                "pred": int(out["pred"][j]),
                "confidence": round(float(out["confidence"][j]), 4),
                "label": int(labels[i + j]),
                "capsule_presence_mass":
                    round(float(out["presence_mass"][j]), 3),
            }
            correct += rec["pred"] == rec["label"]
            records.append(rec)

    with open(os.path.join(out_dir, "predictions.jsonl"), "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")

    # row 1 originals, row 2 reconstructions: m bounded by the first
    # batch's real (unpadded) image count so the rows stay aligned
    m = min(16, B, len(records))
    grid = make_grid(np.concatenate([first_out["padded"][:m],
                                     first_out["recon"][:m]]), n_cols=m)
    write_png(os.path.join(out_dir, "inference_grid.png"), grid)

    print(f"[infer] {len(records)} images -> {out_dir}/predictions.jsonl"
          f" + inference_grid.png; accuracy {correct / len(records):.4f}"
          f" (supervised-classifier head on {source} test split)")


if __name__ == "__main__":
    main(sys.argv[1:])
