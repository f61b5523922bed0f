"""A/B: train the torch reference on scae_tpu's exact synthetic dataset.

VERDICT round-2 item 1: the committed 240-epoch scae_tpu run plateaus at
near-uniform templates / rec_ll ~1486 on the synthetic-digit stand-in.
This tool answers "would the reference do better on the SAME data?" by
training the unmodified torch reference (flagship mnist.yaml config,
RMSprop lr 3e-5 momentum .9 eps 1e-2/B^2, ExponentialLR gamma=.997 per
epoch — base_experiment.py:44-77) on the identical dataset + split +
augmentation distribution used by scae_tpu's Trainer:

  * synthetic_digits(12000, seed=42, size=28) -> RandomState(42)
    permutation -> val=first 5000, train=rest (train/data.py:198-229)
  * pad 28->40 with random integer translation +-6 at train time,
    center pad at eval (train/loop.py::make_augment_fn, config.yaml)

Writes logs/ref_ab/metrics.jsonl (per-epoch train means + val rec_ll)
and raw-template / reconstruction grids every --grid-every epochs.

Usage: python tools/ab_ref_train.py [--epochs 60] [--out logs/ref_ab]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo/tools/refshim")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import torch  # noqa: E402
import yaml  # noqa: E402

# reuse the torch>=2 compat patch for cv_ops.geometric_transform
from ref_compat import patch_reference  # noqa: E402

patch_reference()

from torch_scae import factory  # noqa: E402

from scae_tpu.train.data import synthetic_digits  # noqa: E402
from scae_tpu.utils.png import make_grid, write_png  # noqa: E402

BATCH = 128


def load_split(seed=42, n_train=12000, val_size=5000, source="synthetic"):
    """Replicates scae_tpu.train.data.load_datasets synthetic/digits
    branches (including the small-dataset val clamp)."""
    if source == "digits":
        from scae_tpu.train.data import real_digits
        images, labels, _, _ = real_digits(size=28, seed=seed)
    else:
        images, labels = synthetic_digits(n_train, seed=seed, size=28)
    if val_size >= len(images):
        val_size = max(len(images) // 5, 1)
    perm = np.random.RandomState(seed).permutation(len(images))
    val_idx, train_idx = perm[:val_size], perm[val_size:]
    return ((images[train_idx], labels[train_idx]),
            (images[val_idx], labels[val_idx]))


def pad_translate(images_u8, rng, max_shift=6, canvas=40, train=True):
    """uint8 (B,28,28) -> float32 (B,1,40,40); random shift at train."""
    b, h, w = images_u8.shape
    x = images_u8.astype(np.float32) / 255.0
    out = np.zeros((b, 1, canvas, canvas), np.float32)
    base = (canvas - h) // 2
    if train:
        oy = rng.integers(-max_shift, max_shift + 1, size=b)
        ox = rng.integers(-max_shift, max_shift + 1, size=b)
    else:
        oy = ox = np.zeros(b, np.int64)
    for i in range(b):
        t, l = base + oy[i], base + ox[i]
        out[i, 0, t:t + h, l:l + w] = x[i]
    return torch.from_numpy(out)


def save_template_grid(model, path):
    with torch.no_grad():
        t = model.template_generator.template_nonlin(
            model.template_generator.template_logits)
    t = t[0, :, 0].cpu().numpy()  # (M, Ht, Wt)
    lo, hi = t.min(), t.max()
    write_png(path, make_grid((t[:, None] - lo) / max(hi - lo, 1e-6),
                              n_cols=8))


def save_recon_grid(model, images, path):
    model.eval()
    with torch.no_grad():
        res = model(image=images[:8])
        rec = res.rec.pdf.mode().cpu().numpy()  # (8,1,40,40)
    model.train()
    both = np.concatenate([images[:8].cpu().numpy(), rec], 0)
    write_png(path, make_grid(np.clip(both, 0, 1), n_cols=8))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--out", default="logs/ref_ab")
    ap.add_argument("--grid-every", type=int, default=5)
    ap.add_argument("--template-nonlin", default=None,
                    help="override template/color nonlin (e.g. relu1)")
    ap.add_argument("--source", default="synthetic",
                    choices=["synthetic", "digits"],
                    help="dataset: scae_tpu synthetic strokes or sklearn "
                         "real handwritten digits (train/data.py)")
    args = ap.parse_args()
    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)

    torch.manual_seed(42)
    with open("/root/reference/torch_scae_experiments/configs/model/"
              "mnist.yaml") as f:
        cfg = yaml.safe_load(f)["model"]
    if args.template_nonlin:
        tg = cfg["pcae_template_generator_params"]
        tg["template_nonlin"] = args.template_nonlin
        tg["color_nonlin"] = args.template_nonlin
    model = factory.make_scae(cfg)
    model.train()

    opt = torch.optim.RMSprop(model.parameters(), lr=3e-5, momentum=0.9,
                              eps=1e-2 / BATCH ** 2)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.997)

    (tr_im, tr_lb), (va_im, va_lb) = load_split(source=args.source)
    n_train = len(tr_im)
    steps_per_epoch = n_train // BATCH
    rng = np.random.default_rng(0)
    metrics_path = os.path.join(args.out, "metrics.jsonl")
    mf = open(metrics_path, "a", buffering=1)
    print(f"[ab_ref_train] {n_train} train / {len(va_im)} val, "
          f"{steps_per_epoch} steps/epoch, {args.epochs} epochs",
          flush=True)

    n_va = max((min(len(va_im), 1024) // BATCH) * BATCH, BATCH)
    va_batch = pad_translate(va_im[:n_va], rng, train=False)
    va_lbl = torch.from_numpy(va_lb[:n_va])

    for epoch in range(args.epochs):
        t0 = time.time()
        perm = rng.permutation(n_train)
        sums, cnt = {}, 0
        for s in range(steps_per_epoch):
            sel = perm[s * BATCH:(s + 1) * BATCH]
            image = pad_translate(tr_im[sel], rng, train=True)
            label = torch.from_numpy(tr_lb[sel])
            res = model(image=image)
            loss, log = model.loss(res, reconstruction_target=image,
                                   label=label)
            opt.zero_grad()
            loss.backward()
            opt.step()
            sums["loss"] = sums.get("loss", 0.0) + float(loss)
            for k, v in log.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            cnt += 1
        sched.step()

        # validation rec_ll on a fixed center-padded subset (noise off)
        model.eval()
        va_sums = {}
        with torch.no_grad():
            for lo in range(0, len(va_batch), BATCH):
                img = va_batch[lo:lo + BATCH]
                res = model(image=img)
                _, vlog = model.loss(res, reconstruction_target=img,
                                     label=va_lbl[lo:lo + BATCH])
                for k, v in vlog.items():
                    va_sums[k] = va_sums.get(k, 0.0) + float(v)
        model.train()
        nb = max(1, len(va_batch) // BATCH)

        rec = {"epoch": epoch + 1, "sec": round(time.time() - t0, 1)}
        rec.update({k: round(v / cnt, 4) for k, v in sums.items()})
        rec.update({f"val_{k}": round(v / nb, 4)
                    for k, v in va_sums.items()})
        mf.write(json.dumps(rec) + "\n")
        print(f"[ab_ref_train] epoch {epoch+1}: loss {rec['loss']:.1f} "
              f"rec_ll {rec.get('rec_ll_loss', 0):.1f} "
              f"val_rec_ll {rec.get('val_rec_ll_loss', 0):.1f} "
              f"({rec['sec']}s)", flush=True)

        if (epoch + 1) % args.grid_every == 0 or epoch == args.epochs - 1:
            tag = f"epoch{epoch+1:03d}"
            save_template_grid(
                model, os.path.join(args.out, "images",
                                    f"templates_{tag}.png"))
            save_recon_grid(
                model, va_batch,
                os.path.join(args.out, "images", f"recons_{tag}.png"))
            torch.save(model.state_dict(),
                       os.path.join(args.out, "last.pt"))
    mf.close()


if __name__ == "__main__":
    main()
