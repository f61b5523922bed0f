"""Synthesize a 60k/10k MNIST-shaped IDX dataset (zero-egress stand-in).

VERDICT r3 ask #4: the production MNIST path — `tools/prepare_data.py`
→ `SCAE_TPU_DATA_DIR` → `find_mnist` → 55k/5k split → 430-step epochs
(reference torch_scae_experiments/mnist/experiment.py:42-50) — had only
ever run on small fixtures. This tool manufactures a full-size dataset
from the real optdigits images so the pipeline can be rehearsed at the
reference's exact scale on a box with no egress.

Each of the 60k train / 10k test images is a randomly augmented copy of
a real 28×28 digit (bilinear-upscaled optdigits): integer shift ±3,
mild zoom jitter (0.9–1.1), per-image contrast jitter. Train tiles only
the optdigits train split and test only its held-out split, so the
usual train/test separation survives the tiling. Labels follow the
source digit. Writes big-endian IDX files (the torchvision wire format,
gzipped) so prepare_data's raw-IDX branch gets exercised too.

Usage:
  python tools/synth_mnist60k.py --dst /tmp/mnist_raw [--n-train 60000]
  python tools/prepare_data.py --src /tmp/mnist_raw --dst data/mnist60k
  SCAE_TPU_DATA_DIR=data/mnist60k python -m scae_tpu.train.cli ...
"""

import argparse
import gzip
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scae_tpu.train.data import real_digits


def _write_idx(path, arr):
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    with gzip.open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, arr.ndim))
        f.write(struct.pack(f">{arr.ndim}I", *arr.shape))
        f.write(arr.tobytes())


def _augment(images, labels, n_out, rng):
    """n_out randomly shifted/zoomed/contrast-jittered copies."""
    from scipy import ndimage

    n_src, h, w = images.shape
    idx = rng.integers(0, n_src, size=n_out)
    out = np.zeros((n_out, h, w), np.uint8)
    shifts = rng.integers(-3, 4, size=(n_out, 2))
    zooms = rng.uniform(0.9, 1.1, size=n_out)
    gains = rng.uniform(0.7, 1.0, size=n_out)
    for i in range(n_out):
        img = images[idx[i]].astype(np.float32)
        z = zooms[i]
        zoomed = ndimage.zoom(img, z, order=1)
        zh, zw = zoomed.shape
        canvas = np.zeros((h, w), np.float32)
        # center the zoomed digit, then apply the integer shift
        ty = (h - zh) // 2 + shifts[i, 0]
        tx = (w - zw) // 2 + shifts[i, 1]
        sy, sx = max(0, -ty), max(0, -tx)
        dy, dx = max(0, ty), max(0, tx)
        ch = min(zh - sy, h - dy)
        cw = min(zw - sx, w - dx)
        canvas[dy:dy + ch, dx:dx + cw] = zoomed[sy:sy + ch, sx:sx + cw]
        out[i] = np.clip(canvas * gains[i], 0, 255).astype(np.uint8)
    return out, labels[idx].astype(np.uint8)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dst", default="/tmp/mnist_raw")
    ap.add_argument("--n-train", type=int, default=60000)
    ap.add_argument("--n-test", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    tr_im, tr_lb, te_im, te_lb = real_digits(size=28, seed=0)
    rng = np.random.default_rng(args.seed)
    print(f"[synth_mnist60k] tiling {len(tr_im)} train / {len(te_im)} "
          f"test source digits -> {args.n_train}/{args.n_test}")
    big_tr, big_tr_lb = _augment(tr_im, tr_lb, args.n_train, rng)
    big_te, big_te_lb = _augment(te_im, te_lb, args.n_test, rng)

    _write_idx(os.path.join(args.dst, "train-images-idx3-ubyte.gz"), big_tr)
    _write_idx(os.path.join(args.dst, "train-labels-idx1-ubyte.gz"),
               big_tr_lb)
    _write_idx(os.path.join(args.dst, "t10k-images-idx3-ubyte.gz"), big_te)
    _write_idx(os.path.join(args.dst, "t10k-labels-idx1-ubyte.gz"),
               big_te_lb)
    print(f"[synth_mnist60k] wrote IDX files to {args.dst}")


if __name__ == "__main__":
    main()
