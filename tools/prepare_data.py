"""Convert common dataset dumps into scae_tpu's loader layout.

VERDICT round-2 item 5: the training loader (scae_tpu/train/data.py)
reads either MNIST IDX files or a generic ``{train,test}.npz`` layout
from ``SCAE_TPU_DATA_DIR`` — but there was no tool to produce that
layout from the formats users actually have. This fills the gap for a
zero-egress box: point it at files you staged by any means and it
normalizes them.

Supported inputs (auto-detected per --src):
  * torchvision MNIST cache        <src>/MNIST/raw/*-ubyte(.gz)
  * raw IDX files                  <src>/train-images-idx3-ubyte(.gz) ...
  * torchvision SVHN .mat files    <src>/train_32x32.mat, test_32x32.mat
  * CIFAR-10 python pickle batches <src>/cifar-10-batches-py/
  * any npz with images/labels     <src>/{train,test}.npz (validated+copied)

Output layout (what find_npz/find_mnist consume, train/data.py:182-229):
  <dst>/train.npz  {images: uint8 (N,H,W[,C]), labels: int64 (N,)}
  <dst>/test.npz   same keys

Usage:
  python tools/prepare_data.py --src ~/Downloads/mnist_raw --dst ./data/mnist
  SCAE_TPU_DATA_DIR=./data/mnist python -m scae_tpu.train.cli

Reference analog: torchvision download in mnist/experiment.py:42-50.
"""

import argparse
import glob
import gzip
import os
import pickle
import struct
import sys

import numpy as np


def _read_idx(path):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        zero, dtype_code, ndim = struct.unpack(">HBB", f.read(4))
        assert zero == 0 and dtype_code == 0x08, f"bad IDX file {path}"
        shape = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(shape)


def _find_one(root, *patterns):
    for pat in patterns:
        hits = sorted(glob.glob(os.path.join(root, pat)))
        if hits:
            return hits[0]
    return None


def load_mnist_idx(src):
    """MNIST IDX files, flat or in a torchvision MNIST/raw cache."""
    roots = [src, os.path.join(src, "MNIST", "raw"), os.path.join(src, "raw")]
    for root in roots:
        tr_im = _find_one(root, "train-images-idx3-ubyte*")
        tr_lb = _find_one(root, "train-labels-idx1-ubyte*")
        te_im = _find_one(root, "t10k-images-idx3-ubyte*")
        te_lb = _find_one(root, "t10k-labels-idx1-ubyte*")
        if all([tr_im, tr_lb, te_im, te_lb]):
            return ((_read_idx(tr_im), _read_idx(tr_lb).astype(np.int64)),
                    (_read_idx(te_im), _read_idx(te_lb).astype(np.int64)))
    return None


def load_svhn_mat(src):
    """torchvision SVHN format: {train,test}_32x32.mat (scipy layout)."""
    tr = _find_one(src, "train_32x32.mat")
    te = _find_one(src, "test_32x32.mat")
    if not (tr and te):
        return None
    try:
        from scipy.io import loadmat  # optional dep; gated
    except ImportError:
        sys.exit("SVHN .mat input needs scipy, which is not available in "
                 "this image — convert to {train,test}.npz externally")

    def conv(path):
        m = loadmat(path)
        x = np.transpose(m["X"], (3, 0, 1, 2))  # (N, 32, 32, 3) uint8
        y = m["y"].reshape(-1).astype(np.int64) % 10  # '10' means 0
        return x.astype(np.uint8), y

    return conv(tr), conv(te)


def load_cifar10(src):
    """CIFAR-10 python pickle batches (cifar-10-batches-py)."""
    root = src if os.path.basename(src) == "cifar-10-batches-py" else \
        os.path.join(src, "cifar-10-batches-py")
    if not os.path.isdir(root):
        return None

    def read_batch(path):
        with open(path, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        return x.astype(np.uint8), np.asarray(d[b"labels"], np.int64)

    trs = [read_batch(p) for p in sorted(
        glob.glob(os.path.join(root, "data_batch_*")))]
    if not trs:
        return None
    te = read_batch(os.path.join(root, "test_batch"))
    return ((np.concatenate([x for x, _ in trs]),
             np.concatenate([y for _, y in trs])), te)


def load_npz(src):
    """Pre-made {train,test}.npz — validated and normalized."""
    tr, te = (os.path.join(src, f"{s}.npz") for s in ("train", "test"))
    if not (os.path.exists(tr) and os.path.exists(te)):
        return None

    def conv(path):
        with np.load(path) as z:
            images, labels = z["images"], z["labels"]
        if images.dtype != np.uint8:
            lo, hi = float(images.min()), float(images.max())
            scale = 255.0 if hi <= 1.0 + 1e-6 and lo >= 0 else 1.0
            images = np.clip(images * scale, 0, 255).astype(np.uint8)
        return images, labels.reshape(-1).astype(np.int64)

    return conv(tr), conv(te)


LOADERS = (("mnist-idx", load_mnist_idx), ("svhn-mat", load_svhn_mat),
           ("cifar10-py", load_cifar10), ("npz", load_npz))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--src", required=True, help="staged raw dataset dir")
    ap.add_argument("--dst", required=True, help="output dir for the loader")
    args = ap.parse_args()

    found = None
    for name, loader in LOADERS:
        out = loader(args.src)
        if out is not None:
            found = (name, out)
            break
    if found is None:
        sys.exit(f"no recognized dataset under {args.src} "
                 f"(tried: {', '.join(n for n, _ in LOADERS)})")

    name, ((tr_im, tr_lb), (te_im, te_lb)) = found
    assert tr_im.ndim in (3, 4) and te_im.ndim in (3, 4), (
        tr_im.shape, te_im.shape)
    assert len(tr_im) == len(tr_lb) and len(te_im) == len(te_lb)
    os.makedirs(args.dst, exist_ok=True)
    np.savez_compressed(os.path.join(args.dst, "train.npz"),
                        images=tr_im, labels=tr_lb)
    np.savez_compressed(os.path.join(args.dst, "test.npz"),
                        images=te_im, labels=te_lb)
    print(f"[prepare_data] {name}: train {tr_im.shape} {tr_im.dtype}, "
          f"test {te_im.shape} -> {args.dst}/{{train,test}}.npz")
    print(f"  use: SCAE_TPU_DATA_DIR={args.dst} python -m scae_tpu.train.cli"
          f"  (or data_loader.data_dir={args.dst})")


if __name__ == "__main__":
    main()
