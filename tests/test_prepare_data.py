"""tools/prepare_data.py: raw dumps -> the loader's {train,test}.npz
layout, consumed end-to-end by scae_tpu.train.data.load_datasets."""

import gzip
import os
import pickle
import struct
import subprocess
import sys

import numpy as np

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools",
                    "prepare_data.py")


def _write_idx(path, arr):
    arr = np.asarray(arr, np.uint8)
    header = struct.pack(">HBB", 0, 0x08, arr.ndim)
    header += struct.pack(f">{arr.ndim}I", *arr.shape)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wb") as f:
        f.write(header + arr.tobytes())


def _run_tool(src, dst):
    res = subprocess.run([sys.executable, TOOL, "--src", str(src),
                          "--dst", str(dst)], capture_output=True, text=True)
    assert res.returncode == 0, res.stderr + res.stdout
    return res.stdout


def _check_output(dst, n_train, n_test, shape_tail):
    for split, n in (("train", n_train), ("test", n_test)):
        with np.load(os.path.join(dst, f"{split}.npz")) as z:
            assert z["images"].shape == (n,) + shape_tail
            assert z["images"].dtype == np.uint8
            assert z["labels"].shape == (n,)


def test_mnist_idx_torchvision_layout(tmp_path):
    raw = tmp_path / "src" / "MNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.RandomState(0)
    _write_idx(str(raw / "train-images-idx3-ubyte.gz"),
               rng.randint(0, 255, (20, 28, 28)))
    _write_idx(str(raw / "train-labels-idx1-ubyte.gz"),
               rng.randint(0, 10, (20,)))
    _write_idx(str(raw / "t10k-images-idx3-ubyte"),
               rng.randint(0, 255, (8, 28, 28)))
    _write_idx(str(raw / "t10k-labels-idx1-ubyte"),
               rng.randint(0, 10, (8,)))
    out = _run_tool(tmp_path / "src", tmp_path / "dst")
    assert "mnist-idx" in out
    _check_output(str(tmp_path / "dst"), 20, 8, (28, 28))


def test_cifar10_pickle_batches(tmp_path):
    root = tmp_path / "src" / "cifar-10-batches-py"
    root.mkdir(parents=True)
    rng = np.random.RandomState(1)

    def write_batch(name, n):
        d = {b"data": rng.randint(0, 255, (n, 3072)).astype(np.uint8),
             b"labels": rng.randint(0, 10, (n,)).tolist()}
        with open(root / name, "wb") as f:
            pickle.dump(d, f)

    write_batch("data_batch_1", 10)
    write_batch("data_batch_2", 10)
    write_batch("test_batch", 6)
    out = _run_tool(tmp_path / "src", tmp_path / "dst")
    assert "cifar10-py" in out
    _check_output(str(tmp_path / "dst"), 20, 6, (32, 32, 3))


def test_npz_float_input_normalized_and_loader_roundtrip(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.RandomState(2)
    for split, n in (("train", 24), ("test", 8)):
        np.savez(src / f"{split}.npz",
                 images=rng.uniform(0, 1, (n, 28, 28)).astype(np.float32),
                 labels=rng.randint(0, 10, (n,)))
    _run_tool(src, tmp_path / "dst")
    _check_output(str(tmp_path / "dst"), 24, 8, (28, 28))

    # the prepared layout feeds load_datasets as the 'npz' source
    from scae_tpu.train.data import load_datasets
    train, val, test, source = load_datasets(
        data_dir=str(tmp_path / "dst"), val_size=4)
    assert source == "npz"
    assert len(train) == 20 and len(val) == 4 and len(test) == 8

def test_npz_found_via_env_search_path(tmp_path, monkeypatch):
    """SCAE_TPU_DATA_DIR must locate npz dumps, not just MNIST IDX files
    (the documented synth_mnist60k -> prepare_data -> env-var workflow)."""
    rng = np.random.RandomState(3)
    for split, n in (("train", 12), ("test", 4)):
        np.savez(tmp_path / f"{split}.npz",
                 images=rng.randint(0, 255, (n, 28, 28), dtype=np.uint8),
                 labels=rng.randint(0, 10, (n,)))
    import scae_tpu.train.data as data_lib
    monkeypatch.setattr(data_lib, "_SEARCH_PATHS", (str(tmp_path),))
    out = data_lib.find_npz(None)
    assert out is not None and out["train_images"].shape == (12, 28, 28)
    # explicit dir still wins over the search path
    assert data_lib.find_npz(str(tmp_path)) is not None
