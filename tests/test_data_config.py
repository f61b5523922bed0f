import gzip
import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scae_tpu.config import load_config
from scae_tpu.train import data as data_lib


def _write_idx(path, array):
    array = np.asarray(array, np.uint8)
    header = struct.pack(">HBB", 0, 0x08, array.ndim)
    header += struct.pack(f">{array.ndim}I", *array.shape)
    with open(path, "wb") as f:
        f.write(header + array.tobytes())


def test_idx_loader_roundtrip(tmp_path):
    root = str(tmp_path)
    imgs = np.random.RandomState(0).randint(0, 255, (10, 28, 28), np.uint8)
    labels = np.arange(10, dtype=np.uint8)
    _write_idx(os.path.join(root, "train-images-idx3-ubyte"), imgs)
    _write_idx(os.path.join(root, "train-labels-idx1-ubyte"), labels)
    _write_idx(os.path.join(root, "t10k-images-idx3-ubyte"), imgs[:4])
    _write_idx(os.path.join(root, "t10k-labels-idx1-ubyte"), labels[:4])
    found = data_lib.find_mnist(root)
    assert found is not None
    np.testing.assert_array_equal(found["train_images"], imgs)
    np.testing.assert_array_equal(found["test_labels"], labels[:4])


def test_idx_loader_gz(tmp_path):
    root = str(tmp_path)
    imgs = np.zeros((3, 5, 5), np.uint8)
    raw_path = os.path.join(root, "x")
    _write_idx(raw_path, imgs)
    with open(raw_path, "rb") as f:
        payload = f.read()
    with gzip.open(os.path.join(root,
                                "train-images-idx3-ubyte.gz"), "wb") as f:
        f.write(payload)
    out = data_lib._read_idx(os.path.join(root,
                                          "train-images-idx3-ubyte.gz"))
    np.testing.assert_array_equal(out, imgs)


def test_synthetic_digits_shapes_and_determinism():
    im1, lb1 = data_lib.synthetic_digits(20, seed=3)
    im2, lb2 = data_lib.synthetic_digits(20, seed=3)
    assert im1.shape == (20, 28, 28) and im1.dtype == np.uint8
    np.testing.assert_array_equal(im1, im2)
    np.testing.assert_array_equal(lb1, lb2)
    assert im1.max() > 100  # non-empty drawings


def test_dataset_batches():
    im, lb = data_lib.synthetic_digits(50, seed=0)
    ds = data_lib.Dataset(im, lb)
    batches = list(ds.batches(16, seed=1))
    assert len(batches) == 3  # drop remainder
    b = batches[0]
    assert b["image"].shape == (16, 1, 28, 28)
    assert b["image"].dtype == np.float32
    assert b["image"].max() <= 1.0
    assert b["label"].shape == (16,)


def test_load_datasets_synthetic_fallback(tmp_path):
    train, val, test, source = data_lib.load_datasets(
        data_dir=str(tmp_path), val_size=100,
        synthetic_train=400, synthetic_test=50)
    assert source == "synthetic"
    assert len(train) == 300 and len(val) == 100 and len(test) == 50


def test_pad_to_canvas_centers():
    img = jnp.ones((2, 1, 4, 4))
    out = data_lib.pad_to_canvas(img, 8)
    assert out.shape == (2, 1, 8, 8)
    assert float(out[:, :, 2:6, 2:6].min()) == 1.0
    assert float(out.sum()) == 2 * 16


def test_random_translate_preserves_content():
    img = jnp.zeros((3, 1, 8, 8)).at[:, :, 3:5, 3:5].set(1.0)
    out = data_lib.random_translate(img, jax.random.PRNGKey(0), max_shift=2)
    assert out.shape == img.shape
    # mass preserved (translation only, zero padding, shift <= margin)
    np.testing.assert_allclose(np.asarray(out.sum((1, 2, 3))),
                               np.asarray(img.sum((1, 2, 3))))


def test_random_translate_actually_moves():
    img = jnp.zeros((8, 1, 8, 8)).at[:, :, 4, 4].set(1.0)
    out = data_lib.random_translate(img, jax.random.PRNGKey(1), max_shift=2)
    positions = np.argwhere(np.asarray(out) > 0.5)[:, 2:]
    assert len(np.unique(positions, axis=0)) > 1  # not all identical


def test_random_affine_zero_params_is_identity():
    img = jax.random.uniform(jax.random.PRNGKey(2), (4, 1, 12, 12))
    out = data_lib.random_affine(img, jax.random.PRNGKey(3),
                                 degrees=0.0, scale_jitter=0.0)
    # theta=0, s=1 -> identity warp; bilinear taps land exactly on pixels
    np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                               rtol=1e-5, atol=1e-6)


def test_random_affine_rotates_about_center():
    # a half-plane image rotated by up to 25 deg keeps its center value
    # and changes its corners; mass approx preserved away from edges
    img = jnp.zeros((6, 1, 17, 17)).at[:, :, :, 9:].set(1.0)
    out = data_lib.random_affine(img, jax.random.PRNGKey(4),
                                 degrees=25.0, scale_jitter=0.0)
    assert out.shape == img.shape
    got = np.asarray(out)
    assert not np.allclose(got, np.asarray(img))   # actually rotated
    assert len({a.tobytes() for a in got}) > 1     # per-sample angles
    # center pixel of the filled half stays filled under <=25 deg
    assert got[:, 0, 8, 12].min() > 0.5


def test_random_affine_scale_jitter_zooms():
    img = jnp.zeros((8, 1, 16, 16)).at[:, :, 6:10, 6:10].set(1.0)
    out = data_lib.random_affine(img, jax.random.PRNGKey(5),
                                 degrees=0.0, scale_jitter=0.3)
    areas = np.asarray(out).sum((1, 2, 3))
    assert areas.std() > 0.1                       # zoom changes mass
    assert (areas > 4.0).all() and (areas < 40.0).all()


def test_augment_fn_affine_off_by_default_matches_translate_only():
    from scae_tpu.train.loop import make_augment_fn
    img = jax.random.uniform(jax.random.PRNGKey(6), (4, 1, 8, 8))
    batch = {"image": img, "label": jnp.zeros((4,), jnp.int32)}
    rng = jax.random.PRNGKey(7)
    base = make_augment_fn(canvas=12, max_shift=2)(batch, rng)
    off = make_augment_fn(canvas=12, max_shift=2, degrees=0.0,
                          scale_jitter=0.0)(batch, rng)
    np.testing.assert_array_equal(np.asarray(base["image"]),
                                  np.asarray(off["image"]))
    on = make_augment_fn(canvas=12, max_shift=2, degrees=20.0)(batch, rng)
    assert not np.allclose(np.asarray(on["image"]),
                           np.asarray(base["image"]))


# ------------------------------------------------------------- config


@pytest.mark.smoke
def test_load_config_defaults_and_overrides():
    cfg = load_config("config")
    assert cfg["optimizer"]["name"] == "rmsprop"
    assert cfg["model"]["n_part_caps"] == 40
    assert cfg["seed"] == 42

    cfg = load_config("config", overrides=[
        "optimizer=radam",
        "trainer.max_epochs=3",
        "data_loader.batch_size=64",
        "model.n_obj_caps=16",
        "trainer.new_key=hello",
    ])
    assert cfg["optimizer"]["name"] == "radam"
    assert cfg["trainer"]["max_epochs"] == 3
    assert cfg["data_loader"]["batch_size"] == 64
    assert cfg["model"]["n_obj_caps"] == 16
    assert cfg["trainer"]["new_key"] == "hello"


@pytest.mark.smoke
def test_config_model_feeds_factory():
    from scae_tpu.factory import prepare_model_params
    cfg = load_config("config")
    params = prepare_model_params(**cfg["model"])
    assert params["ocae_encoder_set_transformer"]["dim_in"] == 144
    assert params["pcae_decoder"]["output_size"] == (40, 40)


def test_real_digits_source():
    """sklearn optdigits source: real data, deterministic, disjoint splits."""
    tr, val, te, source = data_lib.load_datasets(source="digits", seed=7)
    assert source == "digits"
    assert tr.images.shape[1:] == (28, 28) and tr.images.dtype == np.uint8
    assert len(tr) + len(val) == 1500 and len(te) == 297
    assert len(val) == 1500 // 5  # val_size clamp for small real datasets
    assert set(np.unique(tr.labels)) == set(range(10))
    assert tr.images.max() > 200 and tr.images.min() == 0
    tr2, _, te2, _ = data_lib.load_datasets(source="digits", seed=7)
    np.testing.assert_array_equal(tr.images, tr2.images)
    np.testing.assert_array_equal(te.labels, te2.labels)


def test_split_seed_decouples_data_from_run_seed():
    """split_seed keys dataset content + splits; seed no longer does."""
    # different run seeds, same split_seed -> identical data everywhere
    a = data_lib.load_datasets(source="digits", seed=1, split_seed=7)
    b = data_lib.load_datasets(source="digits", seed=2, split_seed=7)
    for ds_a, ds_b in zip(a[:3], b[:3]):
        np.testing.assert_array_equal(ds_a.images, ds_b.images)
        np.testing.assert_array_equal(ds_a.labels, ds_b.labels)
    # split_seed=N matches the legacy seed=N split exactly
    c = data_lib.load_datasets(source="digits", seed=7)
    np.testing.assert_array_equal(a[0].images, c[0].images)
    np.testing.assert_array_equal(a[2].images, c[2].images)
    # and without split_seed, different seeds still split differently
    d = data_lib.load_datasets(source="digits", seed=1)
    assert not np.array_equal(a[0].images, d[0].images)
    # synthetic content is keyed by split_seed too
    s1 = data_lib.load_datasets(source="synthetic", seed=1, split_seed=7,
                                synthetic_train=256, synthetic_test=64)
    s2 = data_lib.load_datasets(source="synthetic", seed=2, split_seed=7,
                                synthetic_train=256, synthetic_test=64)
    np.testing.assert_array_equal(s1[0].images, s2[0].images)


def test_real_digits_color_and_size():
    tr_im, tr_lb, te_im, te_lb = data_lib.real_digits(size=32, n_channels=3)
    assert tr_im.shape == (1500, 32, 32, 3)
    assert te_im.shape == (297, 32, 32, 3)


def test_real_digits_example_tint_removes_label_shortcut():
    """tint="class" colors by label (a classification shortcut);
    tint="example" must break that correlation while keeping the split
    (labels, example order) identical."""
    import numpy as np

    cls_im, cls_lb, _, _ = data_lib.real_digits(
        size=16, n_channels=3, seed=7, tint="class")
    ex_im, ex_lb, _, _ = data_lib.real_digits(
        size=16, n_channels=3, seed=7, tint="example")
    np.testing.assert_array_equal(cls_lb, ex_lb)       # same split
    assert not np.array_equal(cls_im, ex_im)           # different colors

    def mean_color(im):
        # mean channel intensity over lit pixels -> (N, 3) color signature
        lit = im.astype(np.float32)
        mass = lit.sum(axis=(1, 2)) + 1e-6              # (N, 3)
        return mass / mass.sum(-1, keepdims=True)

    # class tints: same-label examples share a color signature
    sig = mean_color(cls_im)
    d0 = sig[cls_lb == 0]
    assert np.allclose(d0.std(0), 0, atol=1e-3)
    # example tints: same-label examples do NOT share one
    sig = mean_color(ex_im)
    d0 = sig[ex_lb == 0]
    assert d0.std(0).max() > 0.01

    with pytest.raises(ValueError):
        data_lib.real_digits(size=16, n_channels=3, tint="plaid")


def test_source_forcing_errors():
    with pytest.raises(ValueError):
        data_lib.load_datasets(source="imagenet")
    with pytest.raises(FileNotFoundError):
        data_lib.load_datasets(source="npz", data_dir="/nonexistent-dir")
