import json
import os
import zlib

import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.optim import make_optimizer
from scae_tpu.parallel.train_step import TrainState, create_train_state
from scae_tpu.train.checkpoint import CheckpointManager
from scae_tpu.train.metrics import MetricsWriter
from scae_tpu.utils.png import make_grid, write_png


def _tiny_state():
    from tests.test_parallel import tiny_model
    model = tiny_model()
    tx = make_optimizer("adam", 1e-4, batch_size=4)
    batch = {"image": jnp.zeros((4, 1, 24, 24)),
             "label": jnp.zeros((4,), jnp.int32)}
    return create_train_state(model, tx, batch, jax.random.PRNGKey(0))


def test_checkpoint_save_restore_roundtrip(tmp_path):
    state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    assert mgr.save(1, jax.device_get(state), metrics={"loss": 5.0})
    mgr.wait()
    assert mgr.latest_step == 1

    # mutate, save again with better loss
    state2 = state.replace(step=state.step + 1)
    mgr.save(2, jax.device_get(state2), metrics={"loss": 3.0})
    mgr.wait()
    assert mgr.best_step == 2

    restored = mgr.restore(state)
    # checkpoint id 2 holds state2 whose stored step value is 1
    assert int(restored.step) == int(state2.step)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    mgr.close()


def test_restore_params_without_template(tmp_path):
    """restore_params (the init_from warm-start path) recovers the
    params subtree with no TrainState template — so the source run may
    have used a different optimizer configuration."""
    state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, jax.device_get(state), metrics={"loss": 1.0})
    mgr.wait()
    params = mgr.restore_params()
    ref_tree = jax.tree.map(lambda x: (x.shape, str(x.dtype)),
                            jax.device_get(state.params))
    got_tree = jax.tree.map(lambda x: (x.shape, str(x.dtype)), params)
    assert ref_tree == got_tree
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_checkpoint_top_k_retention(tmp_path):
    state = jax.device_get(_tiny_state())
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for step, loss in [(1, 5.0), (2, 1.0), (3, 4.0), (4, 0.5)]:
        mgr.save(step, state, metrics={"loss": loss})
        mgr.wait()
    assert mgr.best_step == 4
    mgr.close()


def test_checkpoint_monitor_max_mode(tmp_path):
    """trainer.monitor=val_accuracy + monitor_mode=max keeps the
    peak-accuracy checkpoint that loss-monitored top-k would evict."""
    state = jax.device_get(_tiny_state())
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2,
                            monitor="val_accuracy", mode="max")
    for step, acc in [(1, 0.2), (2, 0.85), (3, 0.7), (4, 0.4)]:
        mgr.save(step, state, metrics={"val_accuracy": acc})
        mgr.wait()
    assert mgr.best_step == 2
    mgr.close()


def test_checkpoint_monitor_reads_legacy_loss_key(tmp_path):
    """Checkpoints written before the monitor was configurable store
    the monitored value under 'loss'; best_step must still work."""
    state = jax.device_get(_tiny_state())
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2,
                            monitor="loss")
    mgr.save(1, state, metrics={"loss": 5.0})
    mgr.wait()
    mgr.close()
    reopened = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2,
                                 monitor="val_loss")
    reopened.save(2, state, metrics={"val_loss": 3.0})
    reopened.wait()
    assert reopened.best_step == 2
    reopened.close()


def test_trainer_wires_monitor_from_config(tmp_path):
    from scae_tpu.config import load_config
    from scae_tpu.train.loop import Trainer
    cfg = load_config("config", overrides=[
        f"trainer.checkpoint_dir={tmp_path}/ckpt",
        f"trainer.log_dir={tmp_path}/logs",
        "trainer.monitor=val_accuracy",
        "trainer.monitor_mode=max",
    ])
    trainer = Trainer(cfg)
    assert trainer.monitor == "val_accuracy"
    assert trainer.monitor_mode == "max"


def test_png_writer_valid_file(tmp_path):
    img = np.random.RandomState(0).rand(16, 24)
    path = str(tmp_path / "test.png")
    write_png(path, img)
    with open(path, "rb") as f:
        blob = f.read()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    # decode IDAT and check dimensions from IHDR
    assert blob[12:16] == b"IHDR"
    import struct
    w, h = struct.unpack(">II", blob[16:24])
    assert (w, h) == (24, 16)
    idat_start = blob.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", blob[idat_start - 8:idat_start - 4])[0]
    raw = zlib.decompress(blob[idat_start:idat_start + idat_len])
    assert len(raw) == 16 * (24 + 1)  # rows + filter bytes


def test_make_grid_layout():
    imgs = np.zeros((5, 1, 4, 4), np.float32)
    grid = make_grid(imgs, n_cols=3, pad=1)
    # 2 rows x 3 cols of 4px + 1px padding
    assert grid.shape == (1 + 2 * 5, 1 + 3 * 5)


def test_metrics_writer_jsonl_and_images(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.scalars(10, {"loss": jnp.asarray(1.5), "acc": 0.25})
    w.images(10, "recons", np.random.rand(4, 1, 8, 8))
    w.close()
    lines = open(os.path.join(str(tmp_path), "metrics.jsonl")).readlines()
    rec = json.loads(lines[0])
    assert rec["step"] == 10 and rec["loss"] == 1.5
    pngs = os.listdir(os.path.join(str(tmp_path), "images"))
    assert any(p.startswith("recons_") for p in pngs)
