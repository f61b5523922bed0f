"""MetricsWriter TensorBoard mirror + Profiler flag contract."""

import glob
import os

import numpy as np

from scae_tpu.train.metrics import MetricsWriter, Profiler


def test_tb_events_written_alongside_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.scalars(1, {"loss": 2.5, "rec_ll_loss": 1.25})
    w.images(1, "templates", np.random.rand(4, 1, 6, 6).astype(np.float32),
             n_cols=2)
    w.close()

    assert os.path.exists(tmp_path / "metrics.jsonl")
    assert glob.glob(str(tmp_path / "images" / "templates_*.png"))
    events = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert events, "no TensorBoard event file written"
    # scalars + an encoded image comfortably exceed an empty event file
    assert os.path.getsize(events[0]) > 200


def test_tb_mirror_can_be_disabled(tmp_path, monkeypatch):
    monkeypatch.setenv("SCAE_TPU_NO_TENSORBOARD", "1")
    w = MetricsWriter(str(tmp_path))
    w.scalars(1, {"loss": 1.0})
    w.close()
    assert not glob.glob(str(tmp_path / "tb" / "events.*"))


def test_profiler_inactive_returns_false(tmp_path):
    p = Profiler(str(tmp_path), start_step=-1)
    assert p.maybe_start(0) is False
    p.maybe_stop(10)  # no-op when never started
