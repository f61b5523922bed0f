"""Metrics/observability: JSONL scalars + PNG image grids + TensorBoard
events + profiler hooks.

Replaces the reference's Lightning/TensorBoard logging (scalar loss-term
dict per step, lr per epoch, three image grids per val epoch —
base_experiment.py:98-126,145-182) with a dependency-light writer:
  * scalars appended to <dir>/metrics.jsonl (one JSON object per event)
  * image grids written as PNGs under <dir>/images/
  * the same scalars/grids mirrored to TensorBoard event files under
    <dir>/tb/ when torch.utils.tensorboard is importable (it is in this
    image) — drop-in comparable with the reference's TB logs; silently
    skipped otherwise so the core writer stays dependency-free
  * optional jax.profiler trace capture around chosen steps

The loss-term names match the reference exactly (rec_ll_loss,
log_prob_loss, prior_/posterior_ sparsity terms, cpr_dynamic_reg_loss,
prior_cls_xe, posterior_cls_xe) so dashboards translate 1:1.
"""

import json
import os
import time
from typing import Dict, Optional

import numpy as np

from scae_tpu.utils.png import make_grid, write_png


def _make_tb_writer(log_dir: str):
    """TensorBoard SummaryWriter if available; None otherwise."""
    if os.environ.get("SCAE_TPU_NO_TENSORBOARD"):
        return None
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:
        return None
    try:
        return SummaryWriter(os.path.join(log_dir, "tb"))
    except Exception:
        return None


class MetricsWriter:
    def __init__(self, log_dir: str, tensorboard: bool = True):
        self.log_dir = log_dir
        self.image_dir = os.path.join(log_dir, "images")
        os.makedirs(self.image_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a",
                       buffering=1)
        self._tb = _make_tb_writer(log_dir) if tensorboard else None

    def scalars(self, step: int, values: Dict[str, float],
                prefix: str = "") -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            rec[f"{prefix}{k}"] = float(np.asarray(v))
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in rec.items():
                if k not in ("step", "time"):
                    self._tb.add_scalar(k, v, global_step=int(step))

    def images(self, step: int, name: str, batch_nchw,
               n_cols: int = 8) -> None:
        """Write an (N, C, H, W) image batch as one PNG grid."""
        grid = make_grid(np.asarray(batch_nchw), n_cols=n_cols)
        write_png(os.path.join(self.image_dir,
                               f"{name}_step{int(step):08d}.png"), grid)
        if self._tb is not None:
            # grid is (H, W) or (H, W, C) float/uint8; TB wants HWC
            g = np.asarray(grid)
            if g.ndim == 2:
                g = g[..., None]
            self._tb.add_image(name, g, global_step=int(step),
                               dataformats="HWC")

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class Profiler:
    """Thin jax.profiler wrapper: trace steps [start, start+count)."""

    def __init__(self, log_dir: str, start_step: int = -1, n_steps: int = 3):
        self.trace_dir = os.path.join(log_dir, "profile")
        self.start_step = start_step
        self.end_step = start_step + n_steps
        self._active = False

    def maybe_start(self, step: int) -> bool:
        """Returns True while the trace is active (the train loop then
        syncs each chunk eagerly so traces don't bleed across chunks)."""
        if step == self.start_step and not self._active:
            import jax
            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        return self._active

    def maybe_stop(self, step: int):
        if self._active and step >= self.end_step:
            import jax
            jax.profiler.stop_trace()
            self._active = False


def viz_grid_tensors(res, n: int):
    """Device-side reduction of a forward result to exactly the small
    tensors the three grids need. Runs INSIDE the jitted viz forward so
    only ~hundreds of KB cross the host boundary — a full `res` pytree
    (per-caps alternative decodes, mixture stats) is >100 MB at the
    flagship shape, which dominated per-epoch wall time over a tunneled
    TPU link."""
    out = {
        "rec_mode": res.rec.pdf.mode()[:n],
        "raw_templates": res.raw_templates[0],        # (M, C, Ht, Wt)
        "transformed_templates": res.transformed_templates[0],
    }
    if res.bottom_up_rec is not None:
        out["bottom_up_mode"] = res.bottom_up_rec.pdf.mode()[:n]
    if res.top_down_rec is not None:
        out["top_down_mode"] = res.top_down_rec.pdf.mode()[:n]
    return out


def write_reconstruction_grids(writer: MetricsWriter, step: int, viz: dict,
                               images, max_n: int = 8) -> None:
    """The reference's three validation grids (base_experiment.py:152-182):
    originals + reconstruction modes (+ alternatives), raw templates,
    transformed templates. `viz` is the host-pulled dict from
    `viz_grid_tensors`."""
    n = min(max_n, images.shape[0])
    rows = [np.asarray(images[:n]), np.asarray(viz["rec_mode"][:n])]
    if "bottom_up_mode" in viz:
        rows.append(np.asarray(viz["bottom_up_mode"][:n]))
    if "top_down_mode" in viz:
        rows.append(np.asarray(viz["top_down_mode"][:n]))
    writer.images(step, "reconstructions", np.concatenate(rows), n_cols=n)

    raw = np.asarray(viz["raw_templates"])  # (M, C, Ht, Wt)
    writer.images(step, "templates", raw, n_cols=raw.shape[0])

    tt = np.asarray(viz["transformed_templates"])  # (M+1, C, H, W)
    writer.images(step, "transformed_templates", tt, n_cols=tt.shape[0])
