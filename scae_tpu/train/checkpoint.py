"""Orbax checkpoint/resume: params + optimizer state + step + PRNG key.

Replaces the reference's Lightning ModelCheckpoint(save_top_k) +
resume_from_checkpoint flow (mnist/train.py:34-38, train.ipynb cell 9) with
an Orbax CheckpointManager: async-capable saves, top-k retention by a
monitored metric (val loss, mode=min), and restart-based recovery — the
standard JAX multi-host failure-tolerance story (SURVEY.md §5).
"""

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from scae_tpu.parallel.train_step import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 monitor: str = "loss", mode: str = "min"):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        def _score(m, _key=monitor, _mode=mode):
            if _key in m:
                return m[_key]
            # checkpoints written before the monitor was configurable
            # store the monitored value under "loss" — comparable only
            # when the monitor IS the loss
            if _key in ("loss", "val_loss") and "loss" in m:
                return m["loss"]
            # a checkpoint with no comparable metric (e.g. the monitor
            # changed between runs) ranks worst; never crash, never win
            return float("-inf") if _mode == "max" else float("inf")

        best_fn = _score if monitor else None
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=best_fn,
            best_mode=mode,
            create=True,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: Any,
             metrics: Optional[dict] = None) -> bool:
        """`state` may be a TrainState or a zero-arg thunk producing one
        (the loop passes a thunk so a disabled manager never pays the
        device→host transfer)."""
        if callable(state):
            state = state()
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        return self._mgr.save(
            int(step), args=ocp.args.StandardSave(state), metrics=metrics)

    def restore(self, state_template: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = self._mgr.latest_step() if step is None else step
        assert step is not None, "no checkpoint to restore"
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                state_template)
        return self._mgr.restore(
            int(step), args=ocp.args.StandardRestore(abstract))

    def restore_params(self, step: Optional[int] = None) -> Any:
        """Params subtree only, restored without a template (host numpy).

        Warm-start path (`init_from=<dir>`): unlike `restore`, no
        TrainState template is required, so the source run may have used
        a different optimizer/lookahead configuration — only the model
        parameters must match the current architecture (checked by the
        caller against its freshly-initialized tree).
        """
        step = self._mgr.latest_step() if step is None else step
        assert step is not None, "no checkpoint to restore params from"
        raw = self._mgr.restore(int(step), args=ocp.args.StandardRestore())
        if isinstance(raw, dict) and "params" in raw:
            return raw["params"]
        return raw.params

    def metrics(self, step: int) -> Optional[dict]:
        return self._mgr.metrics(int(step))

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    @property
    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


class NullCheckpointManager:
    """`trainer.save_top_k: 0` — checkpointing disabled.

    Sweep/probe runs judged purely on logged metrics don't need model
    snapshots; async Orbax saves cost seconds per eval on top-k churn
    ("Waiting for previous save to complete" stalls). Keeps the
    directory (the loop records train_seed.json there) and the full
    manager surface so the training loop needs no branching.
    """

    def __init__(self, directory: str):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.directory = directory

    def save(self, step, state, metrics=None) -> bool:
        return False

    def restore(self, state_template, step=None):
        raise AssertionError("checkpointing disabled (save_top_k=0)")

    def restore_params(self, step=None):
        raise AssertionError("checkpointing disabled (save_top_k=0)")

    def metrics(self, step):
        return None

    @property
    def latest_step(self):
        return None

    @property
    def best_step(self):
        return None

    def wait(self):
        pass

    def close(self):
        pass
