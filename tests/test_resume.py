"""Deterministic resume: an interrupted+resumed run must consume exactly
the data order of a never-interrupted run and land on the same state up
to float reassociation.

Epoch and intra-epoch position derive from the restored step
(train/loop.py), the per-step noise/augment RNG folds the absolute
step, and the Orbax round-trip is bit-exact (asserted below). The one
thing XLA does NOT guarantee is bitwise equality across different
scan-chunk groupings: a resumed run's first chunk is shorter, and a
trip-count-1 lax.scan compiles with slightly different fusion and
reassociation (measured ~7e-9/step on CPU), which RMSprop's tiny
eps = (1e-2/B)^2 then amplifies. So the final-state comparison uses an
fp-reassociation tolerance, while the data order and the checkpoint
round-trip are asserted exactly.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

_OVERRIDES = [
    "data_loader.batch_size=16",
    "trainer.log_every_steps=2",
    "trainer.max_eval_batches=1",
    "trainer.augment.canvas=24",
    "trainer.augment.max_shift=2",
    "model.image_shape=[1,24,24]",
    "model.n_part_caps=8",
    "model.n_obj_caps=4",
    "model.pcae_cnn_encoder_params.out_channels=[16,16,16,16]",
    "model.pcae_template_generator_params.template_size=[6,6]",
    "model.ocae_encoder_set_transformer_params.dim_hidden=8",
    "model.ocae_encoder_set_transformer_params.dim_out=16",
    "model.ocae_decoder_capsule_params.dim_caps=8",
    "model.ocae_decoder_capsule_params.hidden_sizes=[16]",
]


def _run(tmp_path, tag, max_steps, resume=False):
    from scae_tpu.config import load_config
    from scae_tpu.train.loop import Trainer
    import scae_tpu.train.data as data_lib

    class RecordingTrainer(Trainer):
        """Records the exact per-step batch-index stream fed to the
        jitted scan, so data order can be asserted bit-exactly,
        independent of the fp-tolerance state comparison."""

        def build_steps(self, steps_per_epoch):
            super().build_steps(steps_per_epoch)
            inner, rec = self.train_scan, []
            self.recorded_idxs = rec

            def recording_scan(state, data, idxs):
                rec.append(np.asarray(idxs).reshape(-1))
                return inner(state, data, idxs)

            self.train_scan = recording_scan

    cfg = load_config("config", overrides=_OVERRIDES + [
        f"trainer.checkpoint_dir={tmp_path}/{tag}/ckpt",
        f"trainer.log_dir={tmp_path}/{tag}/logs",
    ])
    orig = data_lib.load_datasets

    def tiny_datasets(**kw):
        kw.update(val_size=32, synthetic_train=128, synthetic_test=32)
        return orig(**kw)

    data_lib.load_datasets = tiny_datasets
    try:
        trainer = RecordingTrainer(cfg)
        state = trainer.run(max_epochs=4, max_steps=max_steps,
                            resume=resume)
    finally:
        data_lib.load_datasets = orig
    idx_stream = (np.concatenate(trainer.recorded_idxs)
                  if trainer.recorded_idxs else np.zeros(0, np.int32))
    return state, idx_stream


def test_resume_matches_uninterrupted_run(tmp_path):
    # continuous: 0 -> 6 steps (128 examples / bs16 = 8 steps/epoch, so
    # the interruption at 3 lands mid-epoch — the hard case)
    state_cont, idx_cont = _run(tmp_path, "cont", max_steps=6)

    # interrupted at 3 (checkpoint saved on stop), resumed to 6
    _, idx_a = _run(tmp_path, "split", max_steps=3)
    state_res, idx_b = _run(tmp_path, "split", max_steps=6, resume=True)

    assert int(state_res.step) == int(state_cont.step) == 6
    # the interrupted+resumed runs together must consume EXACTLY the
    # index stream of the uninterrupted run (bit-exact data order)
    np.testing.assert_array_equal(np.concatenate([idx_a, idx_b]), idx_cont)
    flat_c = jax.tree_util.tree_leaves(jax.device_get(state_cont.params))
    flat_r = jax.tree_util.tree_leaves(jax.device_get(state_res.params))
    for a, b in zip(flat_c, flat_r):
        # fp-reassociation tolerance (module docstring); a data-order or
        # restore bug diverges at O(1), orders of magnitude above this
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_checkpoint_roundtrip_is_bit_exact(tmp_path):
    """The Orbax save/restore itself is exact; the resume tolerance
    above exists only for scan-regrouping reassociation."""
    state, _ = _run(tmp_path, "bits", max_steps=3)

    from scae_tpu.config import load_config
    from scae_tpu.train.loop import Trainer
    import scae_tpu.train.data as data_lib

    cfg = load_config("config", overrides=_OVERRIDES + [
        f"trainer.checkpoint_dir={tmp_path}/bits/ckpt",
        f"trainer.log_dir={tmp_path}/bits2/logs",
    ])
    orig = data_lib.load_datasets

    def tiny_datasets(**kw):
        kw.update(val_size=32, synthetic_train=128, synthetic_test=32)
        return orig(**kw)

    data_lib.load_datasets = tiny_datasets
    try:
        t = Trainer(cfg)
        t.build_steps(6)
        restored = t.ckpt.restore(t.init_state(cfg["seed"]), step=3)
    finally:
        data_lib.load_datasets = orig

    for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(restored.params)),
            jax.tree_util.tree_leaves(jax.device_get(state.params))):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(restored.opt_state)),
            jax.tree_util.tree_leaves(jax.device_get(state.opt_state))):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(jax.device_get(restored.rng),
                          jax.device_get(state.rng))
