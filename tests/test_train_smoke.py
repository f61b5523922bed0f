"""End-to-end training smoke: jitted SPMD step drives the loss down."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow

from scae_tpu.optim import make_optimizer
from scae_tpu.parallel.train_step import create_train_state
from scae_tpu.train.data import random_translate, synthetic_digits
from tests.test_parallel import tiny_model


def test_loss_decreases_on_synthetic_data():
    model = tiny_model()
    batch_size = 16
    tx = make_optimizer("rmsprop", 3e-4, batch_size=batch_size)

    images, labels = synthetic_digits(batch_size * 4, seed=0, size=24)
    images = jnp.asarray(images[:, None].astype(np.float32) / 255.0)
    labels = jnp.asarray(labels.astype(np.int32))

    batch0 = {"image": images[:batch_size], "label": labels[:batch_size]}
    state = create_train_state(model, tx, batch0, jax.random.PRNGKey(0))

    @jax.jit
    def step(state, batch):
        step_rng = jax.random.fold_in(state.rng, state.step)

        def lf(params):
            res = model.apply({"params": params}, batch["image"],
                              deterministic=False,
                              rngs={"noise": step_rng})
            loss, log = model.loss(res, batch["image"], batch["label"])
            return loss, log

        (loss, _), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss

    losses = []
    for i in range(60):
        sel = (i % 4) * batch_size
        batch = {"image": images[sel:sel + batch_size],
                 "label": labels[sel:sel + batch_size]}
        state, loss = step(state, batch)
        losses.append(float(loss))

    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_trainer_loop_one_epoch(tmp_path):
    """Full Trainer harness: config -> data -> steps -> ckpt -> metrics."""
    from scae_tpu.config import load_config
    from scae_tpu.train.loop import Trainer

    cfg = load_config("config", overrides=[
        "data_loader.batch_size=16",
        "trainer.max_epochs=1",
        "trainer.log_every_steps=2",
        f"trainer.checkpoint_dir={tmp_path}/ckpt",
        f"trainer.log_dir={tmp_path}/logs",
        "trainer.max_eval_batches=1",
        "trainer.augment.canvas=24",
        "trainer.augment.max_shift=2",
        # tiny architecture for test speed
        "model.image_shape=[1,24,24]",
        "model.n_part_caps=8",
        "model.n_obj_caps=4",
        "model.pcae_cnn_encoder_params.out_channels=[16,16,16,16]",
        "model.pcae_template_generator_params.template_size=[6,6]",
        "model.ocae_encoder_set_transformer_params.dim_hidden=8",
        "model.ocae_encoder_set_transformer_params.dim_out=16",
        "model.ocae_decoder_capsule_params.dim_caps=8",
        "model.ocae_decoder_capsule_params.hidden_sizes=[16]",
    ])
    # synthetic dataset small enough for a quick epoch
    import scae_tpu.train.data as data_lib
    orig = data_lib.load_datasets

    def tiny_datasets(**kw):
        kw.update(val_size=32, synthetic_train=128, synthetic_test=32)
        return orig(**kw)

    data_lib.load_datasets = tiny_datasets
    try:
        trainer = Trainer(cfg)
        state = trainer.run(max_epochs=1, max_steps=4)
    finally:
        data_lib.load_datasets = orig

    assert int(state.step) == 4
    import os
    assert os.path.exists(f"{tmp_path}/logs/metrics.jsonl")
    assert len(os.listdir(f"{tmp_path}/logs/images")) >= 3
    assert trainer.ckpt.latest_step is not None


def test_seed_probe_selects_and_trains(tmp_path, capsys):
    """trainer.seed_probe: probe n candidate seeds briefly, then the
    full run proceeds with the val_rec_ll winner."""
    from scae_tpu.config import load_config
    from scae_tpu.train.loop import Trainer

    cfg = load_config("config", overrides=[
        "data_loader.batch_size=16",
        "trainer.max_epochs=1",
        "trainer.log_every_steps=4",
        f"trainer.checkpoint_dir={tmp_path}/ckpt",
        f"trainer.log_dir={tmp_path}/logs",
        "trainer.max_eval_batches=1",
        "trainer.seed_probe.n=2",
        "trainer.seed_probe.epochs=1",
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
    ])
    import scae_tpu.train.data as data_lib
    orig = data_lib.load_datasets

    def tiny_datasets(**kw):
        kw.update(val_size=32, synthetic_train=64, synthetic_test=32)
        return orig(**kw)

    data_lib.load_datasets = tiny_datasets
    try:
        trainer = Trainer(cfg)
        state = trainer.run(max_epochs=2)

        out = capsys.readouterr().out
        assert "seed probe 42:" in out and "seed probe 43:" in out
        assert "seed probe winner:" in out
        # the winner's probe training is continued, not replayed
        assert "continuing probe winner from step" in out

        # the winner is persisted (it keys the data split) and a resume
        # reuses it instead of re-probing or reverting to cfg seed
        import json
        with open(f"{tmp_path}/ckpt/train_seed.json") as f:
            winner = json.load(f)["seed"]
        assert winner in (42, 43)
        assert f"seed probe winner: {winner}" in out

        trainer2 = Trainer(cfg)
        trainer2.run(max_epochs=2, resume=True)
        out2 = capsys.readouterr().out
        assert "seed probe winner:" not in out2  # no re-probe
        assert f"resume: recorded training seed {winner}" in out2
    finally:
        data_lib.load_datasets = orig
    # 64 synthetic - 32 val = 32 train / B=16 = 2 steps/epoch x 2 epochs
    # (the winner's 1 probe epoch counted toward the schedule)
    assert int(state.step) == 4


_TINY_MODEL = [
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


def test_template_init_patches(tmp_path, capsys):
    """trainer.template_init=patches: templates start as data crops
    (logit-mapped through the configured nonlin), deterministically per
    seed, and training proceeds."""
    from scae_tpu.config import load_config
    from scae_tpu.train.loop import Trainer

    overrides = [
        "data_loader.batch_size=16",
        "trainer.max_epochs=1",
        "trainer.log_every_steps=2",
        f"trainer.checkpoint_dir={tmp_path}/ckpt",
        f"trainer.log_dir={tmp_path}/logs",
        "trainer.max_eval_batches=1",
        "trainer.augment.canvas=24",
        "trainer.augment.max_shift=2",
        "trainer.template_init=patches",
        "model.pcae_template_generator_params.template_nonlin=sigmoid",
        *_TINY_MODEL,
    ]
    import scae_tpu.train.data as data_lib
    orig = data_lib.load_datasets

    def tiny_datasets(**kw):
        kw.update(val_size=32, synthetic_train=64, synthetic_test=32)
        return orig(**kw)

    data_lib.load_datasets = tiny_datasets
    try:
        trainer = Trainer(load_config("config", overrides=overrides))
        trainer.build_steps(steps_per_epoch=2)
        train_ds, _, _, _ = data_lib.load_datasets(seed=5, image_size=24)

        s1 = trainer._maybe_patch_templates(trainer.init_state(5),
                                            train_ds, 5)
        out = capsys.readouterr().out
        assert "template_init=patches" in out
        logits = s1.params["template_generator"]["template_logits"]
        # sigmoid-mapped crops reach |logit(0.99)| ~ 4.6; the QR init
        # lives in [0, 1] — the param is unmistakably crop-derived
        assert float(jnp.abs(logits).max()) > 2.0
        # deterministic per seed; different seed -> different crops
        s1b = trainer._maybe_patch_templates(trainer.init_state(5),
                                             train_ds, 5)
        np.testing.assert_array_equal(
            np.asarray(logits),
            np.asarray(s1b.params["template_generator"]
                       ["template_logits"]))
        s2 = trainer._maybe_patch_templates(trainer.init_state(5),
                                            train_ds, 6)
        assert not np.array_equal(
            np.asarray(logits),
            np.asarray(s2.params["template_generator"]
                       ["template_logits"]))

        # end to end through the CLI-equivalent run path
        state = trainer.run(max_epochs=1, max_steps=2)
        assert int(state.step) == 2
        assert "template_init=patches" in capsys.readouterr().out
    finally:
        data_lib.load_datasets = orig


def test_init_from_warm_starts_params(tmp_path, capsys):
    """init_from=<ckpt dir>: a NEW run starts from another run's best
    params (fresh optimizer/step), trains, and rejects architecture
    mismatches loudly."""
    from scae_tpu.config import load_config
    from scae_tpu.train.loop import Trainer

    def overrides(sub, extra=()):
        return [
            "data_loader.batch_size=16",
            "trainer.max_epochs=1",
            "trainer.log_every_steps=2",
            f"trainer.checkpoint_dir={tmp_path}/{sub}/ckpt",
            f"trainer.log_dir={tmp_path}/{sub}/logs",
            "trainer.max_eval_batches=1",
            "trainer.augment.canvas=24",
            "trainer.augment.max_shift=2",
            *_TINY_MODEL,
            *extra,
        ]

    import scae_tpu.train.data as data_lib
    orig = data_lib.load_datasets

    def tiny_datasets(**kw):
        kw.update(val_size=32, synthetic_train=64, synthetic_test=32)
        return orig(**kw)

    data_lib.load_datasets = tiny_datasets
    try:
        src = Trainer(load_config("config", overrides=overrides("a")))
        src_state = src.run(max_epochs=1, max_steps=2)
        src.ckpt.wait()

        cfg_b = load_config("config", overrides=overrides(
            "b", [f"init_from={tmp_path}/a/ckpt"]))
        warm = Trainer(cfg_b)
        warm.build_steps(steps_per_epoch=2)
        state_b = warm.init_state(seed=7)
        out = capsys.readouterr().out
        assert "warm start: params from" in out
        # params come from run A's checkpoint; step/opt restart fresh
        assert int(state_b.step) == 0
        for a, b in zip(jax.tree.leaves(jax.device_get(src_state.params)),
                        jax.tree.leaves(state_b.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # and the warm-started run trains end to end
        final = warm.run(max_epochs=1, max_steps=2)
        assert int(final.step) == 2

        # architecture mismatch is rejected, not silently reshaped
        cfg_c = load_config("config", overrides=overrides(
            "c", [f"init_from={tmp_path}/a/ckpt",
                  "model.n_part_caps=6"]))
        bad = Trainer(cfg_c)
        bad.build_steps(steps_per_epoch=2)
        with pytest.raises(ValueError, match="init_from"):
            bad.init_state(seed=7)

        # no checkpoints in the source dir: loud failure
        cfg_d = load_config("config", overrides=overrides(
            "d", [f"init_from={tmp_path}/empty"]))
        t = Trainer(cfg_d)
        t.build_steps(steps_per_epoch=2)
        with pytest.raises(FileNotFoundError, match="no checkpoints"):
            t.init_state(seed=7)

        # a crafted source where best-by-val_loss (step 1) != latest
        # (step 2): the current monitor picks best when the source
        # recorded it, falls back to LATEST when it did not (a
        # different-monitor source ranks all checkpoints equal-worst
        # and best_step would silently return an arbitrary one), and
        # init_from_step pins explicitly
        from scae_tpu.train.checkpoint import CheckpointManager
        src2 = CheckpointManager(f"{tmp_path}/src2", monitor="val_loss")
        host_state = jax.device_get(src_state)
        src2.save(1, host_state, metrics={"val_loss": 1.0})
        src2.save(2, host_state, metrics={"val_loss": 5.0})
        src2.wait()
        src2.close()

        def warm_step_printed(sub, extra):
            cfg = load_config("config", overrides=overrides(
                sub, [f"init_from={tmp_path}/src2", *extra]))
            t = Trainer(cfg)
            t.build_steps(steps_per_epoch=2)
            t.init_state(seed=7)
            return capsys.readouterr().out

        assert "step 1" in warm_step_printed("e", [])  # best val_loss
        assert "step 2" in warm_step_printed(
            "f", ["trainer.monitor=val_accuracy",
                  "trainer.monitor_mode=max"])          # fallback: latest
        assert "step 1" in warm_step_printed(
            "g", ["trainer.monitor=val_accuracy",
                  "trainer.monitor_mode=max",
                  "init_from_step=1"])                  # explicit pin
    finally:
        data_lib.load_datasets = orig


def test_save_top_k_zero_disables_checkpointing(tmp_path):
    """trainer.save_top_k=0: sweep runs judged on metrics alone skip
    Orbax entirely (NullCheckpointManager) — no checkpoint tree is
    written, metrics/images still land, and resume/test raise cleanly."""
    from scae_tpu.config import load_config
    from scae_tpu.train.checkpoint import NullCheckpointManager
    from scae_tpu.train.loop import Trainer

    cfg = load_config("config", overrides=[
        "data_loader.batch_size=16",
        "trainer.max_epochs=1",
        "trainer.log_every_steps=2",
        "trainer.save_top_k=0",
        f"trainer.checkpoint_dir={tmp_path}/ckpt",
        f"trainer.log_dir={tmp_path}/logs",
        "trainer.max_eval_batches=1",
        "trainer.augment.canvas=24",
        "trainer.augment.max_shift=2",
        *_TINY_MODEL,
    ])
    import os

    import scae_tpu.train.data as data_lib
    orig = data_lib.load_datasets

    def tiny_datasets(**kw):
        kw.update(val_size=32, synthetic_train=128, synthetic_test=32)
        return orig(**kw)

    data_lib.load_datasets = tiny_datasets
    try:
        trainer = Trainer(cfg)
        assert isinstance(trainer.ckpt, NullCheckpointManager)
        state = trainer.run(max_epochs=1, max_steps=4)
    finally:
        data_lib.load_datasets = orig

    assert int(state.step) == 4
    assert trainer.ckpt.latest_step is None
    # the dir holds only the recorded training seed, no Orbax tree
    assert set(os.listdir(f"{tmp_path}/ckpt")) <= {"train_seed.json"}
    assert os.path.exists(f"{tmp_path}/logs/metrics.jsonl")
    with pytest.raises(AssertionError, match="no checkpoint to test"):
        trainer.run_test()


def test_run_test_reports_per_class_recall(tmp_path):
    """mode=test must surface per-class recall — aggregate-only metrics
    hid a whole-class failure (RESULTS.md round-4 class-8 diagnosis)."""
    from scae_tpu.config import load_config
    from scae_tpu.train.loop import Trainer

    cfg = load_config("config", overrides=[
        "data_loader.batch_size=16",
        "trainer.max_epochs=1",
        "trainer.log_every_steps=2",
        f"trainer.checkpoint_dir={tmp_path}/ckpt",
        f"trainer.log_dir={tmp_path}/logs",
        "trainer.max_eval_batches=1",
        "trainer.augment.canvas=24",
        "trainer.augment.max_shift=2",
        *_TINY_MODEL,
    ])
    import scae_tpu.train.data as data_lib
    orig = data_lib.load_datasets

    def tiny_datasets(**kw):
        kw.update(val_size=32, synthetic_train=64, synthetic_test=40)
        return orig(**kw)

    data_lib.load_datasets = tiny_datasets
    try:
        trainer = Trainer(cfg)
        trainer.run(max_epochs=1, max_steps=2)
        trainer.ckpt.wait()
        metrics = Trainer(cfg).run_test()
    finally:
        data_lib.load_datasets = orig

    recalls = {k: v for k, v in metrics.items()
               if k.startswith("test_class") and k.endswith("_recall")}
    assert recalls, "per-class recall missing from run_test metrics"
    assert all(0.0 <= v <= 1.0 for v in recalls.values())
    # the full 40-example split is evaluated (16*2=32 batched + padded
    # remainder), so every class present in the split gets a recall row
    assert len(recalls) >= 5
    # headline accuracy covers ALL 40 examples (k/40); the scan figure
    # (kept for series continuity) floors to 2 batches = 32 (k/32)
    assert "test_accuracy" in metrics and "test_accuracy_scan" in metrics
    full, scan = metrics["test_accuracy"], metrics["test_accuracy_scan"]
    assert abs(full * 40 - round(full * 40)) < 1e-6, full
    assert abs(scan * 32 - round(scan * 32)) < 1e-6, scan


def test_head_refit_bakes_probe_into_best_checkpoint(tmp_path, capsys):
    """trainer.head_refit=true: after training, the probe readout is fit
    on the frozen trunk and saved as a new checkpoint whose posterior
    head IS the probe — mode=test / serving read it with no new code
    paths (the in-trainer twin of tools/probe_calibrate.py)."""
    from scae_tpu.config import load_config
    from scae_tpu.train.checkpoint import CheckpointManager
    from scae_tpu.train.loop import Trainer

    cfg = load_config("config", overrides=[
        "data_loader.batch_size=16",
        "trainer.max_epochs=1",
        "trainer.log_every_steps=2",
        f"trainer.checkpoint_dir={tmp_path}/ckpt",
        f"trainer.log_dir={tmp_path}/logs",
        "trainer.max_eval_batches=1",
        "trainer.augment.canvas=24",
        "trainer.augment.max_shift=2",
        "trainer.monitor=val_accuracy",
        "trainer.monitor_mode=max",
        "trainer.head_refit=true",
        *_TINY_MODEL,
    ])
    import scae_tpu.train.data as data_lib
    orig = data_lib.load_datasets

    def tiny_datasets(**kw):
        kw.update(val_size=32, synthetic_train=64, synthetic_test=40)
        return orig(**kw)

    data_lib.load_datasets = tiny_datasets
    try:
        trainer = Trainer(cfg)
        trainer.run(max_epochs=1, max_steps=4)
        out = capsys.readouterr().out
        assert "head_refit: C*=" in out, out

        steps = sorted(trainer.ckpt._mgr.all_steps())
        # the refit checkpoint is saved at <source best>+1
        assert any(s - 1 in steps for s in steps), steps
        refit_step = max(s for s in steps if s - 1 in steps)
        src = trainer.ckpt.restore_params(step=refit_step - 1)
        new = trainer.ckpt.restore_params(step=refit_step)
        import numpy as np
        assert not np.allclose(
            np.asarray(src["posterior_classifier"]["kernel"]),
            np.asarray(new["posterior_classifier"]["kernel"]))
        # trunk is untouched: the refit only rewrites the head
        assert np.allclose(
            np.asarray(src["part_encoder"]["img_embedding_bias"]),
            np.asarray(new["part_encoder"]["img_embedding_bias"]))

        # the probe fit maximizes val accuracy on the frozen features,
        # so under a val_accuracy monitor the refit step ranks best and
        # mode=test restores it
        assert trainer.ckpt.best_step == refit_step
        metrics = Trainer(cfg).run_test()
        assert "test_accuracy" in metrics
    finally:
        data_lib.load_datasets = orig


def test_head_refit_survives_nonmonotonic_best(tmp_path, capsys):
    """Regression (round 5, run r500): the best-ranked checkpoint is
    usually NOT the latest one written, and Orbax silently refuses
    saves at steps <= latest_step. refit_head must place the refit
    checkpoint past the LATEST step (and fail loudly if the manager
    refuses), or the refit silently evaporates and mode=test reads the
    old joint head."""
    import numpy as np

    from scae_tpu.config import load_config
    from scae_tpu.train.loop import Trainer
    import scae_tpu.train.data as data_lib

    cfg = load_config("config", overrides=[
        "data_loader.batch_size=16",
        f"trainer.checkpoint_dir={tmp_path}/ckpt",
        f"trainer.log_dir={tmp_path}/logs",
        "trainer.augment.canvas=24",
        "trainer.monitor=val_accuracy",
        "trainer.monitor_mode=max",
        "trainer.head_refit=true",
        *_TINY_MODEL,
    ])
    trainer = Trainer(cfg)
    trainer.build_steps(steps_per_epoch=4)
    state = trainer.init_state(cfg.get("seed", 42))
    # best (step 10) ranks above latest (step 20) — the real-run shape
    assert trainer.ckpt.save(10, jax.device_get(state),
                             metrics={"val_accuracy": 0.002})
    assert trainer.ckpt.save(20, jax.device_get(state),
                             metrics={"val_accuracy": 0.001})
    trainer.ckpt.wait()
    assert trainer.ckpt.best_step == 10
    assert trainer.ckpt.latest_step == 20

    train_ds, val_ds, _, _ = data_lib.load_datasets(
        seed=7, image_size=24, val_size=32,
        synthetic_train=64, synthetic_test=16, source="synthetic")
    vm = trainer.refit_head(train_ds, val_ds)
    assert vm is not None
    out = capsys.readouterr().out
    assert "head_refit: C*=" in out, out

    steps = sorted(trainer.ckpt._mgr.all_steps())
    # refit landed PAST the latest step, not at best+1=11
    assert 21 in steps, steps
    assert 11 not in steps, steps
    # and it wins the ranking: probe val acc >= chance >> 0.002
    assert trainer.ckpt.best_step == 21
    # head is the probe, trunk untouched
    src = trainer.ckpt.restore_params(step=10)
    new = trainer.ckpt.restore_params(step=21)
    assert not np.allclose(
        np.asarray(src["posterior_classifier"]["kernel"]),
        np.asarray(new["posterior_classifier"]["kernel"]))
    assert np.allclose(
        np.asarray(src["part_encoder"]["img_embedding_bias"]),
        np.asarray(new["part_encoder"]["img_embedding_bias"]))


def test_pool_inprocess_matches_solo_run(tmp_path):
    """tools/pool_inprocess.py: a member trained inside the one-process
    pool runner (jit caches shared with preceding members) is
    state-identical to the same recipe trained alone — the determinism
    claim that justified amortizing the tunnel's remote compile across
    the round-5 pool rebuild."""
    import sys as _sys

    import numpy as np

    _sys.path.insert(0, "tools")
    import pool_inprocess as pi

    from scae_tpu.config import load_config
    from scae_tpu.train.checkpoint import CheckpointManager
    from scae_tpu.train.loop import Trainer

    base = [
        "data_loader.batch_size=16",
        "data_loader.source=synthetic",
        "data_loader.synthetic_train=64",
        "data_loader.val_size=32",
        "data_loader.synthetic_test=16",
        "trainer.log_every_steps=2",
        "trainer.max_eval_batches=1",
        "trainer.augment.canvas=24",
        "trainer.augment.max_shift=2",
        *_TINY_MODEL,
    ]
    # solo: one Trainer, one process-equivalent
    solo_ckpt = f"{tmp_path}/solo"
    cfg = load_config("config", overrides=base + [
        "seed=7", "trainer.max_epochs=2",
        f"trainer.log_dir={tmp_path}/solo_logs",
        f"trainer.checkpoint_dir={solo_ckpt}",
    ])
    t = Trainer(cfg)
    t.run(max_epochs=2)
    t.ckpt.wait()
    t.ckpt.close()

    # pooled: a different-seed member trains FIRST (warms/perturbs every
    # cache the runner shares), then the same recipe as solo
    pi.train_members(
        members=[("m0", 2, ["seed=3"]), ("m1", 2, ["seed=7"])],
        log_root=f"{tmp_path}/pool_logs", ckpt_root=f"{tmp_path}/pool",
        base_overrides=base)

    def final_params(ckpt_dir):
        mgr = CheckpointManager(ckpt_dir, monitor="val_loss", mode="min")
        step = mgr.latest_step
        p = mgr.restore_params(step=step)
        mgr.close()
        return step, p

    s_step, s_params = final_params(solo_ckpt)
    m_step, m_params = final_params(f"{tmp_path}/pool/m1")
    assert s_step == m_step
    flat_s = {"/".join(map(str, k)): v for k, v in
              _flatten(s_params).items()}
    flat_m = {"/".join(map(str, k)): v for k, v in
              _flatten(m_params).items()}
    assert flat_s.keys() == flat_m.keys()
    for k in flat_s:
        np.testing.assert_array_equal(np.asarray(flat_s[k]),
                                      np.asarray(flat_m[k]), err_msg=k)
    # and the different-seed member actually differs (no cross-member
    # state bleed in the other direction either)
    _, p0 = final_params(f"{tmp_path}/pool/m0")
    flat_0 = {"/".join(map(str, k)): v for k, v in _flatten(p0).items()}
    assert any(
        not np.array_equal(np.asarray(flat_0[k]), np.asarray(flat_s[k]))
        for k in flat_s)


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out
