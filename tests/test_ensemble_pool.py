"""tools/ensemble_pool.py + tools/probe_eval.py: cross-architecture
pooling over one shared split (the round-4 pooled-ensemble / probe
protocols, RESULTS.md)."""

import importlib.util
import json
import os

import pytest

pytestmark = pytest.mark.slow

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_TOOLS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_model(size):
    return [
        f"model.image_shape=[1,{size},{size}]",
        "model.n_part_caps=8",
        "model.n_obj_caps=4",
        "model.pcae_cnn_encoder_params.out_channels=[16,16,16,16]",
        "model.pcae_template_generator_params.template_size=[6,6]",
        "model.ocae_encoder_set_transformer_params.dim_hidden=8",
        "model.ocae_encoder_set_transformer_params.dim_out=16",
        "model.ocae_decoder_capsule_params.dim_caps=8",
        "model.ocae_decoder_capsule_params.hidden_sizes=[16]",
    ]


@pytest.fixture(scope="module")
def two_group_runs(tmp_path_factory):
    """Two tiny runs with DIFFERENT architectures (24px / 28px) on the
    same split_seed — the heterogeneous-pool precondition."""
    from scae_tpu.config import load_config
    from scae_tpu.train.loop import Trainer
    import scae_tpu.train.data as data_lib

    tmp_path = tmp_path_factory.mktemp("pool")
    orig = data_lib.load_datasets

    def tiny_datasets(**kw):
        kw.update(val_size=32, synthetic_train=64, synthetic_test=32)
        return orig(**kw)

    data_lib.load_datasets = tiny_datasets
    try:
        for sub, size, seed in (("a", 24, 1), ("b", 28, 2)):
            overrides = [
                "data_loader.batch_size=16",
                "data_loader.split_seed=7",
                f"seed={seed}",
                "trainer.max_epochs=1",
                "trainer.log_every_steps=2",
                f"trainer.checkpoint_dir={tmp_path}/{sub}/ckpt",
                f"trainer.log_dir={tmp_path}/{sub}/logs",
                "trainer.max_eval_batches=1",
                f"trainer.augment.canvas={size}",
                "trainer.augment.max_shift=2",
                *_tiny_model(size),
            ]
            t = Trainer(load_config("config", overrides=overrides))
            t.run(max_epochs=1, max_steps=2)
            t.ckpt.wait()

        spec = {"split_seed": 7, "groups": [
            {"name": g,
             "overrides": ["data_loader.split_seed=7",
                           "data_loader.batch_size=16",
                           *_tiny_model(size)],
             "members": [{"run": f"{tmp_path}/{g}/ckpt",
                          "log": f"{tmp_path}/{g}/logs"}]}
            for g, size in (("a", 24), ("b", 28))]}
        spec_path = tmp_path / "spec.json"
        spec_path.write_text(json.dumps(spec))
        yield str(spec_path), str(tmp_path)
    finally:
        data_lib.load_datasets = orig


def test_ensemble_pool_heterogeneous(two_group_runs):
    spec_path, _ = two_group_runs
    res = _load("ensemble_pool").main([spec_path, "--batch-size", "16"])
    assert res["n_members"] == 2
    assert res["n_test"] == 32
    for key in ("pooled_posterior", "pooled_valw_posterior",
                "pooled_tophalf_posterior", "group_a_posterior",
                "group_b_posterior"):
        assert 0.0 <= res[key] <= 1.0, key


def test_ensemble_pool_rejects_wrong_split(two_group_runs, tmp_path):
    spec_path, base = two_group_runs
    spec = json.loads(open(spec_path).read())
    spec["split_seed"] = 8          # runs trained with 7
    for g in spec["groups"]:
        g["overrides"] = [o.replace("split_seed=7", "split_seed=8")
                          for o in g["overrides"]]
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps(spec))
    with pytest.raises(ValueError, match="split_seed"):
        _load("ensemble_pool").main([str(bad), "--batch-size", "16"])


def test_probe_eval_end_to_end(two_group_runs):
    spec_path, _ = two_group_runs
    res = _load("probe_eval").main(
        [spec_path, "--batch-size", "16", "--c-grid", "1.0"])
    assert res["n_members"] == 2
    assert res["c_star"] == 1.0
    assert 0.0 <= res["pooled_test"] <= 1.0
    assert len(res["member_test_accs"]) == 2


def test_probe_calibrate_bakes_head(two_group_runs):
    """probe_calibrate writes a checkpoint whose posterior head IS the
    probe: standard restore paths must see the new weights and the
    in-model readout must match the sklearn probe on val."""
    spec_path, base = two_group_runs
    spec = json.loads(open(spec_path).read())
    g = spec["groups"][0]
    out = os.path.join(base, "a_calibrated")
    res = _load("probe_calibrate").main(
        [g["members"][0]["run"], "--out", out, "--batch-size", "16",
         "--c-grid", "1.0", "--", *g["overrides"]])
    assert res["c_star"] == 1.0
    assert 0.0 <= res["val_after"] <= 1.0
    # in-model readout == probe readout (same linear head, f32 features)
    assert abs(res["val_after"] - res["val_probe"]) <= 0.05
    # the calibrated dir restores through the standard manager and the
    # head really changed
    from scae_tpu.train.checkpoint import CheckpointManager
    import numpy as np
    new = CheckpointManager(out).restore_params(step=res["step"])
    old = CheckpointManager(
        g["members"][0]["run"]).restore_params(step=res["step"])
    assert not np.allclose(new["posterior_classifier"]["kernel"],
                           old["posterior_classifier"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(new["part_encoder"]["img_embedding_bias"]),
        np.asarray(old["part_encoder"]["img_embedding_bias"]))


def test_probe_eval_skip_test_selects_only(two_group_runs):
    spec_path, _ = two_group_runs
    res = _load("probe_eval").main(
        [spec_path, "--batch-size", "16", "--c-grid", "0.1", "1.0",
         "--skip-test"])
    assert "pooled_test" not in res
    assert res["c_star"] in (0.1, 1.0)
