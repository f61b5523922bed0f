"""tools/ensemble_eval.py: same-split verification + ensemble accuracy."""

import importlib.util
import json
import os

import pytest

pytestmark = pytest.mark.slow

_TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "ensemble_eval.py")


def _load_tool():
    spec = importlib.util.spec_from_file_location("ensemble_eval", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


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


def test_ensemble_eval_end_to_end(tmp_path):
    from scae_tpu.config import load_config
    from scae_tpu.train.loop import Trainer
    import scae_tpu.train.data as data_lib

    def overrides(sub, seed):
        return [
            "data_loader.batch_size=16",
            "data_loader.split_seed=7",
            f"seed={seed}",
            "trainer.max_epochs=1",
            "trainer.log_every_steps=2",
            f"trainer.checkpoint_dir={tmp_path}/{sub}/ckpt",
            f"trainer.log_dir={tmp_path}/{sub}/logs",
            "trainer.max_eval_batches=1",
            "trainer.augment.canvas=24",
            "trainer.augment.max_shift=2",
            *_TINY_MODEL,
        ]

    orig = data_lib.load_datasets

    def tiny_datasets(**kw):
        kw.update(val_size=32, synthetic_train=64, synthetic_test=32)
        return orig(**kw)

    data_lib.load_datasets = tiny_datasets
    try:
        for sub, seed in (("a", 1), ("b", 2)):
            t = Trainer(load_config("config", overrides=overrides(sub, seed)))
            t.run(max_epochs=1, max_steps=2)
            t.ckpt.wait()
            with open(f"{tmp_path}/{sub}/ckpt/train_seed.json") as f:
                assert json.load(f)["split_seed"] == 7

        tool = _load_tool()
        res = tool.main([f"{tmp_path}/a/ckpt", f"{tmp_path}/b/ckpt",
                         "--batch-size", "16", "--",
                         "data_loader.split_seed=7",
                         "data_loader.batch_size=16", *_TINY_MODEL])
        assert res["n_models"] == 2
        assert res["n_test"] == 32
        assert 0.0 <= res["ensemble_acc"] <= 1.0

        # split mismatch is rejected loudly
        with pytest.raises(ValueError, match="split_seed"):
            tool.main([f"{tmp_path}/a/ckpt", "--",
                       "data_loader.split_seed=8", *_TINY_MODEL])
        # and refusing to run without a split_seed at all
        with pytest.raises(SystemExit, match="split_seed"):
            tool.main([f"{tmp_path}/a/ckpt", "--", *_TINY_MODEL])
    finally:
        data_lib.load_datasets = orig
