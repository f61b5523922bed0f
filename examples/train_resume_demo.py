"""Train + resume demo — the script twin of the reference's Colab
notebook (`torch_scae_experiments/mnist/train.ipynb`: train a few
epochs, interrupt, resume from the checkpoint).

Runs the real Trainer twice on a small config:
  1. train for a few epochs, checkpointing as it goes,
  2. "interrupt", then resume from the latest checkpoint and finish —
     consuming exactly the data order an uninterrupted run would
     (deterministic resume; see tests/test_resume.py for the assertion
     version of this property).

Works on CPU (minutes) or TPU (seconds after compile):

    python examples/train_resume_demo.py [workdir]

Artifacts land in <workdir>/ (default /tmp/scae_demo): metrics.jsonl,
reconstruction/template grids, and Orbax checkpoints.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

WORKDIR = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                       else "/tmp/scae_demo")

# a small-but-real model so the demo runs anywhere in minutes
OVERRIDES = [
    "data_loader.batch_size=32",
    "data_loader.synthetic_train=512",
    "data_loader.synthetic_test=64",
    "data_loader.val_size=128",
    "trainer.log_every_steps=5",
    "trainer.max_eval_batches=2",
    "trainer.augment.canvas=28",
    "trainer.augment.max_shift=2",
    "model.image_shape=[1,28,28]",
    "model.n_part_caps=16",
    "model.n_obj_caps=8",
    "model.pcae_cnn_encoder_params.out_channels=[32,32,32,32]",
    "model.pcae_template_generator_params.template_size=[8,8]",
    "model.ocae_encoder_set_transformer_params.dim_hidden=16",
    "model.ocae_encoder_set_transformer_params.dim_out=32",
    "model.ocae_decoder_capsule_params.dim_caps=16",
    "model.ocae_decoder_capsule_params.hidden_sizes=[32]",
    f"trainer.checkpoint_dir={WORKDIR}/ckpt",
    f"trainer.log_dir={WORKDIR}/logs",
]


def make_trainer():
    from scae_tpu.config import load_config
    from scae_tpu.train.loop import Trainer

    return Trainer(load_config("config", overrides=OVERRIDES))


def main():
    # phase 1: train 2 epochs from scratch
    print(f"[demo] phase 1: training 2 epochs -> {WORKDIR}")
    state = make_trainer().run(max_epochs=2)
    print(f"[demo] interrupted at step {int(state.step)}; "
          f"checkpoints: {sorted(p.name for p in (WORKDIR / 'ckpt').iterdir())}")

    # phase 2: a fresh process would do exactly this — resume and finish
    print("[demo] phase 2: resume=True, continuing to epoch 4")
    state = make_trainer().run(max_epochs=4, resume=True)
    print(f"[demo] done at step {int(state.step)}. Metrics: "
          f"{WORKDIR}/logs/metrics.jsonl; grids: {WORKDIR}/logs/images/")


if __name__ == "__main__":
    main()
