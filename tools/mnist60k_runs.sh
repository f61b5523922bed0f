#!/bin/bash
# Round-5 production-scale quality runs (preregistered, RESULTS.md
# "the reference's ACTUAL scale and schedule"): the reference's own
# flagship operating point — 60k/10k images, 55k/5k split, 429-step
# epochs, 600 epochs, RMSprop lr 3e-5 decay 0.997/epoch
# (/root/reference/torch_scae_experiments/configs/config.yaml:23-24,
# torch_scae_experiments/mnist/experiment.py:42-50).
#
# Run A = the reference operating point (seed 42, no probe).
# Run B = the framework's recipe at scale (+ 8-seed probe, pool 4200).
# Data: data/mnist60k (regenerate with tools/synth_mnist60k.py +
# tools/prepare_data.py if absent — byte-deterministic at --seed 0).
set -u
cd "$(dirname "$0")/.."
export SCAE_TPU_DATA_DIR=data/mnist60k

if [ ! -f data/mnist60k/train.npz ]; then
  echo "== regenerating data/mnist60k"
  python tools/synth_mnist60k.py --dst /tmp/mnist_raw
  python tools/prepare_data.py --src /tmp/mnist_raw --dst data/mnist60k
fi

RECIPE="data_loader.split_seed=11 \
  trainer.monitor=val_accuracy trainer.monitor_mode=max \
  trainer.max_epochs=600 trainer.eval_every_epochs=5"

run () {
  local name="$1"; shift
  if [ -f "logs/r5_mnist60k/$name/DONE" ]; then
    echo "== $name already done, skipping"; return
  fi
  mkdir -p "logs/r5_mnist60k/$name"
  echo "== train $name $(date +%H:%M:%S)"
  python -m scae_tpu.train.cli $RECIPE "$@" \
    "trainer.log_dir=logs/r5_mnist60k/$name" \
    "trainer.checkpoint_dir=checkpoints/r5_mnist60k/$name" \
    > "logs/r5_mnist60k/$name/stdout.log" 2>&1 \
    && touch "logs/r5_mnist60k/$name/DONE"
  echo "== train $name exit=$? $(date +%H:%M:%S)"
  echo "== test $name"
  python -m scae_tpu.train.cli mode=test $RECIPE "$@" \
    "trainer.log_dir=logs/r5_mnist60k/$name" \
    "trainer.checkpoint_dir=checkpoints/r5_mnist60k/$name" \
    >> "logs/r5_mnist60k/$name/stdout.log" 2>&1
  echo "== test $name exit=$? $(date +%H:%M:%S)"
}

# probe length renormalized to epoch size exactly like the lr decay:
# the 200-epoch default was tuned for 9-step optdigits epochs (~1800
# steps); 4 epochs at 429 steps/epoch is the same step budget
run a_reference "seed=42"
run b_framework "seed=4200" "trainer.seed_probe.n=8" \
  "trainer.seed_probe.epochs=4"

echo "== probe eval (both runs)"
python tools/probe_eval.py tools/pool_spec_r5_60k.json \
  2>&1 | tee logs/r5_mnist60k/probe_eval.log
echo "== MNIST60K ALL DONE $(date +%H:%M:%S)"
