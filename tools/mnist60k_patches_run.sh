#!/bin/bash
# Round-5 production-scale counterfactual (preregistered, RESULTS.md
# "60k patch-init counterfactual"): Run C = the 60k Run A recipe
# bit-for-bit (seed 42, reference schedule, same data) with EXACTLY one
# change — trainer.template_init=patches. The 60k OUTCOME diagnosed
# Run A's probe miss as template collisions (classes 5/7/8 recalls
# 0.36-0.49); the round-3 small-regime finding says the escape
# bimodality lives in the template parameters and data-crop init
# rescues it. This asks whether that transfers to production scale.
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

name=c_patches
if [ -f "logs/r5_mnist60k/$name/DONE" ]; then
  echo "== $name already done, skipping"
else
  mkdir -p "logs/r5_mnist60k/$name"
  echo "== train $name $(date +%H:%M:%S)"
  python -m scae_tpu.train.cli $RECIPE "seed=42" \
    "trainer.template_init=patches" \
    "trainer.log_dir=logs/r5_mnist60k/$name" \
    "trainer.checkpoint_dir=checkpoints/r5_mnist60k/$name" \
    > "logs/r5_mnist60k/$name/stdout.log" 2>&1 \
    && touch "logs/r5_mnist60k/$name/DONE"
  echo "== train $name exit=$? $(date +%H:%M:%S)"
  echo "== test $name"
  python -m scae_tpu.train.cli mode=test $RECIPE "seed=42" \
    "trainer.template_init=patches" \
    "trainer.log_dir=logs/r5_mnist60k/$name" \
    "trainer.checkpoint_dir=checkpoints/r5_mnist60k/$name" \
    >> "logs/r5_mnist60k/$name/stdout.log" 2>&1
  echo "== test $name exit=$? $(date +%H:%M:%S)"
fi

echo "== probe eval (run C)"
python tools/probe_eval.py tools/pool_spec_r5_60k_patches.json \
  2>&1 | tee logs/r5_mnist60k/probe_eval_c.log
echo "== MNIST60K-PATCHES ALL DONE $(date +%H:%M:%S)"
