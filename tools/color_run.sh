#!/bin/bash
# Round-4 color-pipeline quality run (preregistered, RESULTS.md):
# svhn config on real digit shapes with per-example (label-independent)
# tints — the first honest 3-channel quality measurement.
set -u
cd "$(dirname "$0")/.."

RECIPE="model=svhn data_loader.source=digits data_loader.tint=example \
  data_loader.split_seed=7 trainer.augment.max_shift=0 \
  trainer.monitor=val_accuracy trainer.monitor_mode=max \
  trainer.max_epochs=2000 trainer.eval_every_epochs=50 \
  lr_scheduler.decay_rate=0.99994"

for SEED in 700 716; do
  name="c$SEED"
  if [ -f "logs/r4_color/$name/DONE" ]; then
    echo "== $name already done, skipping"; continue
  fi
  mkdir -p "logs/r4_color/$name"
  echo "== train $name $(date +%H:%M:%S)"
  python -m scae_tpu.train.cli $RECIPE \
    "seed=$SEED" "trainer.seed_probe.n=16" \
    "trainer.log_dir=logs/r4_color/$name" \
    "trainer.checkpoint_dir=checkpoints/r4_color/$name" \
    > "logs/r4_color/$name/stdout.log" 2>&1 \
    && touch "logs/r4_color/$name/DONE"
  echo "== train $name exit=$? $(date +%H:%M:%S)"
  echo "== test $name"
  python -m scae_tpu.train.cli mode=test $RECIPE \
    "seed=$SEED" \
    "trainer.log_dir=logs/r4_color/$name" \
    "trainer.checkpoint_dir=checkpoints/r4_color/$name" \
    >> "logs/r4_color/$name/stdout.log" 2>&1
  echo "== test $name exit=$?"
done

echo "== probe eval (both members)"
python tools/probe_eval.py tools/pool_spec_r4_color.json \
  2>&1 | tee logs/r4_color/probe_eval.log
echo "== COLOR ALL DONE $(date +%H:%M:%S)"
