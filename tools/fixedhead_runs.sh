#!/bin/bash
# Round-4 fixed-head retrain (preregistered, RESULTS.md): the flagship
# ensemble recipe with the default (fixed) classification loss —
# cross-entropy on head logits instead of the reference's double
# softmax (scae.py compat_double_softmax_xe, default off). Seeds match
# compat-era members f500-f548 so the probe pools are identical; the
# trunk is head-independent (stop-grad features), so this isolates the
# jointly-trained head's ability to track drifting features at lr 3e-5.
set -u
cd "$(dirname "$0")/.."

RECIPE="data_loader.source=digits data_loader.split_seed=7 \
  trainer.monitor=val_accuracy trainer.monitor_mode=max \
  trainer.max_epochs=4000 trainer.eval_every_epochs=50 \
  lr_scheduler.decay_rate=0.99994"

for SEED in 500 516 532 548; do
  name="h$SEED"
  if [ -f "logs/r4_fixedhead/$name/DONE" ]; then
    echo "== $name already done, skipping"; continue
  fi
  mkdir -p "logs/r4_fixedhead/$name"
  echo "== train $name $(date +%H:%M:%S)"
  python -m scae_tpu.train.cli $RECIPE \
    "seed=$SEED" "trainer.seed_probe.n=16" \
    "trainer.log_dir=logs/r4_fixedhead/$name" \
    "trainer.checkpoint_dir=checkpoints/r4_fixedhead/$name" \
    > "logs/r4_fixedhead/$name/stdout.log" 2>&1 \
    && touch "logs/r4_fixedhead/$name/DONE"
  echo "== train $name exit=$? $(date +%H:%M:%S)"
  echo "== test $name"
  python -m scae_tpu.train.cli mode=test $RECIPE \
    "seed=$SEED" \
    "trainer.log_dir=logs/r4_fixedhead/$name" \
    "trainer.checkpoint_dir=checkpoints/r4_fixedhead/$name" \
    >> "logs/r4_fixedhead/$name/stdout.log" 2>&1
  echo "== test $name exit=$?"
done

ALL="checkpoints/r4_fixedhead/h500 checkpoints/r4_fixedhead/h516 \
  checkpoints/r4_fixedhead/h532 checkpoints/r4_fixedhead/h548"
EVAL_TAIL="-- data_loader.source=digits data_loader.split_seed=7 \
  trainer.monitor=val_accuracy trainer.monitor_mode=max"

echo "== head-readout ensemble eval (K=4, run order)"
python tools/ensemble_eval.py $ALL \
  $EVAL_TAIL 2>&1 | tee logs/r4_fixedhead/ensemble_eval.log
echo "== probe-readout eval (K=4, preregistered protocol)"
python tools/probe_eval.py tools/pool_spec_r4_fixedhead.json \
  2>&1 | tee logs/r4_fixedhead/probe_eval.log
echo "== ALL DONE $(date +%H:%M:%S)"
