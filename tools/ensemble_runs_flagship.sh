#!/bin/bash
# Round-4 flagship ensemble: the mnist28 composed-recipe ensemble
# (RESULTS.md "final composed recipe + K=6 ensemble") measured +3.0
# over its best member — this run asks whether the same construction
# at the FLAGSHIP recipe (40x40 pad+translate, the recipe whose single
# best lottery tail is test 0.848) beats that tail reproducibly.
#
# Recipe = the probe32 headline recipe (RESULTS.md "32-seed probe")
# with K=16 probe (the recorded sufficient probe size), on a SHARED
# split (data_loader.split_seed=7) so tools/ensemble_eval.py is sound.
# 6 disjoint probe pools: seeds 500,516,...,580 (all untried).
# 4000 epochs (the flagship horizon that held its peak), eval every 50,
# decay 0.99994, val_accuracy max monitor, top-3 checkpoints.
set -u
cd "$(dirname "$0")/.."

RECIPE="data_loader.source=digits data_loader.split_seed=7 \
  trainer.monitor=val_accuracy trainer.monitor_mode=max \
  trainer.max_epochs=4000 trainer.eval_every_epochs=50 \
  lr_scheduler.decay_rate=0.99994"

# 596/612 are the preregistered K=8 extension (RESULTS.md); the DONE
# guard makes the script resumable/idempotent over the full pool.
for SEED in 500 516 532 548 564 580 596 612; do
  name="f$SEED"
  if [ -f "logs/r4_ensemble_flagship/$name/DONE" ]; then
    echo "== $name already done, skipping"; continue
  fi
  mkdir -p "logs/r4_ensemble_flagship/$name"
  echo "== train $name $(date +%H:%M:%S)"
  python -m scae_tpu.train.cli $RECIPE \
    "seed=$SEED" "trainer.seed_probe.n=16" \
    "trainer.log_dir=logs/r4_ensemble_flagship/$name" \
    "trainer.checkpoint_dir=checkpoints/r4_ensemble_flagship/$name" \
    > "logs/r4_ensemble_flagship/$name/stdout.log" 2>&1 \
    && touch "logs/r4_ensemble_flagship/$name/DONE"
  echo "== train $name exit=$? $(date +%H:%M:%S)"
  echo "== test $name"
  python -m scae_tpu.train.cli mode=test $RECIPE \
    "seed=$SEED" \
    "trainer.log_dir=logs/r4_ensemble_flagship/$name" \
    "trainer.checkpoint_dir=checkpoints/r4_ensemble_flagship/$name" \
    >> "logs/r4_ensemble_flagship/$name/stdout.log" 2>&1
  echo "== test $name exit=$?"
done

ALL="checkpoints/r4_ensemble_flagship/f500 checkpoints/r4_ensemble_flagship/f516 \
  checkpoints/r4_ensemble_flagship/f532 checkpoints/r4_ensemble_flagship/f548 \
  checkpoints/r4_ensemble_flagship/f564 checkpoints/r4_ensemble_flagship/f580 \
  checkpoints/r4_ensemble_flagship/f596 checkpoints/r4_ensemble_flagship/f612"
EVAL_TAIL="-- data_loader.source=digits data_loader.split_seed=7 \
  trainer.monitor=val_accuracy trainer.monitor_mode=max"

echo "== ensemble eval K=7 (run order, no member selection)"
python tools/ensemble_eval.py $(echo $ALL | tr ' ' '\n' | head -7) \
  $EVAL_TAIL 2>&1 | tee logs/r4_ensemble_flagship/ensemble_eval_k7.log
echo "== ensemble eval K=8"
python tools/ensemble_eval.py $ALL \
  $EVAL_TAIL 2>&1 | tee logs/r4_ensemble_flagship/ensemble_eval_k8.log
