#!/bin/bash
# Round-4 ensemble measurement (VERDICT.md ask #2): K=6 independent
# runs of the best-known recipe — mnist28 native resolution + 16-seed
# probe + val_accuracy monitor (RESULTS.md "resolution-matched digits")
# — on a SHARED data split (data_loader.split_seed=7) so the runs can
# be soundly ensembled by tools/ensemble_eval.py.
#
# Each run: disjoint probe pool (seed, seed+15), 2000 epochs, top-3
# accuracy-monitored checkpoints kept under checkpoints/r4_ensemble/
# (gitignored; 31 MB each), logs under logs/r4_ensemble/s<seed>.
# After each run: mode=test at the retained peak checkpoint (the
# single-run numbers the ensemble is compared against).
set -u
cd "$(dirname "$0")/.."

RECIPE="model=mnist28 data_loader.source=digits data_loader.split_seed=7 \
  trainer.augment.max_shift=0 \
  trainer.monitor=val_accuracy trainer.monitor_mode=max \
  trainer.max_epochs=2000 trainer.eval_every_epochs=50 \
  lr_scheduler.decay_rate=0.99994"

for SEED in 200 216 232 248 264 280; do
  name="s$SEED"
  if [ -f "logs/r4_ensemble/$name/DONE" ]; then
    echo "== $name already done, skipping"; continue
  fi
  mkdir -p "logs/r4_ensemble/$name"
  echo "== train $name"
  python -m scae_tpu.train.cli $RECIPE \
    "seed=$SEED" "trainer.seed_probe.n=16" \
    "trainer.log_dir=logs/r4_ensemble/$name" \
    "trainer.checkpoint_dir=checkpoints/r4_ensemble/$name" \
    > "logs/r4_ensemble/$name/stdout.log" 2>&1 \
    && touch "logs/r4_ensemble/$name/DONE"
  echo "== train $name exit=$?"
  echo "== test $name"
  python -m scae_tpu.train.cli mode=test $RECIPE \
    "seed=$SEED" \
    "trainer.log_dir=logs/r4_ensemble/$name" \
    "trainer.checkpoint_dir=checkpoints/r4_ensemble/$name" \
    >> "logs/r4_ensemble/$name/stdout.log" 2>&1
  echo "== test $name exit=$?"
done

echo "== ensemble eval (all runs)"
python tools/ensemble_eval.py \
  checkpoints/r4_ensemble/s200 checkpoints/r4_ensemble/s216 \
  checkpoints/r4_ensemble/s232 checkpoints/r4_ensemble/s248 \
  checkpoints/r4_ensemble/s264 checkpoints/r4_ensemble/s280 \
  -- model=mnist28 data_loader.source=digits data_loader.split_seed=7 \
  trainer.monitor=val_accuracy trainer.monitor_mode=max \
  2>&1 | tee logs/r4_ensemble/ensemble_eval.log
