#!/bin/bash
# Calibrate every round-4 pool member: bake its post-hoc probe into the
# posterior head (tools/probe_calibrate.py), then evaluate the calibrated
# checkpoints through the STANDARD ensemble paths. Consistency check, not
# a new measurement: the calibrated heads compute exactly the probe
# logits, so ensemble_pool over them must reproduce probe_eval's pooled
# number (RESULTS.md "post-hoc probe evaluation — OUTCOME", 0.9899)
# through the shipped, zero-new-code readout path.
set -u
cd "$(dirname "$0")/.."

FLAG="data_loader.source=digits data_loader.split_seed=7 \
  trainer.monitor=val_accuracy trainer.monitor_mode=max"

for SEED in 500 516 532 548 564 580 596 612; do
  src="checkpoints/r4_ensemble_flagship/f$SEED"
  out="checkpoints/r4_calibrated/f$SEED"
  [ -d "$out" ] && { echo "== f$SEED already calibrated"; continue; }
  echo "== calibrate f$SEED"
  python tools/probe_calibrate.py "$src" --out "$out" -- $FLAG \
    2>&1 | tail -2
done
for SEED in 200 216 232 248 264 280; do
  src="checkpoints/r4_ensemble/s$SEED"
  out="checkpoints/r4_calibrated/s$SEED"
  [ -d "$out" ] && { echo "== s$SEED already calibrated"; continue; }
  echo "== calibrate s$SEED"
  python tools/probe_calibrate.py "$src" --out "$out" -- model=mnist28 $FLAG \
    2>&1 | tail -2
done

mkdir -p logs/r4_calibrated
echo "== standard-path ensemble over calibrated checkpoints (K=14 pooled)"
python tools/ensemble_pool.py tools/pool_spec_r4_calibrated.json \
  2>&1 | tee logs/r4_calibrated/pool_eval.log
echo "== CALIBRATE ALL DONE"
