#!/bin/bash
# Round-5 pool rebuild + the calibration consistency check, finished
# (VERDICT r4 ask #3). `checkpoints/` is gitignored, so the round-4
# 14-member pool did not survive the round boundary; the committed
# drivers did. This script:
#
#   1. retrains the full 14-member pool from the SAME recipes/seeds
#      (8 flagship f500..f612, 6 mnist28 s200..s280 — exactly
#      tools/ensemble_runs_flagship.sh + tools/ensemble_runs.sh), which
#      doubles as a from-scratch reproducibility test of the round-4
#      probe headline (pooled K=14 test 0.9899, RESULTS.md);
#   2. probe-evaluates the fresh pool (tools/probe_eval.py) — the
#      fresh pooled number Y;
#   3. calibrates every member (tools/probe_calibrate.py: bake each
#      member's probe into its posterior head);
#   4. re-evaluates K=14 through the STANDARD ensemble path
#      (tools/ensemble_pool.py) — which must reproduce Y through the
#      shipped, zero-new-code readout path. That identity is the
#      consistency claim in tools/calibrate_pool.sh's header, tested.
set -u
cd "$(dirname "$0")/.."

FLAG="model=mnist data_loader.source=digits data_loader.split_seed=7 \
  trainer.monitor=val_accuracy trainer.monitor_mode=max \
  trainer.eval_every_epochs=50 lr_scheduler.decay_rate=0.99994"

train_member () {
  local name="$1" epochs="$2"; shift 2
  if [ -f "logs/r5_pool/$name/DONE" ]; then
    echo "== $name already done, skipping"; return
  fi
  mkdir -p "logs/r5_pool/$name"
  echo "== train $name $(date +%H:%M:%S)"
  python -m scae_tpu.train.cli $FLAG "trainer.max_epochs=$epochs" "$@" \
    "trainer.seed_probe.n=16" \
    "trainer.log_dir=logs/r5_pool/$name" \
    "trainer.checkpoint_dir=checkpoints/r5_pool/$name" \
    > "logs/r5_pool/$name/stdout.log" 2>&1 \
    && touch "logs/r5_pool/$name/DONE"
  echo "== train $name exit=$? $(date +%H:%M:%S)"
}

# flagship recipe: 40x40 pad+translate, 4000 epochs (ensemble_runs_flagship.sh)
for SEED in 500 516 532 548 564 580 596 612; do
  train_member "f$SEED" 4000 "seed=$SEED"
done
# mnist28 recipe: native 28x28, no shift, 2000 epochs (ensemble_runs.sh)
for SEED in 200 216 232 248 264 280; do
  train_member "s$SEED" 2000 "seed=$SEED" "model=mnist28" \
    "trainer.augment.max_shift=0"
done

mkdir -p logs/r5_pool logs/r5_calibrated
echo "== probe eval over the fresh K=14 pool"
python tools/probe_eval.py tools/pool_spec_r5.json \
  2>&1 | tee logs/r5_pool/probe_eval.log

for SEED in 500 516 532 548 564 580 596 612; do
  out="checkpoints/r5_calibrated/f$SEED"
  [ -d "$out" ] && { echo "== f$SEED already calibrated"; continue; }
  echo "== calibrate f$SEED"
  python tools/probe_calibrate.py "checkpoints/r5_pool/f$SEED" \
    --out "$out" -- \
    data_loader.source=digits data_loader.split_seed=7 \
    trainer.monitor=val_accuracy trainer.monitor_mode=max \
    2>&1 | tail -2 | tee -a logs/r5_calibrated/calibrate.log
done
for SEED in 200 216 232 248 264 280; do
  out="checkpoints/r5_calibrated/s$SEED"
  [ -d "$out" ] && { echo "== s$SEED already calibrated"; continue; }
  echo "== calibrate s$SEED"
  python tools/probe_calibrate.py "checkpoints/r5_pool/s$SEED" \
    --out "$out" -- model=mnist28 \
    data_loader.source=digits data_loader.split_seed=7 \
    trainer.monitor=val_accuracy trainer.monitor_mode=max \
    2>&1 | tail -2 | tee -a logs/r5_calibrated/calibrate.log
done

echo "== standard-path ensemble over calibrated checkpoints (K=14 pooled)"
python tools/ensemble_pool.py tools/pool_spec_r5_calibrated.json \
  2>&1 | tee logs/r5_calibrated/pool_eval.log
echo "== POOL ALL DONE $(date +%H:%M:%S)"
