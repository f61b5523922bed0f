#!/bin/bash
# Round-5 head-refit pool (preregistered, RESULTS.md): the flagship
# ensemble recipe with `trainer.head_refit=true` — the end-of-run
# posterior-head refit on the frozen trunk (loop.py::refit_head, the
# SCAE paper's probe made a trainer phase). Seeds match the round-4
# fixed-head pool h500-h548, whose jointly-trained heads missed their
# own probe ceilings by ~8 points (RESULTS.md "fixed-head retrain —
# OUTCOME"). This asks: does the shipped trainer now close that gap
# in-loop, out of the box?
set -u
cd "$(dirname "$0")/.."

RECIPE="data_loader.source=digits data_loader.split_seed=7 \
  trainer.monitor=val_accuracy trainer.monitor_mode=max \
  trainer.max_epochs=4000 trainer.eval_every_epochs=50 \
  lr_scheduler.decay_rate=0.99994 trainer.head_refit=true"

for SEED in 500 516 532 548; do
  name="r$SEED"
  if [ -f "logs/r5_headrefit/$name/DONE" ]; then
    echo "== $name already done, skipping"; continue
  fi
  mkdir -p "logs/r5_headrefit/$name"
  echo "== train $name $(date +%H:%M:%S)"
  python -m scae_tpu.train.cli $RECIPE \
    "seed=$SEED" "trainer.seed_probe.n=16" \
    "trainer.log_dir=logs/r5_headrefit/$name" \
    "trainer.checkpoint_dir=checkpoints/r5_headrefit/$name" \
    > "logs/r5_headrefit/$name/stdout.log" 2>&1 \
    && touch "logs/r5_headrefit/$name/DONE"
  echo "== train $name exit=$? $(date +%H:%M:%S)"
  echo "== test $name"
  python -m scae_tpu.train.cli mode=test $RECIPE \
    "seed=$SEED" \
    "trainer.log_dir=logs/r5_headrefit/$name" \
    "trainer.checkpoint_dir=checkpoints/r5_headrefit/$name" \
    >> "logs/r5_headrefit/$name/stdout.log" 2>&1
  echo "== test $name exit=$? $(date +%H:%M:%S)"
done

ALL="checkpoints/r5_headrefit/r500 checkpoints/r5_headrefit/r516 \
  checkpoints/r5_headrefit/r532 checkpoints/r5_headrefit/r548"
EVAL_TAIL="-- data_loader.source=digits data_loader.split_seed=7 \
  trainer.monitor=val_accuracy trainer.monitor_mode=max"

echo "== K=4 head ensemble over the refit heads"
python tools/ensemble_eval.py $ALL \
  $EVAL_TAIL 2>&1 | tee logs/r5_headrefit/ensemble_eval_k4.log
echo "== member + pooled probe readout (protocol-identity check)"
python tools/probe_eval.py tools/pool_spec_r5_headrefit.json \
  2>&1 | tee logs/r5_headrefit/probe_eval.log
echo "== HEADREFIT ALL DONE $(date +%H:%M:%S)"
