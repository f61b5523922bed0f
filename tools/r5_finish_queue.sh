#!/bin/bash
# Round-5 finish queue: serialize the two remaining preregistered
# studies on the single chip, in priority order:
#   1. Run C — the 60k patch-init counterfactual (registered driver,
#      amended per RESULTS.md "AMENDMENT (pre-launch)": probe reads C
#      alone; thresholds unchanged).
#   2. The 14-member pool rebuild + calibration consistency check
#      (in-process trainer to amortize the tunnel's remote compile,
#      then the registered probe/calibrate/ensemble steps).
# Every step has DONE-skip logic, so re-running after a crash resumes.
set -u
cd "$(dirname "$0")/.."

echo "== QUEUE start $(date +%H:%M:%S)"
if ! grep -q "POOLED" logs/r5_mnist60k/probe_eval_c.log 2>/dev/null; then
  bash tools/mnist60k_patches_run.sh 2>&1 | tee logs/r5_queue_patches.log
else
  echo "== Run C already complete (probe recorded), skipping"
fi

echo "== pool rebuild (in-process) $(date +%H:%M:%S)"
mkdir -p logs/r5_pool logs/r5_calibrated
python tools/pool_inprocess.py train 2>&1 | tee logs/r5_queue_pooltrain.log

if [ ! -f logs/r5_pool/probe_eval.log ] || \
   ! grep -q "pooled" logs/r5_pool/probe_eval.log; then
  echo "== probe eval over the fresh K=14 pool $(date +%H:%M:%S)"
  python tools/probe_eval.py tools/pool_spec_r5.json \
    2>&1 | tee logs/r5_pool/probe_eval.log
fi

echo "== calibrate (in-process) $(date +%H:%M:%S)"
python tools/pool_inprocess.py calibrate \
  2>&1 | tee logs/r5_queue_calibrate.log

echo "== standard-path ensemble over calibrated checkpoints $(date +%H:%M:%S)"
python tools/ensemble_pool.py tools/pool_spec_r5_calibrated.json \
  2>&1 | tee logs/r5_calibrated/pool_eval.log
echo "== QUEUE ALL DONE $(date +%H:%M:%S)"
