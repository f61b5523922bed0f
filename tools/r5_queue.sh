#!/bin/bash
# Round-5 TPU work queue: serialize the preregistered experiment
# drivers on the single chip. Waits for the in-flight mnist60k driver
# (pid file /tmp/mnist60k.pid) before starting, then runs the color
# study (round-4 preregistration), the head-refit K=4 pool, and the
# 14-member pool rebuild + calibration consistency check, in order.
# Every driver has its own DONE-skip logic, so re-running is safe.
set -u
cd "$(dirname "$0")/.."

if [ -f /tmp/mnist60k.pid ]; then
  pid=$(cat /tmp/mnist60k.pid)
  while kill -0 "$pid" 2>/dev/null; do sleep 20; done
fi
echo "== queue: mnist60k driver finished $(date +%H:%M:%S)"

bash tools/color_run.sh       2>&1 | tee logs/r5_queue_color.log
bash tools/headrefit_runs.sh  2>&1 | tee logs/r5_queue_headrefit.log
bash tools/r5_pool_runs.sh    2>&1 | tee logs/r5_queue_pool.log
echo "== QUEUE ALL DONE $(date +%H:%M:%S)"
