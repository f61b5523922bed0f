#!/bin/bash
# Preregistered loss-weight sensitivity sweep (RESULTS.md "sparsity/
# loss-weight sensitivity sweep"): 8 one-factor variants around the
# reference's MNIST loss weights, on the fixed escaped seed-42 digits
# recipe (= logs/r3_digits_lr control: peak val acc 0.75).
# Judged on peak val_accuracy (min val_rec_ll secondary); only >0.05
# above the 0.75 control peak counts as signal (seed-noise band).
#
# save_top_k=0: sweep runs are judged on metrics.jsonl alone, no
# checkpoints (NullCheckpointManager).
set -u
cd "$(dirname "$0")/.."

BASE="python -m scae_tpu.train.cli data_loader.source=digits \
  trainer.max_epochs=2000 trainer.eval_every_epochs=50 \
  lr_scheduler.decay_rate=0.99994 trainer.save_top_k=0"

run() {
  name="$1"; shift
  if [ -f "logs/r3_wsweep/$name/DONE" ]; then
    echo "== $name already done, skipping"; return
  fi
  echo "== $name: $*"
  mkdir -p "logs/r3_wsweep/$name"
  # checkpoint_dir lives inside the log dir: under save_top_k=0 the
  # Null manager writes only train_seed.json there, and keeping it
  # next to metrics.jsonl preserves the run's recorded seed/split
  # (reproducibility of the preregistered runs)
  $BASE "$@" \
    "trainer.log_dir=logs/r3_wsweep/$name" \
    "trainer.checkpoint_dir=logs/r3_wsweep/$name/ckpt" \
    > "logs/r3_wsweep/$name/stdout.log" 2>&1 \
    && touch "logs/r3_wsweep/$name/DONE"
  echo "== $name exit=$?"
}

P=model.scae_params
run post_within_0.35  "$P.posterior_within_example_sparsity_weight=0.35"
run post_within_1.4   "$P.posterior_within_example_sparsity_weight=1.4"
run post_between_0.4  "$P.posterior_between_example_sparsity_weight=0.4"
run prior_within_1.0  "$P.prior_within_example_sparsity_weight=1.0"
run prior_within_4.0  "$P.prior_within_example_sparsity_weight=4.0"
run prior_between_0.7 "$P.prior_between_example_sparsity_weight=0.7"
run caps_ll_2.0       "$P.caps_ll_weight=2.0"
run cpr_reg_1         "$P.cpr_dynamic_reg_weight=1"
echo "== sweep complete"
