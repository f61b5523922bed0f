"""Summarize the preregistered loss-weight sweep (tools/wsweep.sh).

Prints one markdown row per completed variant: peak val_accuracy (step),
final val_accuracy, min val_rec_ll — the preregistered judgment columns
(RESULTS.md "sparsity/loss-weight sensitivity sweep"; control
r3_digits_lr: peak 0.75, final 0.672, min rec_ll 1478.7).
"""

import json
import os
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..", "logs", "r3_wsweep")


def summarize(d):
    path = os.path.join(ROOT, d, "metrics.jsonl")
    with open(path) as f:
        vals = [r for r in map(json.loads, f)
                if "val_accuracy" in r and "val_rec_ll_loss" in r]
    if not vals:
        return None
    pk = max(vals, key=lambda r: r["val_accuracy"])
    mn = min(vals, key=lambda r: r["val_rec_ll_loss"])
    done = os.path.exists(os.path.join(ROOT, d, "DONE"))
    return (d, len(vals), pk["val_accuracy"], pk["step"],
            vals[-1]["val_accuracy"], mn["val_rec_ll_loss"], done)


def main():
    rows = []
    for d in sorted(os.listdir(ROOT)):
        if not os.path.isdir(os.path.join(ROOT, d)):
            continue
        try:
            r = summarize(d)
        except FileNotFoundError:
            continue
        if r:
            rows.append(r)
    print("| variant | evals | peak val_acc (step) | final | "
          "min val_rec_ll | done |")
    print("|---|---|---|---|---|---|")
    for d, n, pk, st, fin, mn, done in rows:
        # n = completed eval passes (max_epochs / eval_every_epochs of
        # the run's own recipe; 40 for the 2000-epoch/eval-50 sweep)
        print(f"| {d} | {n} | {pk:.3f} ({st}) | {fin:.3f} "
              f"| {mn:.1f} | {'yes' if done else 'RUNNING'} |")


if __name__ == "__main__":
    main()
