"""One-process pool runner: train/calibrate MANY members back to back.

Why this exists: the per-member shell drivers (`tools/r5_pool_runs.sh`)
pay the axon tunnel's REMOTE compile once per OS process. Mid round-5
that compile degraded from ~3 min to 15-25+ min per process (verified:
a fresh process's axon-conn-read thread blocks in tcp_recvmsg while a
trivial program compiles in 1.5 s — the big-program compile service is
the queue), turning a ~2 h 14-member rebuild into a ~7 h one. Running
members inside ONE process reuses the jit cache across members: one
big compile per shape group (flagship, mnist28) instead of fourteen.

Determinism is untouched — every member's init/noise/data streams key
off its own seed (loop.py::init_state, data.load_datasets), not
process state; a member trained here is step-for-step identical to the
same recipe under the shell driver (tested:
tests/test_train_smoke.py::test_pool_inprocess_matches_solo_run).

Usage:
    python tools/pool_inprocess.py train      # remaining r5 pool members
    python tools/pool_inprocess.py calibrate  # bake probes, all members

Reference being replaced: none (the torch reference has no multi-run
driver at all); this is round-5 infrastructure for the preregistered
pool rebuild (RESULTS.md "pool rebuild + the calibration consistency
check").
"""

import contextlib
import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The in-process jit cache does NOT carry across members after all:
# every Trainer builds fresh closures, so jax's in-memory cache keys
# miss and each member still pays a remote compile (observed round 5:
# 11 min/member, f612 wedged >30 min in the degraded remote-compile
# queue). The persistent DISK cache — which cli.main enables but this
# runner bypassed — is what actually amortizes: one cold compile per
# shape group, every later member deserializes locally.
from scae_tpu.train.cli import _enable_compilation_cache

_enable_compilation_cache()

FLAG = [
    "model=mnist",
    "data_loader.source=digits",
    "data_loader.split_seed=7",
    "trainer.monitor=val_accuracy",
    "trainer.monitor_mode=max",
    "trainer.eval_every_epochs=50",
    "lr_scheduler.decay_rate=0.99994",
    "trainer.seed_probe.n=16",
]

MEMBERS = [
    *[(f"f{s}", 4000, [f"seed={s}"]) for s in range(500, 613, 16)],
    *[(f"s{s}", 2000, [f"seed={s}", "model=mnist28",
                       "trainer.augment.max_shift=0"])
      for s in range(200, 281, 16)],
]

EVAL_OVERRIDES = [
    "data_loader.source=digits", "data_loader.split_seed=7",
    "trainer.monitor=val_accuracy", "trainer.monitor_mode=max",
]


def train_members(members=MEMBERS, log_root="logs/r5_pool",
                  ckpt_root="checkpoints/r5_pool", base_overrides=None):
    from scae_tpu.config import load_config
    from scae_tpu.train.loop import Trainer

    base = FLAG if base_overrides is None else base_overrides
    for name, epochs, extra in members:
        log_dir = os.path.join(log_root, name)
        done = os.path.join(log_dir, "DONE")
        if os.path.exists(done):
            print(f"== {name} already done, skipping", flush=True)
            continue
        os.makedirs(log_dir, exist_ok=True)
        print(f"== train {name} (in-process)", flush=True)
        cfg = load_config("config", overrides=base + extra + [
            f"trainer.max_epochs={epochs}",
            f"trainer.log_dir={log_dir}",
            f"trainer.checkpoint_dir={os.path.join(ckpt_root, name)}",
        ])
        with open(os.path.join(log_dir, "stdout.log"), "a") as f, \
                contextlib.redirect_stdout(f):
            trainer = Trainer(cfg)
            trainer.run(max_epochs=epochs)
            trainer.ckpt.wait()
            trainer.ckpt.close()
            trainer.writer.close()
        del trainer
        gc.collect()
        with open(done, "w"):
            pass
        print(f"== {name} done", flush=True)


def calibrate_members(members=MEMBERS, ckpt_root="checkpoints/r5_pool",
                      out_root="checkpoints/r5_calibrated",
                      log_path="logs/r5_calibrated/calibrate.log"):
    import probe_calibrate

    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    for name, _, extra in members:
        out = os.path.join(out_root, name)
        if os.path.isdir(out):
            print(f"== {name} already calibrated, skipping", flush=True)
            continue
        print(f"== calibrate {name} (in-process)", flush=True)
        model_extra = [o for o in extra if o.startswith("model=")]
        with open(log_path, "a") as f, contextlib.redirect_stdout(f):
            probe_calibrate.main([
                os.path.join(ckpt_root, name), "--out", out, "--",
                *model_extra, *EVAL_OVERRIDES])
        gc.collect()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "train"
    if mode == "train":
        train_members()
    elif mode == "calibrate":
        calibrate_members()
    else:
        raise SystemExit(f"unknown mode {mode!r} (train|calibrate)")
