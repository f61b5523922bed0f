"""Training CLI: python -m scae_tpu.train.cli [overrides...]

Replaces the reference's Hydra entry point
(python -m torch_scae_experiments.mnist.train, mnist/train.py:44-53).
Overrides use the same spelling: group swaps (optimizer=radam) and dotted
keys (trainer.max_epochs=5, data_loader.batch_size=64). `+key=value` is
accepted and treated as key=value (our overrides create keys by default).

Examples:
  python -m scae_tpu.train.cli trainer.max_epochs=2
  python -m scae_tpu.train.cli optimizer=radam use_lookahead=true
  python -m scae_tpu.train.cli model=mnist data_loader.batch_size=64
"""

import os
import sys

from scae_tpu.config import load_config
from scae_tpu.train.loop import Trainer


def _enable_compilation_cache():
    """Persistent XLA compilation cache: first-run compiles of the fused
    train step are expensive (especially via a remote-TPU link); later
    runs hit the disk cache. Disable with SCAE_TPU_NO_COMP_CACHE=1."""
    if os.environ.get("SCAE_TPU_NO_COMP_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "SCAE_TPU_COMP_CACHE", os.path.expanduser("~/.cache/scae_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    overrides = [a.lstrip("+") for a in argv if "=" in a]
    cfg = load_config("config", overrides=overrides)

    # multi-host entry: must run before the first backend use so that
    # jax.devices() spans all processes (SURVEY.md §2.3 comm row)
    from scae_tpu.parallel.mesh import maybe_initialize_distributed

    if maybe_initialize_distributed():
        import jax

        print(f"[scae_tpu] distributed: process {jax.process_index()}"
              f"/{jax.process_count()}, {jax.device_count()} devices")

    _enable_compilation_cache()
    if (cfg.get("trainer") or {}).get("debug_nans"):
        # the analog of the reference's sanitizer story (SURVEY.md §5):
        # re-runs NaN-producing programs op-by-op and raises at the source
        import jax

        jax.config.update("jax_debug_nans", True)
    trainer = Trainer(cfg)
    if cfg.get("mode", "train") == "test":
        trainer.run_test()
    else:
        trainer.run(resume=bool(cfg.get("resume", False)))


if __name__ == "__main__":
    main()
