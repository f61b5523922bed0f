"""Worker for the multi-process data-parallel test (not a test module).

Usage: python tests/two_process_worker.py <pid> <nproc> <port> <outdir> \
           [max_steps] [resume]

Runs a tiny Trainer config for max_steps (default 4) and writes
<outdir>/result_<pid>.json with the final step and a params checksum.
With nproc>1 it joins a jax.distributed CPU cluster on 127.0.0.1:<port>
(1 CPU device per process); the single-process baseline is launched with
XLA_FLAGS=--xla_force_host_platform_device_count=<nproc> so the global
mesh is identical and results must match. With `resume`, restores the
shared Orbax checkpoint and continues (the multi-host resume path:
restore -> per-process re-placement as global arrays).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# sitecustomize registers the axon TPU plugin at interpreter start; env
# vars are too late but backend *init* is lazy (tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    max_steps = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    resume = len(sys.argv) > 6 and sys.argv[6] == "resume"
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc, process_id=pid)
    assert jax.device_count() == max(nproc, 2) or nproc == 1, (
        jax.device_count(), nproc)

    from scae_tpu.config import load_config
    from scae_tpu.train.loop import Trainer
    import scae_tpu.train.data as data_lib

    overrides = [
        "data_loader.batch_size=16",
        "data_loader.val_size=32",
        "data_loader.synthetic_train=128",
        "data_loader.synthetic_test=32",
        "trainer.log_every_steps=1",
        "trainer.max_eval_batches=1",
        "trainer.augment.canvas=24",
        "trainer.augment.max_shift=2",
        "model.image_shape=[1,24,24]",
        "model.n_part_caps=8",
        "model.n_obj_caps=4",
        "model.pcae_cnn_encoder_params.out_channels=[16,16,16,16]",
        "model.pcae_template_generator_params.template_size=[6,6]",
        "model.ocae_encoder_set_transformer_params.dim_hidden=8",
        "model.ocae_encoder_set_transformer_params.dim_out=16",
        "model.ocae_decoder_capsule_params.dim_caps=8",
        "model.ocae_decoder_capsule_params.hidden_sizes=[16]",
        f"trainer.checkpoint_dir={outdir}/ckpt",
        f"trainer.log_dir={outdir}/logs_p{pid}",
    ]
    cfg = load_config("config", overrides=overrides)
    trainer = Trainer(cfg)
    state = trainer.run(max_epochs=max_steps, max_steps=max_steps,
                        resume=resume)

    params = jax.device_get(state.params)
    leaves = jax.tree_util.tree_leaves(params)
    result = {
        "pid": pid,
        "nproc": nproc,
        "step": int(jax.device_get(state.step)),
        "n_devices": jax.device_count(),
        "params_l2": float(sum(np.sum(np.square(x, dtype=np.float64))
                               for x in leaves)),
        "params_abs_sum": float(sum(np.sum(np.abs(x, dtype=np.float64))
                                    for x in leaves)),
    }
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump(result, f)
    print(f"[worker {pid}/{nproc}] done: {result}", flush=True)


if __name__ == "__main__":
    main()
