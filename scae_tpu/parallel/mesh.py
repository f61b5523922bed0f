"""Device mesh + sharding rules (the distributed story, SURVEY.md §2.3).

The reference has no distribution code of its own — multi-GPU was a
pass-through to Lightning 0.9 Trainer flags (mnist/train.py:40). Here
distribution is first-class and TPU-native:

  * data parallelism: the batch axis is sharded over the 'data' mesh axis;
    with replicated params, jit inserts the gradient all-reduce (psum over
    ICI) automatically.
  * tensor parallelism: the OCAE per-capsule MLP bank — O independent
    expert MLPs stored stacked as (O, in, out)
    (scae_tpu.models.layers.StackedMLP) — is embarrassingly parallel over
    capsules, so its weights (and the per-capsule biases/statics) shard
    over the 'model' axis. XLA propagates the (B, O, ...) activation
    sharding through the einsums with no extra collectives until the
    capsule-likelihood reduction.

No custom transport: collectives are XLA's over ICI (intra-slice) / DCN
(multi-slice via jax.distributed).
"""

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

_distributed_initialized = False


def maybe_initialize_distributed() -> bool:
    """Multi-host entry: call ``jax.distributed.initialize()`` when a
    multi-process launch is detected, before any backend use.

    Detection (standard JAX multi-host conventions):
      * JAX_COORDINATOR_ADDRESS (+ optional JAX_NUM_PROCESSES /
        JAX_PROCESS_ID) — e.g. a manual multi-slice DCN launch;
      * SCAE_TPU_MULTIHOST=1 — opt into ``initialize()``'s own cloud-TPU
        pod auto-discovery. (Auto-detecting pod env vars is NOT done:
        single-chip containers can carry pod-style vars from the runtime,
        and a spurious initialize() aborts the process.)

    After this, ``jax.devices()`` spans every process and ``make_mesh``
    builds the global (data, model) mesh; XLA routes collectives over ICI
    intra-slice and DCN across slices — no transport code here (the
    reference's analog was Lightning pass-through, SURVEY.md §2.3).

    Returns True if initialize() was called (idempotent, safe to re-enter).
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr and not os.environ.get("SCAE_TPU_MULTIHOST"):
        return False
    kwargs = {}
    if addr:
        kwargs["coordinator_address"] = addr
        if "JAX_NUM_PROCESSES" in os.environ:
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_PROCESS_ID" in os.environ:
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _distributed_initialized = True
    return True


def is_process_zero() -> bool:
    """Host-side side effects (metrics, grids, checkpoints, prints) run
    only on process 0 under a multi-process launch."""
    return jax.process_index() == 0


def make_global_array(value, mesh: Mesh, spec: "P"):
    """Build a jax.Array with the given sharding from process-local data.

    Multi-host contract: every process holds the SAME full logical value
    (datasets and batch-index streams are derived deterministically from
    the shared seed — train/loop.py), and each process fills only the
    shards its local devices own, so no cross-host data movement happens.
    Single-process: a plain device_put (placement identical, cheaper
    dispatch).

    This is the piece the reference never had: its multi-GPU story was
    Lightning flag pass-through (mnist/train.py:40), with the DataLoader
    already per-process. Here the global batch is assembled explicitly.
    """
    sharding = NamedSharding(mesh, spec)
    arr = np.asarray(value)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda index: arr[index])


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a (data, model) mesh. Defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _capsule_bank_spec(path_names, value) -> P:
    """PartitionSpec for OCAE capsule-bank params over the 'model' axis.

    StackedMLP kernels/biases are (O, ...) -> shard axis 0; cpr_static /
    caps_bias_* / presence statics are (1, O, ...) -> shard axis 1.
    """
    if "capsule_layer" in path_names:
        leaf = path_names[-1]
        if leaf.startswith(("kernel_", "bias_")):
            return P(MODEL_AXIS)
        if leaf == "cpr_static" or leaf.startswith("caps_bias_"):
            return P(None, MODEL_AXIS)
    return P()


def param_shardings(mesh: Mesh, params, shard_capsule_banks: bool = True):
    """Sharding pytree for a param tree: replicated everywhere except the
    capsule banks (sharded over 'model' when the mesh has a model axis)."""
    use_model = shard_capsule_banks and mesh.shape.get(MODEL_AXIS, 1) > 1

    def spec_for(path, value):
        names = [getattr(p, "key", getattr(p, "name", str(p)))
                 for p in path]
        if use_model:
            spec = _capsule_bank_spec(names, value)
            # only shard if the axis divides evenly
            axis = spec.index(MODEL_AXIS) if MODEL_AXIS in spec else None
            if axis is not None and \
                    value.shape[axis] % mesh.shape[MODEL_AXIS] == 0:
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
