"""AOT export / serving of trained SCAE models via ``jax.export``.

The reference has no serving story: deploying a trained model means
carrying the whole training repo (torch + Lightning + the module code)
and re-instantiating it from hparams, as its train notebook does
(/root/reference/torch_scae_experiments/mnist/train.ipynb). Here a
trained model is exported ONCE into a self-contained StableHLO artifact
— parameters baked in as constants, optional multi-platform (cpu+tpu)
lowering — that any jax process can deserialize and call without
scae_tpu, flax, or the model source on its path.

Artifact layout (a directory)::

    model.jaxexp    serialized jax.export.Exported: StableHLO module,
                    params embedded as constants
    manifest.json   input spec, output names, platforms, versions,
                    and the full model config for provenance

The exported function is the deterministic inference surface::

    image (B, C, H, W) float32 in [0, 1]  ->
      {prior_cls_prob, posterior_cls_prob, prediction, prior_prediction,
       part_presence, part_pose, caps_presence[, reconstruction]}

``prediction`` is the posterior-classifier argmax (the reference's
classification head, stacked_capsule_auto_encoder.py:289-297);
``reconstruction`` (opt-in) is the mixture mode, the image the training
grids show.

Exports default to the XLA decoder path (``fused_impl='xla'``), not the
Pallas kernels: StableHLO serialization guarantees forward compatibility
only for stable custom calls, and the XLA path is golden-tested to the
same values (test_pallas_decoder_impls.py) — the artifact trades a
training-time speed trick for deployment stability. Pass a model built
with another impl explicitly if you accept artifact/runtime coupling.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

ARTIFACT_NAME = "model.jaxexp"
MANIFEST_NAME = "manifest.json"


def make_infer_fn(model, with_reconstruction: bool = False):
    """Pure ``fn(params, image) -> dict`` deterministic inference."""

    def infer(params, image):
        res = model.apply({"params": params}, image=image,
                          deterministic=True)
        out = {
            "part_presence": res.part_presence,
            "part_pose": res.part_pose,
            "caps_presence": res.obj.caps_presence,
        }
        if res.posterior_cls_prob is not None:
            out["prior_cls_prob"] = res.prior_cls_prob
            out["posterior_cls_prob"] = res.posterior_cls_prob
            out["prediction"] = jnp.argmax(res.posterior_cls_prob, axis=-1)
            out["prior_prediction"] = jnp.argmax(res.prior_cls_prob, axis=-1)
        if with_reconstruction:
            out["reconstruction"] = res.rec.pdf.mode()
        return out

    return infer


def export_serving(model, params, *, image_shape: Sequence[int],
                   batch_size: int | None, out_dir: str,
                   with_reconstruction: bool = False,
                   platforms: Sequence[str] = ("cpu", "tpu"),
                   model_config: dict | None = None,
                   mesh=None, batch_axis: str = "data",
                   polymorphic_batch: bool = False) -> str:
    """Export ``model`` + trained ``params`` as a serving artifact.

    ``image_shape`` is the model's (C, H, W). Returns the artifact
    directory. ``platforms`` controls the lowering targets;
    cross-platform lowering needs no physical device, so a CPU box can
    produce a TPU-servable artifact.

    Pass a ``jax.sharding.Mesh`` to export a DATA-SHARDED serving
    program: the batch dim is partitioned over ``batch_axis`` and the
    artifact records the sharding — at load time it must be called with
    the same device count, and serves batch-parallel over the mesh
    (jax.export serializes per-input shardings; ``Exported.nr_devices``
    documents the requirement). Single-device artifacts (mesh=None) are
    the portable default.

    ``polymorphic_batch=True`` exports with a SYMBOLIC batch dimension
    (``jax.export.symbolic_shape``): one artifact serves any batch size
    ≥ 1 — the realistic serving contract, where request batches vary.
    Under it ``batch_size`` is unused and may be None (the manifest
    records the batch dim as None either way).
    The whole model is batch-parallel (no cross-batch reduction on the
    inference path), so the lowering is exact, and the embedded shape
    assertions reject non-batch shape drift at call time as before.
    Mutually exclusive with ``mesh`` (a serialized sharding constrains
    the concrete batch partitioning; shard the polymorphic artifact's
    inputs at the caller instead).
    """
    from jax.sharding import NamedSharding, PartitionSpec

    from scae_tpu import __version__

    infer = make_infer_fn(model, with_reconstruction=with_reconstruction)

    def serving_fn(image):
        # params close over the trace and are baked into the module as
        # constants -> the artifact is self-contained
        return infer(params, image)

    c, h, w = image_shape
    if polymorphic_batch:
        if mesh is not None:
            raise ValueError(
                "polymorphic_batch and mesh are mutually exclusive: a "
                "serialized sharding pins the batch partitioning")
        (b_dim,) = jax_export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b_dim, c, h, w), jnp.float32)
        fn = jax.jit(serving_fn)
    else:
        spec = jax.ShapeDtypeStruct((batch_size, c, h, w), jnp.float32)
        if mesh is not None:
            in_shardings = NamedSharding(mesh, PartitionSpec(batch_axis))
            fn = jax.jit(serving_fn, in_shardings=in_shardings)
        else:
            fn = jax.jit(serving_fn)
    exported = jax_export.export(fn, platforms=list(platforms))(spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT_NAME), "wb") as f:
        f.write(exported.serialize())

    # reuse the export spec (symbolic under polymorphic_batch, where a
    # concrete batch_size may legitimately be None)
    out_names = sorted(jax.eval_shape(serving_fn, spec).keys())
    manifest = {
        # batch None = symbolic: the artifact serves any batch size
        "input": {"shape": [None if polymorphic_batch else batch_size,
                            c, h, w], "dtype": "float32",
                  "layout": "NCHW", "range": "[0, 1]"},
        "outputs": out_names,
        "platforms": list(platforms),
        "nr_devices": exported.nr_devices,
        "batch_axis": batch_axis if mesh is not None else None,
        "polymorphic_batch": polymorphic_batch,
        "with_reconstruction": with_reconstruction,
        "jax_version": jax.__version__,
        "scae_tpu_version": __version__,
        "model_config": model_config,
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


class ServingModel:
    """A deserialized serving artifact: ``model(image) -> dict``.

    Needs only jax — no scae_tpu/flax imports happen on load; this class
    is a thin convenience holder around ``jax.export.deserialize``.
    """

    def __init__(self, exported, manifest: dict):
        self.exported = exported
        self.manifest = manifest
        self._call = jax.jit(exported.call)

    @property
    def input_shape(self):
        """(B, C, H, W); B is None for a polymorphic-batch artifact."""
        return tuple(self.manifest["input"]["shape"])

    def __call__(self, image):
        return self._call(jnp.asarray(image, jnp.float32))


def load_serving(artifact_dir: str) -> ServingModel:
    with open(os.path.join(artifact_dir, ARTIFACT_NAME), "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    with open(os.path.join(artifact_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    return ServingModel(exported, manifest)
