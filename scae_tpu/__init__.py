"""scae_tpu — a TPU-native JAX/Flax framework for Stacked Capsule Autoencoders.

A from-scratch rebuild of the capabilities of the PyTorch reference
``bdsaglam/torch-scae`` (Kosiorek et al., NeurIPS 2019, arXiv:1906.06818),
designed TPU-first:

* pure-function compute with explicit PRNG keys (no hidden global RNG),
* the per-capsule MLP bank as stacked-weight einsums (MXU) instead of
  Python loops over capsules,
* the affine template warp as a matmul-form bilinear resampler (MXU)
  instead of gather-based ``grid_sample``,
* presence-masked set attention with an optional fused Pallas kernel,
* jit/pjit batch-sharded data parallelism over a ``jax.sharding.Mesh``.

Public API mirrors the reference's module boundaries (see SURVEY.md §1-2):
``factory.make_scae`` / ``factory.prepare_model_params``, PCAE
(`CapsuleImageEncoder`, `TemplateGenerator`, `TemplateBasedImageDecoder`),
OCAE (`SetTransformer`, `CapsuleLayer`, `CapsuleObjectDecoder`), and the
``SCAE`` composite with its 8-term loss.
"""

__version__ = "0.2.0"

from scae_tpu import factory  # noqa: F401
