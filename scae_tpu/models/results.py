"""Typed result pytrees.

The reference returns ``monty.AttrDict`` bags from every forward
(part_encoder.py:111-113, part_decoder.py:107-110/239-243,
object_decoder.py:229-236/361-372, stacked_capsule_auto_encoder.py:92-215).
Here each bag is a frozen flax.struct dataclass so results flow through
jit/pjit as ordinary pytrees, with Optional fields for the conditional
outputs (alternative reconstructions, classifier probabilities).
"""

from typing import Optional

import jax
from flax import struct  # noqa: F401

from scae_tpu.ops.gmm import GaussianMixture


@struct.dataclass
class PartEncoderResult:
    pose: jax.Array                 # (B, M, 6) constrained poses
    presence: jax.Array             # (B, M)
    feature: Optional[jax.Array]    # (B, M, S) or None


@struct.dataclass
class TemplateResult:
    raw_templates: jax.Array        # (1, M, C, Ht, Wt)
    templates: jax.Array            # (B, M, C, Ht, Wt)


@struct.dataclass
class PartDecoderResult:
    transformed_templates: jax.Array  # (B, M+1, C, H, W) incl. background
    mixing_logits: jax.Array          # (B, M+1, C, H, W)
    pdf: GaussianMixture
    # per-pixel mixture log-likelihood of a provided target, computed by
    # the fused custom-VJP path (ops/decoder_ll.py); None if no target
    # was passed to the decoder
    target_ll: Optional[jax.Array] = None


@struct.dataclass
class CapsuleLayerResult:
    vote: jax.Array                      # (B, O, V, 3, 3)
    scale: jax.Array                     # (B, O, V)
    vote_presence: jax.Array             # (B, O, V)
    presence_logit_per_caps: jax.Array   # (B, O, 1)
    presence_logit_per_vote: jax.Array   # (B, O, V)
    cpr_dynamic_reg_loss: jax.Array      # scalar


@struct.dataclass
class CapsuleLikelihoodResult:
    log_prob: jax.Array                 # scalar
    vote_presence_binary: jax.Array     # (B, O, M)
    winner: jax.Array                   # (B, M, 6)
    winner_presence: jax.Array          # (B, M)
    soft_winner: jax.Array              # (B, M, 6)
    soft_winner_presence: jax.Array     # (B, M)
    posterior_mixing_prob: jax.Array    # (B, O, M)
    mixing_log_prob: jax.Array          # (B, O+1, M)
    mixing_logit: jax.Array             # (B, O+1, M)
    is_from_capsule: jax.Array          # (B, M)


@struct.dataclass
class ObjectDecoderResult:
    # capsule-layer outputs (vote flattened to (B, O, V, 6))
    vote: jax.Array
    scale: jax.Array
    vote_presence: jax.Array
    presence_logit_per_caps: jax.Array
    presence_logit_per_vote: jax.Array
    cpr_dynamic_reg_loss: jax.Array
    caps_presence: jax.Array            # (B, O) = max over votes
    # likelihood outputs
    log_prob: jax.Array
    vote_presence_binary: jax.Array
    winner: jax.Array
    winner_presence: jax.Array
    soft_winner: jax.Array
    soft_winner_presence: jax.Array
    posterior_mixing_prob: jax.Array
    mixing_log_prob: jax.Array
    mixing_logit: jax.Array
    is_from_capsule: jax.Array


@struct.dataclass
class SCAEResult:
    # part encoder
    part_pose: jax.Array
    part_presence: jax.Array
    part_feature: Optional[jax.Array]
    # templates
    templates: jax.Array
    template_presence: jax.Array
    raw_templates: jax.Array
    # object decoder + likelihood
    obj: ObjectDecoderResult
    # reconstructions
    rec: PartDecoderResult
    transformed_templates: jax.Array
    bottom_up_rec: Optional[PartDecoderResult] = None
    top_down_rec: Optional[PartDecoderResult] = None
    top_down_per_caps_rec: Optional[PartDecoderResult] = None
    # classifiers
    prior_cls_prob: Optional[jax.Array] = None
    posterior_cls_prob: Optional[jax.Array] = None
    # pre-softmax head outputs, for the fixed (non-double-softmax)
    # classification loss (scae.py compat_double_softmax_xe)
    prior_cls_logit: Optional[jax.Array] = None
    posterior_cls_logit: Optional[jax.Array] = None
