"""SCAE composite model + 8-term loss.

Parity target: reference ``torch_scae/stacked_capsule_auto_encoder.py``:
forward (:92-215) including vote_type/presence_type selection ('enc'/'soft'/
'hard', :141-157), stop-grad plumbing (:111-133), alternative
reconstructions (:164-196, under stop_gradient here instead of no_grad),
prior/posterior classifiers on detached presences (:203-213); loss (:217-287)
with the same log keys; accuracy (:289-297).

Reference defects (SURVEY.md §2.4) are FIXED by default and replicable via
compat flags for parity testing:
  * compat_posterior_cls_bug=True reroutes the posterior classifier input
    through the *prior* classifier (reference :211).
  * compat_posterior_gate_bug=True gates the posterior sparsity loss on the
    *prior* sparsity weights (reference :258-259).
  * compat_double_softmax_xe=True replicates the reference's classification
    loss, which applies F.cross_entropy (an implicit log_softmax) to ALREADY
    softmaxed probabilities (reference :67-74 + :281-282). The double softmax
    attenuates the head gradient ~10x; at the shared lr=3e-5 the weakest-
    margin class never trains (measured: class-8 recall 0.000 on the head's
    own training data while a properly-fit linear readout of the same
    features reaches 0.91 — RESULTS.md round-4 class-8 diagnosis). Default
    False: cross-entropy on the head logits.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from scae_tpu.models.layers import TorchLinear
from scae_tpu.models.object_decoder import CapsuleObjectDecoder, sparsity_loss
from scae_tpu.models.part_decoder import (
    TemplateBasedImageDecoder,
    TemplateGenerator,
)
from scae_tpu.models.part_encoder import CapsuleImageEncoder
from scae_tpu.models.results import SCAEResult
from scae_tpu.models.set_transformer import SetTransformer

stop_grad = jax.lax.stop_gradient


class SCAE(nn.Module):
    """Stacked Capsule Auto-Encoder."""

    part_encoder: CapsuleImageEncoder
    template_generator: TemplateGenerator
    part_decoder: TemplateBasedImageDecoder
    obj_encoder: SetTransformer
    obj_decoder: CapsuleObjectDecoder

    n_classes: Optional[int] = None
    vote_type: str = "soft"        # reference ctor default (:33)
    presence_type: str = "enc"     # reference ctor default (:34)
    stop_grad_caps_input: bool = True
    stop_grad_caps_target: bool = True
    recon_mse_weight: float = 0.0
    part_caps_sparsity_weight: float = 0.0
    cpr_dynamic_reg_weight: float = 0.0
    caps_ll_weight: float = 0.0
    prior_sparsity_loss_type: str = "l2"
    prior_within_example_sparsity_weight: float = 0.0
    prior_between_example_sparsity_weight: float = 0.0
    prior_within_example_constant: Optional[float] = None
    posterior_sparsity_loss_type: str = "entropy"
    posterior_within_example_sparsity_weight: float = 0.0
    posterior_between_example_sparsity_weight: float = 0.0
    reconstruct_alternatives: bool = True
    # defect-replication flags (default: fixed behavior)
    compat_posterior_cls_bug: bool = False
    compat_posterior_gate_bug: bool = False
    compat_double_softmax_xe: bool = False

    @nn.compact
    def __call__(self, image, deterministic: bool = True):
        """image: (B, C, H, W) -> SCAEResult."""
        B = image.shape[0]

        with jax.named_scope("pcae_encode"):
            part_enc = self.part_encoder(image, deterministic=deterministic)

        with jax.named_scope("template_generate"):
            template_res = self.template_generator(
                feature=part_enc.feature, batch_size=B)
        templates = template_res.templates

        # ---- assemble OCAE input -----------------------------------------
        input_part_param = jnp.concatenate(
            [part_enc.pose, 1.0 - part_enc.presence[..., None]], axis=-1)
        input_presence = part_enc.presence

        if self.stop_grad_caps_input:
            input_part_param = stop_grad(input_part_param)
            input_presence = stop_grad(input_presence)

        if part_enc.feature is not None:
            input_part_param = jnp.concatenate(
                [input_part_param, part_enc.feature], axis=-1)

        input_templates = templates
        if self.stop_grad_caps_input:
            input_templates = stop_grad(input_templates)
        input_templates = input_templates.reshape(
            *input_templates.shape[:2], -1)

        parts_with_templates = jnp.concatenate(
            [input_part_param, input_templates], axis=-1)

        with jax.named_scope("ocae_encode"):
            obj_encoding = self.obj_encoder(parts_with_templates,
                                            input_presence)

        # ---- OCAE decode --------------------------------------------------
        target_pose, target_presence = part_enc.pose, part_enc.presence
        if self.stop_grad_caps_target:
            target_pose = stop_grad(target_pose)
            target_presence = stop_grad(target_presence)

        with jax.named_scope("ocae_decode"):
            obj = self.obj_decoder(obj_encoding, target_pose,
                                   target_presence,
                                   deterministic=deterministic)

        # ---- PCAE decode (reconstruction) ----------------------------------
        if self.vote_type == "enc":
            part_dec_vote = part_enc.pose
        elif self.vote_type == "soft":
            part_dec_vote = obj.soft_winner
        elif self.vote_type == "hard":
            part_dec_vote = obj.winner
        else:
            raise ValueError(f"Invalid vote_type: {self.vote_type}")

        if self.presence_type == "enc":
            part_dec_presence = part_enc.presence
        elif self.presence_type == "soft":
            part_dec_presence = obj.soft_winner_presence
        elif self.presence_type == "hard":
            part_dec_presence = obj.winner_presence
        else:
            raise ValueError(f"Invalid presence_type: {self.presence_type}")

        # target=image -> rec.target_ll is computed on the fused
        # custom-VJP path (the reconstruction target is always the input
        # image, stacked_capsule_auto_encoder.py:220 / base_experiment)
        with jax.named_scope("pcae_decode"):
            rec = self.part_decoder(templates=templates,
                                    pose=part_dec_vote,
                                    presence=part_dec_presence,
                                    target=image)

        bottom_up_rec = top_down_rec = top_down_per_caps_rec = None
        if self.reconstruct_alternatives:
            # visualization-only paths; stop_gradient stands in for no_grad
            sg_templates = stop_grad(templates)
            bottom_up_rec = self.part_decoder(
                templates=sg_templates,
                pose=stop_grad(part_enc.pose),
                presence=stop_grad(part_enc.presence))
            top_down_rec = self.part_decoder(
                templates=sg_templates,
                pose=stop_grad(obj.winner),
                presence=stop_grad(part_enc.presence))

            n_obj_caps = obj.vote.shape[1]
            td_templates = jnp.repeat(sg_templates, n_obj_caps, axis=0)
            td_pose = stop_grad(obj.vote).reshape(-1, *obj.vote.shape[2:])
            td_enc_presence = jnp.repeat(stop_grad(part_enc.presence),
                                         n_obj_caps, axis=0)
            td_dec_presence = stop_grad(obj.vote_presence_binary).reshape(
                -1, obj.vote_presence.shape[2])
            top_down_per_caps_rec = self.part_decoder(
                templates=td_templates, pose=td_pose,
                presence=td_enc_presence * td_dec_presence)

        prior_cls_prob = posterior_cls_prob = None
        prior_logits = posterior_logits = None
        if self.n_classes is not None:
            # HIGHEST precision: these 40x10 readouts are calibrated
            # against a float64 probe; the default bf16 MXU matmul flips
            # borderline argmaxes (see TorchLinear docstring).
            prior_clf = TorchLinear(self.n_classes, name="prior_classifier",
                                    precision=jax.lax.Precision.HIGHEST)
            posterior_clf = TorchLinear(self.n_classes,
                                        name="posterior_classifier",
                                        precision=jax.lax.Precision.HIGHEST)

            prior_logits = prior_clf(stop_grad(obj.caps_presence))
            prior_cls_prob = jax.nn.softmax(prior_logits, axis=-1)

            mass_explained_by_capsule = jnp.sum(obj.posterior_mixing_prob,
                                                axis=-1)
            mass_sg = stop_grad(mass_explained_by_capsule)
            # always apply both so the param tree is flag-independent
            posterior_logits = posterior_clf(mass_sg)
            if self.compat_posterior_cls_bug:
                # reference defect: posterior probs from the PRIOR
                # classifier (stacked_capsule_auto_encoder.py:211)
                posterior_logits = prior_clf(mass_sg)
            posterior_cls_prob = jax.nn.softmax(posterior_logits, axis=-1)

        return SCAEResult(
            part_pose=part_enc.pose,
            part_presence=part_enc.presence,
            part_feature=part_enc.feature,
            templates=templates,
            template_presence=part_enc.presence,
            raw_templates=template_res.raw_templates,
            obj=obj,
            rec=rec,
            transformed_templates=rec.transformed_templates,
            bottom_up_rec=bottom_up_rec,
            top_down_rec=top_down_rec,
            top_down_per_caps_rec=top_down_per_caps_rec,
            prior_cls_prob=prior_cls_prob,
            posterior_cls_prob=posterior_cls_prob,
            prior_cls_logit=prior_logits,
            posterior_cls_logit=posterior_logits,
        )

    # ------------------------------------------------------------------ loss
    def loss(self, res: SCAEResult, reconstruction_target, label=None):
        """Composite 8-term loss; returns (loss, log-dict).

        Pure function of the result bag — callable outside apply().
        """
        log = {}
        B = reconstruction_target.shape[0]

        if res.rec.target_ll is not None:
            rec_ll_per_pixel = res.rec.target_ll  # fused path (fwd target)
        else:
            rec_ll_per_pixel = res.rec.pdf.log_prob(reconstruction_target)
        rec_ll = jnp.mean(jnp.sum(rec_ll_per_pixel.reshape(B, -1), axis=-1))
        loss = -rec_ll
        log["rec_ll_loss"] = -rec_ll

        if self.recon_mse_weight > 0:
            mse_pp = jnp.square(reconstruction_target - res.rec.pdf.mode())
            mse = jnp.mean(jnp.sum(mse_pp.reshape(B, -1), axis=-1))
            loss += self.recon_mse_weight * mse
            log["mse"] = mse

        if self.part_caps_sparsity_weight > 0:
            part_caps_l1 = jnp.mean(jnp.sum(res.part_presence, axis=-1))
            loss += self.part_caps_sparsity_weight * part_caps_l1
            log["part_caps_loss"] = part_caps_l1

        loss += -self.caps_ll_weight * res.obj.log_prob
        log["log_prob_loss"] = -res.obj.log_prob

        if (self.prior_within_example_sparsity_weight > 0
                or self.prior_between_example_sparsity_weight > 0):
            prior_within, prior_between = sparsity_loss(
                self.prior_sparsity_loss_type,
                res.obj.caps_presence,
                n_classes=self.n_classes,
                within_example_constant=self.prior_within_example_constant)
            loss += (self.prior_within_example_sparsity_weight * prior_within
                     + self.prior_between_example_sparsity_weight
                     * prior_between)
            log["prior_within_sparsity_loss"] = prior_within
            log["prior_between_sparsity_loss"] = prior_between

        if self.compat_posterior_gate_bug:
            # reference defect: gate on prior weights (:258-259)
            posterior_gate = (self.prior_within_example_sparsity_weight > 0
                              or self.prior_between_example_sparsity_weight
                              > 0)
        else:
            posterior_gate = (
                self.posterior_within_example_sparsity_weight > 0
                or self.posterior_between_example_sparsity_weight > 0)

        if posterior_gate:
            n_points = res.obj.posterior_mixing_prob.shape[-1]
            mass = jnp.sum(res.obj.posterior_mixing_prob, axis=-1)
            post_within, post_between = sparsity_loss(
                self.posterior_sparsity_loss_type,
                mass / n_points,
                n_classes=self.n_classes)
            loss += (self.posterior_within_example_sparsity_weight
                     * post_within
                     + self.posterior_between_example_sparsity_weight
                     * post_between)
            log["posterior_within_sparsity_loss"] = post_within
            log["posterior_between_sparsity_loss"] = post_between

        loss += self.cpr_dynamic_reg_weight * res.obj.cpr_dynamic_reg_loss
        log["cpr_dynamic_reg_loss"] = res.obj.cpr_dynamic_reg_loss

        if label is not None:
            assert self.n_classes is not None
            if self.compat_double_softmax_xe:
                # reference applies F.cross_entropy to ALREADY-softmaxed
                # probs (double-softmax quirk, :67-74 + :281-282).
                prior_cls_xe = _f_cross_entropy(
                    res.prior_cls_prob, label)
                posterior_cls_xe = _f_cross_entropy(
                    res.posterior_cls_prob, label)
            else:
                # fixed: cross-entropy on the head logits. The double
                # softmax starves the weakest class at the shared tiny lr
                # (class-8 diagnosis, RESULTS.md round 4).
                prior_cls_xe = _f_cross_entropy(
                    res.prior_cls_logit, label)
                posterior_cls_xe = _f_cross_entropy(
                    res.posterior_cls_logit, label)
            loss += prior_cls_xe + posterior_cls_xe
            log["prior_cls_xe"] = prior_cls_xe
            log["posterior_cls_xe"] = posterior_cls_xe

        return loss, log

    def calculate_accuracy(self, res: SCAEResult, label):
        prior_pred = jnp.argmax(res.prior_cls_prob, axis=-1)
        prior_acc = jnp.mean((prior_pred == label).astype(jnp.float32))
        posterior_pred = jnp.argmax(res.posterior_cls_prob, axis=-1)
        posterior_acc = jnp.mean((posterior_pred == label)
                                 .astype(jnp.float32))
        return jnp.maximum(prior_acc, posterior_acc)


def _f_cross_entropy(probs, label):
    """F.cross_entropy(input=probs, target=label) parity: input treated as
    logits, i.e. log_softmax is applied on top of the given probabilities."""
    logp = jax.nn.log_softmax(probs, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, label[:, None],
                                         axis=-1).squeeze(-1))
