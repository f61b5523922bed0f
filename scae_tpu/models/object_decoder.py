"""OCAE decoder: per-object-capsule vote prediction + capsule likelihood.

Parity targets:
  * CapsuleLayer (reference object_decoder.py:28-240). The reference runs
    O independent MLPs in Python loops over capsules
    (object_decoder.py:137-139,154-157) — serial kernel launches. Here the
    banks are StackedMLPs: weights stored (O, in, out), applied as single
    einsums on the MXU, with per-capsule weights still independent.
    Bernoulli capsule dropout existence bit (object_decoder.py:144-151),
    output split into OPR-dynamic/OVR/presences/scales
    (object_decoder.py:91-97,160-179), cpr = transform(static+dynamic) with
    l2 reg on the dynamic part (object_decoder.py:115-118,167-172),
    vote = OVR @ OPR (object_decoder.py:189-191), uniform/logistic noise
    on presence logits (object_decoder.py:198-212), softplus vote scale
    (object_decoder.py:223-227), hierarchical parent_transform /
    parent_presence hooks (object_decoder.py:184-187,214-217).
  * CapsuleLikelihood (reference object_decoder.py:243-372): Gaussian vote
    pdf, dummy component at log(0.01), posterior mixing, hard winner by
    argmax + gather (take_along_axis here), soft winner as
    posterior-weighted vote sum including the learned dummy vote.
  * Sparsity losses (reference object_decoder.py:431-493).

Train-time stochasticity is drawn from the 'noise' rng collection and
disabled when deterministic=True (the reference used global torch RNG —
SURVEY.md §2.4(13)).

Divergence (documented): reference noise_type='logistic' samples
torch.distributions.LogisticNormal(0, s) whose event shape makes the
addition ill-formed (never exercised: all configs use 'uniform'). Here
'logistic' means additive noise from a standard logistic distribution
scaled by noise_scale.
"""

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from scae_tpu.models.layers import StackedMLP
from scae_tpu.models.results import (
    CapsuleLayerResult,
    CapsuleLikelihoodResult,
    ObjectDecoderResult,
)
from scae_tpu.ops.geometry import (
    affine_to_matrix,
    compose_affines,
    geometric_transform,
)
from scae_tpu.ops.gmm import normal_log_prob
from scae_tpu.ops.math_ops import (
    cross_entropy_safe,
    l2_loss,
    log_safe,
    normalize,
)

_LOG_001 = math.log(0.01)  # dummy log-prob / mixing logit constant


class CapsuleLayer(nn.Module):
    """Predicts per-object-capsule candidate part poses ("votes")."""

    n_caps: int                       # O
    dim_feature: int                  # F
    n_votes: int                      # V
    dim_caps: int                     # D
    hidden_sizes: Sequence[int] = (128,)
    caps_dropout_rate: float = 0.0
    learn_vote_scale: bool = False
    allow_deformations: bool = True
    noise_type: Optional[str] = None
    noise_scale: float = 0.0
    similarity_transform: bool = True

    n_transform_params: int = 6       # P

    @nn.compact
    def __call__(self, feature, parent_transform=None, parent_presence=None,
                 deterministic: bool = True):
        """feature: (B, O, F) object encodings."""
        B = feature.shape[0]
        O, V, P = self.n_caps, self.n_votes, self.n_transform_params
        hidden = list(self.hidden_sizes)

        output_shapes = (
            (V, P),   # OPR-dynamic
            (1, P),   # OVR
            (1,),     # per-object presence logit
            (V,),     # per-vote presence logit
            (V,),     # per-vote scale
        )
        splits = [math.prod(s) for s in output_shapes]
        n_outputs = sum(splits)  # A

        # (B, O, F) -> (B, O, D); final ReLU kept (reference MLP default
        # activate_final=True, nn_ext.py:19-31)
        raw_caps_param = StackedMLP(
            n_stack=O, sizes=(self.dim_feature, *hidden, self.dim_caps),
            name="mlps")(feature)

        if self.caps_dropout_rate == 0.0:
            caps_exist = jnp.ones((B, O, 1), raw_caps_param.dtype)
        else:
            key = self.make_rng("noise")
            caps_exist = jax.random.bernoulli(
                key, 1.0 - self.caps_dropout_rate, (B, O, 1)
            ).astype(raw_caps_param.dtype)

        caps_param = jnp.concatenate([raw_caps_param, caps_exist], axis=-1)

        # bias-free bank so static/dynamic OP parts stay separable
        # (reference object_decoder.py:101-107)
        all_param = StackedMLP(
            n_stack=O, sizes=(self.dim_caps + 1, *hidden, n_outputs),
            use_bias=False, name="caps_mlps")(caps_param)  # (B, O, A)

        offsets = [0]
        for s in splits:
            offsets.append(offsets[-1] + s)
        chunks = [
            all_param[..., offsets[i]:offsets[i + 1]].reshape(
                B, O, *output_shapes[i])
            for i in range(len(splits))
        ]

        cpr_dynamic = chunks[0]  # (B, O, V, P)
        if not self.allow_deformations:
            cpr_dynamic = jnp.zeros_like(cpr_dynamic)
        cpr_dynamic_reg_loss = l2_loss(cpr_dynamic) / B

        cpr_static = self.param("cpr_static", nn.initializers.zeros,
                                (1, O, V, P))
        cpr = self._make_transform_flat(cpr_dynamic + cpr_static)  # (B,O,V,6)

        # learned biases for the remaining heads (object_decoder.py:109-112)
        bias_shapes = [(1, O, *s) for s in output_shapes[1:]]
        biases = [self.param(f"caps_bias_{i}", nn.initializers.zeros, s)
                  for i, s in enumerate(bias_shapes)]
        cvr = chunks[1] + biases[0]                        # (B, O, 1, P)
        presence_logit_per_caps = chunks[2] + biases[1]    # (B, O, 1)
        presence_logit_per_vote = chunks[3] + biases[2]    # (B, O, V)
        scale_per_vote = chunks[4] + biases[3]             # (B, O, V)

        if parent_transform is None:
            cvr = self._make_transform_flat(cvr)  # (B, O, 1, 6)
        else:
            # hook contract is a homogeneous matrix; drop the [0,0,1] row
            cvr = parent_transform[..., :2, :].reshape(
                *parent_transform.shape[:-2], 6)

        # vote = OVR @ OPR (reference object_decoder.py:189-191), composed
        # on the 6 affine coefficients (see ops.geometry.compose_affines:
        # batched 3x3 matmuls lower to padded TPU convolutions). The
        # homogeneous row is appended as a constant; the downstream
        # flatten (CapsuleObjectDecoder) slices it back off, so XLA
        # elides the concat entirely in the training graph.
        vote = affine_to_matrix(
            compose_affines(cvr, cpr))  # (B, O, V, 3, 3)

        if self.caps_dropout_rate > 0.0:
            presence_logit_per_caps = (presence_logit_per_caps
                                       + log_safe(caps_exist))

        def add_noise(t):
            if deterministic or not self.noise_type:
                return t
            key = self.make_rng("noise")
            if self.noise_type == "uniform":
                return t + (jax.random.uniform(key, t.shape, t.dtype) - 0.5) \
                    * self.noise_scale
            if self.noise_type == "logistic":
                return t + jax.random.logistic(key, t.shape, t.dtype) \
                    * self.noise_scale
            raise ValueError(f"Invalid noise type: {self.noise_type}")

        presence_logit_per_caps = add_noise(presence_logit_per_caps)
        presence_logit_per_vote = add_noise(presence_logit_per_vote)

        if parent_presence is not None:
            presence_per_caps = parent_presence
        else:
            presence_per_caps = jax.nn.sigmoid(presence_logit_per_caps)

        vote_presence = (presence_per_caps
                         * jax.nn.sigmoid(presence_logit_per_vote))

        if self.learn_vote_scale:
            scale_per_vote = jax.nn.softplus(scale_per_vote + 0.5) + 1e-2
        else:
            scale_per_vote = jnp.ones_like(scale_per_vote)

        return CapsuleLayerResult(
            vote=vote,
            scale=scale_per_vote,
            vote_presence=vote_presence,
            presence_logit_per_caps=presence_logit_per_caps,
            presence_logit_per_vote=presence_logit_per_vote,
            cpr_dynamic_reg_loss=cpr_dynamic_reg_loss,
        )

    def _make_transform_flat(self, params):
        return geometric_transform(params, self.similarity_transform,
                                   nonlinear=True, as_matrix=False)


def capsule_likelihood(vote, scale, vote_presence, dummy_vote, x,
                       presence=None):
    """Capsule mixture likelihood + winner routing (object_decoder.py:243-372).

    Args:
      vote: (B, O, M, P) candidate poses per object capsule.
      scale: (B, O, M) per-vote Gaussian scales.
      vote_presence: (B, O, M).
      dummy_vote: (1, 1, M, P) learned dummy component.
      x: (B, M, P) target part poses.
      presence: optional (B, M) part presences.
    """
    B, n_input_points, dim_in = x.shape  # B, M, P

    vote_log_prob = jnp.sum(
        normal_log_prob(x[:, None], vote, scale[..., None]), axis=-1
    )  # (B, O, M)

    dummy_vote_log_prob = jnp.full((B, 1, n_input_points), _LOG_001,
                                   vote_log_prob.dtype)
    vote_log_prob = jnp.concatenate([vote_log_prob, dummy_vote_log_prob],
                                    axis=1)  # (B, O+1, M)

    dummy_logit = jnp.full((B, 1, n_input_points), _LOG_001,
                           vote_log_prob.dtype)
    mixing_logit = jnp.concatenate([log_safe(vote_presence), dummy_logit],
                                   axis=1)  # (B, O+1, M)
    mixing_log_prob = mixing_logit - jax.nn.logsumexp(mixing_logit, axis=1,
                                                      keepdims=True)

    vote_presence_binary = (mixing_logit[:, :-1]
                            > mixing_logit[:, -1:]).astype(x.dtype)

    posterior_mixing_logits_per_point = mixing_logit + vote_log_prob

    mixture_log_prob_per_point = jax.nn.logsumexp(
        posterior_mixing_logits_per_point, axis=1)  # (B, M)
    if presence is not None:
        mixture_log_prob_per_point = mixture_log_prob_per_point * presence
    log_prob = jnp.mean(jnp.sum(mixture_log_prob_per_point, axis=1))

    # hard winner (argmax over real capsules only)
    winning_vote_idx = jnp.argmax(
        posterior_mixing_logits_per_point[:, :-1], axis=1)  # (B, M)
    idx = winning_vote_idx[:, None, :, None]  # (B, 1, M, 1)
    winning_vote = jnp.squeeze(
        jnp.take_along_axis(vote, idx, axis=1), axis=1)  # (B, M, P)
    winning_presence = jnp.squeeze(
        jnp.take_along_axis(vote_presence, winning_vote_idx[:, None, :],
                            axis=1), axis=1)  # (B, M)

    # replicated reference quirk (object_decoder.py:334, SURVEY §2.4(5));
    # never consumed downstream
    is_from_capsule = winning_vote_idx // n_input_points

    # soft winner
    posterior_mixing_prob = jax.nn.softmax(
        posterior_mixing_logits_per_point, axis=1)  # (B, O+1, M)
    dummy_b = jnp.broadcast_to(dummy_vote, (B, 1, n_input_points, dim_in))
    votes_full = jnp.concatenate([vote, dummy_b], axis=1)  # (B, O+1, M, P)
    vote_presence_full = jnp.concatenate(
        [vote_presence, jnp.zeros((B, 1, n_input_points), x.dtype)], axis=1)

    soft_winner = jnp.sum(posterior_mixing_prob[..., None] * votes_full,
                          axis=1)  # (B, M, P)
    soft_winner_presence = jnp.sum(
        posterior_mixing_prob * vote_presence_full, axis=1)  # (B, M)

    return CapsuleLikelihoodResult(
        log_prob=log_prob,
        vote_presence_binary=vote_presence_binary,
        winner=winning_vote,
        winner_presence=winning_presence,
        soft_winner=soft_winner,
        soft_winner_presence=soft_winner_presence,
        posterior_mixing_prob=posterior_mixing_prob[:, :-1],
        mixing_log_prob=mixing_log_prob,
        mixing_logit=mixing_logit,
        is_from_capsule=is_from_capsule,
    )


class CapsuleObjectDecoder(nn.Module):
    """Glue: CapsuleLayer + capsule likelihood (object_decoder.py:375-428)."""

    capsule_layer: CapsuleLayer

    @property
    def n_obj_capsules(self) -> int:
        return self.capsule_layer.n_caps

    @nn.compact
    def __call__(self, obj_encoding, part_pose, part_presence=None,
                 deterministic: bool = True):
        """
        Args:
          obj_encoding: (B, O, F)
          part_pose: (B, M, P)
          part_presence: optional (B, M)
        """
        B, O = obj_encoding.shape[:2]
        V = part_pose.shape[1]
        P = self.capsule_layer.n_transform_params

        dummy_vote = self.param("dummy_vote", nn.initializers.zeros,
                                (1, 1, self.capsule_layer.n_votes, P))

        res = self.capsule_layer(obj_encoding, deterministic=deterministic)

        # drop homogeneous row, flatten to (B, O, V, 6)
        vote_flat = res.vote[..., :-1, :].reshape(B, O, V, P)
        caps_presence = jnp.max(res.vote_presence, axis=-1)  # (B, O)

        ll = capsule_likelihood(vote_flat, res.scale, res.vote_presence,
                                dummy_vote, part_pose, part_presence)

        return ObjectDecoderResult(
            vote=vote_flat,
            scale=res.scale,
            vote_presence=res.vote_presence,
            presence_logit_per_caps=res.presence_logit_per_caps,
            presence_logit_per_vote=res.presence_logit_per_vote,
            cpr_dynamic_reg_loss=res.cpr_dynamic_reg_loss,
            caps_presence=caps_presence,
            log_prob=ll.log_prob,
            vote_presence_binary=ll.vote_presence_binary,
            winner=ll.winner,
            winner_presence=ll.winner_presence,
            soft_winner=ll.soft_winner,
            soft_winner_presence=ll.soft_winner_presence,
            posterior_mixing_prob=ll.posterior_mixing_prob,
            mixing_log_prob=ll.mixing_log_prob,
            mixing_logit=ll.mixing_logit,
            is_from_capsule=ll.is_from_capsule,
        )


# ---------------------------------------------------------------------------
# capsule-presence sparsity regularizers (object_decoder.py:431-493)
# ---------------------------------------------------------------------------

def capsule_l2_loss(caps_presence, n_classes: int,
                    within_example_constant=None, **unused_kwargs):
    """Prior sparsity: l2(aggregated presence - constant)."""
    del unused_kwargs
    B, num_caps = caps_presence.shape
    if within_example_constant is None:
        within_example_constant = float(num_caps) / n_classes
    within = jnp.mean(
        jnp.square(jnp.sum(caps_presence, 1) - within_example_constant))
    between_constant = float(B) / n_classes
    between = jnp.mean(
        jnp.square(jnp.sum(caps_presence, 0) - between_constant))
    return within, between


def capsule_entropy_loss(caps_presence, k=1, **unused_kwargs):
    """Posterior sparsity: within/between normalized cross-entropy."""
    del unused_kwargs
    within_prob = normalize(caps_presence, 1)
    within = cross_entropy_safe(within_prob, within_prob * k)
    total = jnp.sum(caps_presence, 0)
    between_prob = normalize(total, 0)
    between = cross_entropy_safe(between_prob, between_prob * k)
    return within, -between


def neg_capsule_kl(caps_presence, **unused_kwargs):
    del unused_kwargs
    n_caps = int(caps_presence.shape[-1])
    return capsule_entropy_loss(caps_presence, k=n_caps)


def sparsity_loss(loss_type, *args, **kwargs):
    if loss_type == "l2":
        return capsule_l2_loss(*args, **kwargs)
    if loss_type == "entropy":
        return capsule_entropy_loss(*args, **kwargs)
    if loss_type == "kl":
        return neg_capsule_kl(*args, **kwargs)
    raise ValueError(f"Invalid sparsity loss: {loss_type}")
