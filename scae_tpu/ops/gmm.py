"""Pixel-wise Gaussian mixture over template components.

Parity target: reference ``torch_scae/distributions.py:20-89``
(log_prob = logsumexp over components of Normal log-pdf + mixing log-prob;
mode = argmax one-hot over mixing logits with optional straight-through
gradient; mean = softmax-weighted component means).

Implemented as a frozen pytree dataclass so it can flow through jit
boundaries and be a member of model result structures.
"""

import math

import jax
import jax.numpy as jnp
from flax import struct

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def normal_log_prob(x, loc, scale):
    """Element-wise Normal(loc, scale) log-density (torch.distributions.Normal parity)."""
    var = jnp.square(scale)
    return -jnp.square(x - loc) / (2.0 * var) - jnp.log(scale) - _LOG_SQRT_2PI


@struct.dataclass
class GaussianMixture:
    """Mixture of Gaussians with component axis 1: arrays are [B, K, ...]."""

    loc: jax.Array            # [B, K, ...] component means
    scale: jax.Array          # broadcastable to loc
    mixing_logits: jax.Array  # [B, K, ...]

    @property
    def n_components(self) -> int:
        return self.mixing_logits.shape[1]

    def mixing_log_prob(self):
        return jax.nn.log_softmax(self.mixing_logits, axis=1)

    def mean(self):
        mixing_prob = jax.nn.softmax(self.mixing_logits, axis=1)
        return jnp.sum(mixing_prob * self.loc, axis=1)

    def log_prob(self, x):
        """x: [B, ...] -> per-element mixture log-density [B, ...]."""
        lp = normal_log_prob(x[:, None], self.loc, self.scale)  # [B, K, ...]
        return jax.nn.logsumexp(lp + self.mixing_log_prob(), axis=1)

    def mode(self, straight_through_gradient: bool = False, maximum: bool = False):
        """Argmax-component value per element (reference distributions.py:50-77)."""
        mixing_log_prob = self.mixing_log_prob()
        if maximum:
            mixing_log_prob = mixing_log_prob + normal_log_prob(
                self.loc, self.loc, self.scale)

        mask = jax.nn.one_hot(jnp.argmax(mixing_log_prob, axis=1),
                              mixing_log_prob.shape[1], axis=1,
                              dtype=self.loc.dtype)
        if straight_through_gradient:
            soft = jax.nn.softmax(mixing_log_prob, axis=1)
            mask = jax.lax.stop_gradient(mask - soft) + soft

        return jnp.sum(mask * self.loc, axis=1)

    @classmethod
    def make_from_stats(cls, loc, scale, mixing_logits):
        return cls(loc=loc, scale=jnp.asarray(scale, loc.dtype),
                   mixing_logits=mixing_logits)
