"""PCAE decoder: learned templates + affine warp -> pixel GMM.

Parity targets:
  * TemplateGenerator (reference part_decoder.py:31-110): template logits
    (1, M, C, Ht, Wt) initialized by QR-orthogonalization of a uniform
    random square matrix, min-max normalized to [0,1]
    (part_decoder.py:60-68); optional per-capsule color MLP [F,32,C] driven
    by special features with the +.99 pre-shift when color_nonlin is relu1
    (part_decoder.py:71-73,97-98).
  * TemplateBasedImageDecoder (reference part_decoder.py:113-243):
    per-template affine warp (here the matmul-form bilinear warp from
    scae_tpu.ops.warp instead of affine_grid/grid_sample,
    part_decoder.py:179-183), appended background component
    (part_decoder.py:189-195), alpha-channel or temperature mixing logits
    (part_decoder.py:198-217), optional learned output scale
    (part_decoder.py:220-223), presence folded into mixing logits via
    log_safe (part_decoder.py:225-231), GaussianMixture pdf
    (part_decoder.py:233-237).

One TPU-native divergence: with use_alpha_channel, mixing logits keep their
broadcastable (B, M+1, 1, H, W) channel dim instead of materializing C
copies — identical numerics under broadcasting, less HBM traffic.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scae_tpu.models.layers import MLP, choose_activation
from scae_tpu.models.results import PartDecoderResult, TemplateResult
from scae_tpu.ops.gmm import GaussianMixture
from scae_tpu.ops.math_ops import log_safe
from scae_tpu.ops.warp import bilinear_weight_matrices


def _qr_template_init(n_templates, n_channels, template_size):
    """QR-orthogonal template init (reference part_decoder.py:60-68)."""
    shape = (1, n_templates, n_channels, *template_size)
    n_elems = n_channels * template_size[0] * template_size[1]
    n = max(n_templates, n_elems)

    def init(key, *_):
        q = jax.random.uniform(key, (n, n), jnp.float32)
        q = jnp.linalg.qr(q)[0]
        q = q[:n_templates, :n_elems].reshape(shape)
        return (q - q.min()) / (q.max() - q.min())

    return init, shape


class TemplateGenerator(nn.Module):
    """Learns M part templates; optionally colorizes them per input."""

    n_templates: int                 # M
    n_channels: int                  # C
    template_size: Tuple[int, int]   # (Ht, Wt)
    template_nonlin: str = "relu1"
    dim_feature: Optional[int] = None  # F
    colorize_templates: bool = False
    color_nonlin: str = "relu1"

    @nn.compact
    def __call__(self, feature=None, batch_size=None):
        if feature is not None:
            batch_size = feature.shape[0]

        init, shape = _qr_template_init(self.n_templates, self.n_channels,
                                        self.template_size)
        template_logits = self.param("template_logits", init, shape)
        template_nonlin = choose_activation(self.template_nonlin)
        raw_templates = template_nonlin(template_logits)  # (1, M, C, Ht, Wt)

        if self.colorize_templates and feature is not None:
            color_nonlin = choose_activation(self.color_nonlin)
            # (B, M, F) -> (B, M, C); the reference flattens to (B*M, F)
            # for its MLP — identical math, we keep the capsule axis.
            template_color = MLP(
                sizes=(self.dim_feature, 32, self.n_channels),
                name="templates_color_mlp",
            )(feature)
            if self.color_nonlin == "relu1":
                template_color = template_color + 0.99
            template_color = color_nonlin(template_color)
            templates = raw_templates * template_color[:, :, :, None, None]
        else:
            templates = jnp.broadcast_to(
                raw_templates,
                (batch_size, *raw_templates.shape[1:]))

        return TemplateResult(raw_templates=raw_templates, templates=templates)


class TemplateBasedImageDecoder(nn.Module):
    """Renders part capsules to an image as a per-pixel Gaussian mixture."""

    n_templates: int                  # M
    template_size: Tuple[int, int]    # (Ht, Wt)
    output_size: Tuple[int, int]      # (H, W)
    learn_output_scale: bool = False
    use_alpha_channel: bool = False
    background_value: bool = True
    # fused custom-VJP reconstruction log-likelihood: avoids the
    # bandwidth-bound autodiff backward of warp+GMM. Applies when a target
    # is passed, alpha-channel mixing is on, and no bg_image is given.
    # fused_impl selects the implementation:
    #   'xla'    — ops/decoder_ll.py (einsum form; tap dtype 'bfloat16'
    #              halves the dominant HBM traffic, 'float32' for strict
    #              numerical parity)
    #   'pallas' — ops/pallas_decoder_ll.py (dense single-kernel v4;
    #              tap-sized tensors never touch HBM; f32 numerics)
    #   'pallas_banded' — ops/pallas_decoder_ll_banded.py (windowed row
    #              loops; exact but measured SLOWER than 'pallas' —
    #              kept for the record, tools/probe_banded.py)
    #   'gather' — ops/pallas_decoder_ll_gather.py (exact 4-tap warp via
    #              per-lane dynamic gather; fastest: 2.4x over 'pallas'
    #              at the flagship shape; needs Ht*Wt <= 256)
    #   'auto'   — 'gather' when the template fits its 256-texel table
    #              AND running on a real TPU, else 'xla'
    use_fused_ll: bool = True
    fused_tap_dtype: str = "float32"
    fused_impl: str = "auto"

    @nn.compact
    def __call__(self, templates, pose, presence=None, bg_image=None,
                 target=None):
        """
        Args:
          templates: (B, M, C, Ht, Wt)
          pose: (B, M, 6) flat affine transforms
          presence: optional (B, M)
          bg_image: optional (B, C, H, W)
          target: optional (B, C, H, W) reconstruction target; when given,
            the result's ``target_ll`` holds the per-pixel mixture
            log-likelihood (fused fast path when eligible).

        Returns:
          PartDecoderResult with M+1 mixture components (background last).
        """
        B, M, C, Ht, Wt = templates.shape
        H, W = self.output_size
        P = H * W

        # Shared bilinear tap weights for template and alpha warps.
        # Layout: taps second-to-last, pixels last (lane axis) — see
        # ops/warp.py for why this matters on TPU.
        Wx, Wy = bilinear_weight_matrices(pose, (Ht, Wt), (H, W))

        def warp(t):  # t: (B, M, c, Ht, Wt) -> (B, M, c, H, W)
            s = jnp.einsum("bmchw,bmwp->bmchp", t, Wx)
            out = jnp.einsum("bmchp,bmhp->bmcp", s, Wy)
            return out.reshape(B, M, t.shape[2], H, W)

        transformed_templates = warp(templates)  # (B, M, C, H, W)

        if bg_image is not None:
            bg = bg_image[:, None]  # (B, 1, C, H, W)
        else:
            bg_value = self.param("bg_value", nn.initializers.zeros, (1,))
            bg = jnp.broadcast_to(jax.nn.sigmoid(bg_value)[0],
                                  (B, 1, C, H, W))

        transformed_templates = jnp.concatenate(
            [transformed_templates, bg], axis=1)  # (B, M+1, C, H, W)

        if self.use_alpha_channel:
            alpha = self.param("templates_alpha", nn.initializers.zeros,
                               (1, M, 1, Ht, Wt))
            alpha_b = jnp.broadcast_to(alpha, (B, M, 1, Ht, Wt))
            alpha_logits = warp(alpha_b)  # (B, M, 1, H, W)

            bg_mixing_logit = self.param("bg_mixing_logit",
                                         nn.initializers.zeros, (1,))
            bg_logit = jnp.broadcast_to(
                jax.nn.softplus(bg_mixing_logit)[0], (B, 1, 1, H, W))
            template_mixing_logits = jnp.concatenate(
                [alpha_logits, bg_logit], axis=1)  # (B, M+1, 1, H, W)
        else:
            # torch init: temperature_logit ~ U[0, 1) (part_decoder.py:140)
            temperature_logit = self.param(
                "temperature_logit",
                lambda k, s: jax.random.uniform(k, s, jnp.float32), (1,))
            temperature = jax.nn.softplus(temperature_logit + 0.5) + 1e-4
            template_mixing_logits = transformed_templates / temperature

        if self.learn_output_scale:
            scale_param = self.param(
                "scale", lambda k, s: jax.random.uniform(k, s, jnp.float32),
                (1,))
            scale = jax.nn.softplus(scale_param) + 1e-4
        else:
            scale = jnp.asarray([1.0], dtype=templates.dtype)

        if presence is not None:
            bg_presence = jnp.ones((B, 1), presence.dtype)
            full_presence = jnp.concatenate([presence, bg_presence], axis=1)
            extra_dims = (1,) * (template_mixing_logits.ndim - 2)
            full_presence = full_presence.reshape(B, M + 1, *extra_dims)
            template_mixing_logits = (template_mixing_logits
                                      + log_safe(full_presence))

        pdf = GaussianMixture.make_from_stats(
            loc=transformed_templates,
            scale=scale,
            mixing_logits=template_mixing_logits,
        )

        target_ll = None
        if target is not None:
            if (self.use_fused_ll and self.use_alpha_channel
                    and bg_image is None):
                full_presence = presence if presence is not None \
                    else jnp.ones((B, M), templates.dtype)
                fused_args = (templates, alpha, pose, full_presence,
                              jax.nn.sigmoid(bg_value)[0],
                              jax.nn.softplus(bg_mixing_logit)[0],
                              scale, target)
                impl = self.fused_impl
                if impl == "auto":
                    from scae_tpu.ops.pallas_decoder_ll_gather import (
                        supports as gather_supports,
                    )

                    # gather needs (a) the template to fit its texel
                    # table, (b) a real TPU (interpret mode would
                    # crawl). Multi-device sharding is handled: the
                    # kernel carries a batch-dim custom_partitioning
                    # rule (pallas_decoder_ll_gather.py), so dp-sharded
                    # jit runs execute it per-shard
                    impl = ("gather"
                            if gather_supports((Ht, Wt))
                            and jax.default_backend() == "tpu"
                            else "xla")
                if impl == "gather":
                    from scae_tpu.ops.pallas_decoder_ll_gather import (
                        pallas_decoder_ll_gather,
                    )

                    target_ll = pallas_decoder_ll_gather(
                        *fused_args, tuple(self.output_size))
                elif impl == "pallas_banded":
                    from scae_tpu.ops.pallas_decoder_ll_banded import (
                        pallas_decoder_ll_banded,
                    )

                    target_ll = pallas_decoder_ll_banded(
                        *fused_args, tuple(self.output_size))
                elif impl == "pallas":
                    from scae_tpu.ops.pallas_decoder_ll import (
                        pallas_decoder_ll,
                    )

                    target_ll = pallas_decoder_ll(
                        *fused_args, tuple(self.output_size))
                else:
                    from scae_tpu.ops.decoder_ll import fused_decoder_ll

                    target_ll = fused_decoder_ll(
                        *fused_args, tuple(self.output_size),
                        jnp.dtype(self.fused_tap_dtype).type)
            else:
                target_ll = pdf.log_prob(target)

        return PartDecoderResult(
            transformed_templates=transformed_templates,
            mixing_logits=template_mixing_logits,
            pdf=pdf,
            target_ll=target_ll,
        )
