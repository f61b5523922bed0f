"""PCAE encoder: image -> part capsules (pose, presence, special features).

Parity target: reference ``torch_scae/part_encoder.py``:
  * CNNEncoder = valid-padded Conv2dStack (part_encoder.py:26-44)
  * learned additive grid bias on the embedding (part_encoder.py:76-79,91)
  * 1x1 conv to M*(P+1+S+1) channels (part_encoder.py:83-84,92)
  * per-capsule attention pooling over pixels (part_encoder.py:93)
  * split -> pose / presence-logit / feature (part_encoder.py:98)
  * train-time uniform presence-logit noise (rand-0.5)*noise_scale
    (part_encoder.py:105-107) — here drawn from an explicit PRNG key via
    the 'noise' rng collection, disabled when deterministic=True
  * sigmoid presence; geometric_transform on pose (part_encoder.py:109-110)

Shape inference replaces the reference's dummy-forward ``measure_shape``
(nn_utils.py:48-52) with static arithmetic (valid conv output sizes).
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scae_tpu.models.layers import Conv2dStack, TorchConv2d
from scae_tpu.models.results import PartEncoderResult
from scae_tpu.ops.geometry import geometric_transform
from scae_tpu.ops.pooling import multiple_attention_pooling_2d


def conv_output_size(size: int, kernel: int, stride: int) -> int:
    """Valid-padding conv output size (reference nn_utils.py:23-27, p=0)."""
    return (size - kernel) // stride + 1


class CNNEncoder(nn.Module):
    """Stack of valid-padded convs; NCHW in/out."""

    input_shape: Tuple[int, int, int]          # (C, H, W)
    out_channels: Sequence[int]
    kernel_sizes: Sequence[int]
    strides: Sequence[int]
    activate_final: bool = True
    compute_dtype: Optional[str] = None        # e.g. 'bfloat16'

    @property
    def output_shape(self) -> Tuple[int, int, int]:
        _, h, w = self.input_shape
        for k, s in zip(self.kernel_sizes, self.strides):
            h = conv_output_size(h, k, s)
            w = conv_output_size(w, k, s)
        return (self.out_channels[-1], h, w)

    @nn.compact
    def __call__(self, image):  # (B, C, H, W)
        return Conv2dStack(
            out_channels=tuple(self.out_channels),
            kernel_sizes=tuple(self.kernel_sizes),
            strides=tuple(self.strides),
            activate_final=self.activate_final,
            compute_dtype=self.compute_dtype,
            name="network",
        )(image)


class CapsuleImageEncoder(nn.Module):
    """Image -> M part capsules with 6-d pose, presence and S features."""

    input_shape: Tuple[int, int, int]  # (C, H, W)
    encoder: CNNEncoder
    n_caps: int                        # M
    n_poses: int = 6                   # P
    n_special_features: int = 16       # S
    noise_scale: float = 4.0
    similarity_transform: bool = False

    @nn.compact
    def __call__(self, image, deterministic: bool = True):
        B = image.shape[0]
        M, P, S = self.n_caps, self.n_poses, self.n_special_features
        n_dims = P + 1 + S

        img_embedding = self.encoder(image)  # (B, D, G, G)

        bias = self.param("img_embedding_bias", nn.initializers.zeros,
                          self.encoder.output_shape)
        h = img_embedding + bias[None]
        h = TorchConv2d(M * (n_dims + 1), kernel_size=1, stride=1,
                        name="att_conv")(h)           # (B, M*(P+1+S+1), G, G)
        h = multiple_attention_pooling_2d(h, M)       # (B, M*(P+1+S), 1, 1)
        h = h.reshape(B, M, n_dims)

        pose = h[..., :P]
        presence_logit = h[..., P]
        feature = h[..., P + 1:] if S > 0 else None

        if not deterministic and self.noise_scale > 0.0:
            key = self.make_rng("noise")
            noise = (jax.random.uniform(key, presence_logit.shape,
                                        presence_logit.dtype) - 0.5)
            presence_logit = presence_logit + noise * self.noise_scale

        presence = jax.nn.sigmoid(presence_logit)
        pose = geometric_transform(pose, self.similarity_transform)
        return PartEncoderResult(pose=pose, presence=presence, feature=feature)
