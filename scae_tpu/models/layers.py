"""Thin Linen building blocks with PyTorch-default initialization parity.

The reference relies on torch's default inits everywhere (Linear/Conv2d:
kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias; xavier_uniform for learned seeds). Matching them matters
for (a) loading reference weights in parity tests and (b) comparable
optimization dynamics. See SURVEY.md §7 "Hard parts" (2).

Also provides the MLP / Conv2dStack factories (reference nn_ext.py:19-59)
and the *stacked* MLP bank that replaces the reference's Python loop over
O per-capsule MLPs (object_decoder.py:86-107,137-157) with batched einsums
that keep per-capsule independent weights.
"""

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from scae_tpu.ops.math_ops import relu1

# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch kaiming_uniform(a=sqrt(5)).
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch Linear/Conv bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def xavier_uniform_torch(fan_in: int, fan_out: int):
    """torch nn.init.xavier_uniform_ with explicitly supplied fans.

    torch computes fans from tensor dims ((1, N, D) -> fan_in=N*D,
    fan_out=D — set_transformer.py:205-207); flax's heuristics differ, so
    fans are passed explicitly.
    """
    bound = (6.0 / (fan_in + fan_out)) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def choose_activation(name_or_fn) -> Callable:
    """Activation-by-name lookup (reference nn_utils.py:55-66)."""
    if callable(name_or_fn):
        return name_or_fn
    table = {
        "relu": jax.nn.relu,
        "relu1": relu1,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "softplus": jax.nn.softplus,
        "elu": jax.nn.elu,
        "gelu": jax.nn.gelu,
        "identity": lambda x: x,
    }
    if name_or_fn not in table:
        raise ValueError(f"Unknown activation: {name_or_fn}")
    return table[name_or_fn]


class TorchLinear(nn.Module):
    """nn.Dense with torch-default weight AND bias initialization.

    ``precision`` passes through to the matmul. The classifier heads set
    HIGHEST: on TPU the default MXU path multiplies in bfloat16, whose
    ~1e-2 relative error flips argmax on borderline examples vs the
    float64 sklearn probe those heads are calibrated against (round 5:
    2 of 297 pooled-ensemble examples). At 40x10 the cost is nil.
    """

    features: int
    use_bias: bool = True
    precision: jax.lax.Precision | None = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init,
                            (in_features, self.features))
        y = jnp.matmul(x, kernel, precision=self.precision)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_features),
                              (self.features,))
            y = y + bias
        return y


class TorchConv2d(nn.Module):
    """Valid-padded 2D conv on NCHW inputs with torch-default init.

    Matches torch nn.Conv2d(k, stride, padding=0) as used by the
    reference's Conv2dStack (nn_ext.py:49-52). ``compute_dtype`` casts
    activations+kernel (e.g. to bfloat16) with f32 accumulation — params
    stay f32.
    """

    features: int
    kernel_size: int
    stride: int = 1
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x):  # (B, C, H, W)
        in_ch = x.shape[1]
        k = self.kernel_size
        fan_in = in_ch * k * k
        # HWIO kernel layout for lax; flax variance_scaling computes
        # fan_in = prod(shape[:-2]) * shape[-2] = k*k*in — correct here.
        kernel = self.param("kernel", torch_kernel_init,
                            (k, k, in_ch, self.features))
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
        if self.compute_dtype:
            dt = jnp.dtype(self.compute_dtype)
            x, kernel = x.astype(dt), kernel.astype(dt)
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(self.stride, self.stride),
            padding="VALID",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
        )
        return y.astype(jnp.float32) + bias[None, :, None, None]


class MLP(nn.Module):
    """Sequential Linear+activation stack (reference nn_ext.py:19-31).

    NOTE: like the reference, ``activate_final`` defaults to True — the
    final layer output passes through the activation as well.
    """

    sizes: Sequence[int]           # [in, h1, ..., out]
    activation: Callable = jax.nn.relu
    activate_final: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        n = len(self.sizes)
        assert n >= 2, "There must be at least two sizes"
        for j in range(n - 1):
            x = TorchLinear(self.sizes[j + 1], use_bias=self.use_bias,
                            name=f"linear_{j}")(x)
            if j < n - 2 or self.activate_final:
                x = self.activation(x)
        return x


class Conv2dStack(nn.Module):
    """Sequential conv+activation stack (reference nn_ext.py:34-59)."""

    out_channels: Sequence[int]
    kernel_sizes: Sequence[int]
    strides: Sequence[int]
    activation: Callable = jax.nn.relu
    activate_final: bool = True
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x):  # NCHW
        n = len(self.out_channels)
        assert n == len(self.kernel_sizes) == len(self.strides)
        for i in range(n):
            x = TorchConv2d(self.out_channels[i], self.kernel_sizes[i],
                            self.strides[i], name=f"conv_{i}",
                            compute_dtype=self.compute_dtype)(x)
            if i < n - 1 or self.activate_final:
                x = self.activation(x)
        return x


class StackedMLP(nn.Module):
    """A bank of ``n_stack`` independent MLPs applied to stacked inputs.

    TPU-native replacement for the reference's nn.ModuleList of O separate
    MLPs executed in a Python loop (object_decoder.py:137-139,154-157):
    weights are stored stacked as (O, in, out) and applied with a single
    einsum per layer, so the whole bank is one MXU matmul instead of O
    serial kernel launches. Per-stack weights remain independent (no
    sharing) — each (O, ...) slice is its own draw from the torch-default
    init distribution.

    Input: [..., O, in] -> Output: [..., O, out].
    """

    n_stack: int
    sizes: Sequence[int]
    activation: Callable = jax.nn.relu
    activate_final: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        n = len(self.sizes)
        assert n >= 2
        for j in range(n - 1):
            d_in, d_out = self.sizes[j], self.sizes[j + 1]
            # same per-matrix distribution as torch Linear: fan_in = d_in
            kernel = self.param(
                f"kernel_{j}",
                nn.initializers.variance_scaling(
                    1.0 / 3.0, "fan_in", "uniform", in_axis=-2, out_axis=-1,
                    batch_axis=(0,)),
                (self.n_stack, d_in, d_out),
            )
            x = jnp.einsum("...oi,oij->...oj", x, kernel)
            if self.use_bias:
                bias = self.param(f"bias_{j}", torch_bias_init(d_in),
                                  (self.n_stack, d_out))
                x = x + bias
            if j < n - 2 or self.activate_final:
                x = self.activation(x)
        return x
