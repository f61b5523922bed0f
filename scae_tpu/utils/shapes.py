"""Shape inference utilities (reference nn_utils.py equivalents).

The reference infers module output shapes by running a dummy forward with
a random one-sample batch at construction time (measure_shape,
nn_utils.py:48-52) — a host-side compute. The JAX-native equivalent is
``jax.eval_shape``: abstract evaluation, no FLOPs, no RNG side effects.
"""

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp


def conv_output_size(size: int, kernel: int, stride: int = 1,
                     padding: int = 0, dilation: int = 1) -> int:
    """torch Conv2d output-size arithmetic (reference nn_utils.py:23-27)."""
    return (size + 2 * padding - dilation * (kernel - 1) - 1) // stride + 1


def conv_output_shape(hw: Tuple[int, int], kernel, stride=1, padding=0,
                      dilation=1) -> Tuple[int, int]:
    """(H, W) output shape for a conv (reference nn_utils.py:30-45)."""
    def pair(v):
        return v if isinstance(v, (tuple, list)) else (v, v)

    k, s, p, d = pair(kernel), pair(stride), pair(padding), pair(dilation)
    return (conv_output_size(hw[0], k[0], s[0], p[0], d[0]),
            conv_output_size(hw[1], k[1], s[1], p[1], d[1]))


def measure_shape(apply_fn: Callable, input_shape: Sequence[int],
                  dtype=jnp.float32) -> Tuple[int, ...]:
    """Output shape of ``apply_fn`` on a 1-sample batch of ``input_shape``
    — via jax.eval_shape (no execution), replacing the reference's dummy
    forward (nn_utils.py:48-52). Returns the shape without the batch dim.
    """
    spec = jax.ShapeDtypeStruct((1, *input_shape), dtype)
    out = jax.eval_shape(apply_fn, spec)
    return tuple(out.shape[1:])
