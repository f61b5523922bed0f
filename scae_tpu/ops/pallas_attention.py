"""Pallas TPU kernel: fused presence-masked set attention.

One kernel computes softmax((Q K^T - (1-presence)*MASK)/sqrt(d)) V for a
block of batch rows, keeping routing logits entirely in VMEM — the XLA
path materializes the (B, N, M) routing tensor in HBM twice (logits +
softmax). It exists as the blockwise-capable building block the survey
plan calls for (SURVEY.md §2.3 "sequence parallel" row: the interface
takes the same presence mask as ``qkv_attention``), sized so each
(batch-block, N, M, d) tile fits VMEM.

**Status (round 3): documented NEGATIVE result.** TPU-measured in-step
A/B at the flagship config: 0.946x (4.27 -> 4.52 ms/step); in the
ISAB regime it was built for (n_inducing_points=256): 0.801x. XLA's
own fusion wins at every SCAE-relevant shape, as SURVEY §2.3 predicted
for N <= 64 sets (op-level micro-bench through the tunneled link is
dispatch-bound and inconclusive; the in-step numbers decide). The
factory knob was removed; ``qkv_attention(..., use_pallas=True)`` and
the testing-only ``SetTransformer(use_pallas_attention=...)`` flag
remain so tests pin the kernel's numerics (BASELINE.md round-3 entry).

On non-TPU backends the kernel runs in Pallas interpreter mode
automatically (tests/test_pallas_attention.py validates numerics there);
on the TPU it compiles natively (round-2 probe, tools/pallas_probe.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scae_tpu.ops.attention import _MASK


def _round_up(x, m):
    return -(-x // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, presence_ref, o_ref, *,
                      scale, n_real, m_real):
    """One batch element per program.

    Block shapes carry a leading singleton batch dim:
    q_ref: (1, N, dk), k_ref: (1, M, dk), v_ref: (1, M, dv),
    presence_ref: (1, 1, M), o_ref: (1, N, dv). Padding masked out.
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    presence = presence_ref[0, 0, :]

    routing = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (N, M)
    routing = routing - (1.0 - presence)[None, :] * _MASK

    # mask padded key columns entirely
    m_ids = jax.lax.broadcasted_iota(jnp.int32, routing.shape, 1)
    routing = jnp.where(m_ids < m_real, routing, -jnp.inf)

    att = jax.nn.softmax(routing * scale, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        att, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def pallas_qkv_attention(queries, keys, values, presence=None,
                         interpret=None):
    """Drop-in fused version of ops.attention.qkv_attention.

    queries: (B, N, dk); keys: (B, M, dk); values: (B, M, dv);
    presence: optional (B, M). Mask-before-scale order matches the
    reference (set_transformer.py:40-43). ``interpret=None`` auto-selects
    interpreter mode on non-TPU backends.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, dk = queries.shape
    M, dv = values.shape[1:]
    scale = 1.0 / (dk ** 0.5)

    if presence is None:
        presence = jnp.ones((B, M), queries.dtype)

    Np, Mp = _round_up(N, 8), _round_up(M, 128)
    dkp, dvp = _round_up(dk, 128), _round_up(dv, 128)

    def pad(x, shape):
        return jnp.pad(x, [(0, s - d) for s, d in zip(shape, x.shape)])

    q = pad(queries, (B, Np, dkp))
    k = pad(keys, (B, Mp, dkp))
    v = pad(values, (B, Mp, dvp))
    p = pad(presence, (B, Mp))[:, None, :]           # (B, 1, Mp)

    kernel = functools.partial(_attention_kernel, scale=scale, n_real=N,
                               m_real=M)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Np, dkp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, dkp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, dvp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Mp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Np, dvp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, dvp), jnp.float32),
        interpret=interpret,
    )(q, k, v, p)

    return out[:, :N, :dv]
