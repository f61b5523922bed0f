"""Presence-masked scaled dot-product attention (functional core).

Parity target: reference ``torch_scae/set_transformer.py:24-47``:
the presence mask is *subtracted before* the 1/sqrt(d_k) scaling
(routing -= (1-presence)*1e32; softmax(routing/sqrt(d_k))). We reproduce
that order exactly, with a mask constant chosen to survive the divide.

Set sizes here are tiny (M<=64), so the default path is plain jnp and lets
XLA fuse; :mod:`scae_tpu.ops.pallas_attention` provides an optional fused
kernel for larger blockwise workloads.
"""

import jax
import jax.numpy as jnp


# Presence-mask penalty. The reference subtracts (1-presence)*1e32
# (set_transformer.py:42); constants >=1e20 trip NaN-producing fusions in
# XLA's CPU backend and add nothing numerically: any penalty >> 87*sqrt(d)
# already underflows the softmax exp to exactly 0 in f32, so 1e9 yields
# bit-identical attention weights on every reachable input (verified by
# the golden parity tests against the torch reference).
_MASK = 1e9


def qkv_attention(queries, keys, values, presence=None,
                  use_pallas: bool = False):
    """softmax((Q K^T - (1-presence)*1e32) / sqrt(d_k)) V.

    Args:
      queries: [B, N, d_k]
      keys:    [B, M, d_k]
      values:  [B, M, d_v]
      presence: optional [B, M] soft mask in [0, 1].
      use_pallas: route through the fused Pallas kernel
        (ops.pallas_attention; interpreter mode off-TPU).

    Returns:
      [B, N, d_v]
    """
    if use_pallas:
        if presence is None:
            presence = jnp.ones(keys.shape[:2], queries.dtype)
        return _pallas_attention_trainable(queries, keys, values, presence)
    return _qkv_attention_jnp(queries, keys, values, presence)


def _qkv_attention_jnp(queries, keys, values, presence):
    d_k = queries.shape[-1]
    routing = jnp.einsum("bnd,bmd->bnm", queries, keys)
    if presence is not None:
        routing = routing - (1.0 - presence[..., None, :]) * _MASK
    routing = jax.nn.softmax(routing / jnp.sqrt(jnp.asarray(d_k, routing.dtype)),
                             axis=-1)
    return jnp.einsum("bnm,bmv->bnv", routing, values)


@jax.custom_vjp
def _pallas_attention_trainable(queries, keys, values, presence):
    """Pallas forward + XLA-path backward.

    The fused kernel has no hand-written VJP; since it computes exactly
    the same function as the jnp path, the backward recomputes through
    the jnp path's autodiff (attention here is tiny — M, N <= 64 — so
    the recompute is cheap and the gradients are consistent)."""
    from scae_tpu.ops.pallas_attention import pallas_qkv_attention

    return pallas_qkv_attention(queries, keys, values, presence)


def _pallas_attn_fwd(queries, keys, values, presence):
    out = _pallas_attention_trainable(queries, keys, values, presence)
    return out, (queries, keys, values, presence)


def _pallas_attn_bwd(res, g):
    queries, keys, values, presence = res
    _, vjp = jax.vjp(_qkv_attention_jnp, queries, keys, values, presence)
    return vjp(g)


_pallas_attention_trainable.defvjp(_pallas_attn_fwd, _pallas_attn_bwd)
