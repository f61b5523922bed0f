"""Presence-masked Set Transformer (OCAE encoder).

Parity target: reference ``torch_scae/set_transformer.py`` (itself derived
from juho-lee/set_transformer): MultiHeadQKVAttention pads head dims up to
a multiple of n_heads (set_transformer.py:60-61); MAB is a residual
attention block with presence re-masking after the residual
(set_transformer.py:118-133), optional LayerNorm (torch eps=1e-5), and an
``h + relu(fc(h))`` feed-forward; SAB/ISAB/PMA wrap MAB; SetTransformer is
fc1 -> n_layers x SAB/ISAB -> fc2 -> learned seeds -> final multi-head
attention (set_transformer.py:174-223).

TPU-native shape choice: heads are kept as a tensor axis and contracted
with einsums rather than reshaped into a (H*B) pseudo-batch
(set_transformer.py:95-103) — identical math, no transposes/copies.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from scae_tpu.models.layers import TorchLinear, xavier_uniform_torch
from scae_tpu.ops.attention import _MASK


class MultiHeadQKVAttention(nn.Module):
    """Multi-head attention with the reference's mask-before-scale order.

    ``use_pallas`` routes the per-head attention through the fused Pallas
    kernel (ops/pallas_attention.py) with heads folded into the batch;
    identical math to the einsum path (mask-before-scale included).
    """

    d_k: int
    d_v: int
    n_heads: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, queries, keys, values, presence=None):
        H = self.n_heads
        d_k_p = -(-self.d_k // H) * H  # pad to multiple of heads
        d_v_p = -(-self.d_v // H) * H

        # Fused projections: at these dims (d<=32, N<=64) each dot is a
        # ~1-2 us TPU op whose issue overhead dominates — the traced set
        # transformer was 146 ops/219 us per step. Shared-input
        # projections merge into one matmul (same math: concatenated
        # output columns; torch-default init depends only on fan_in, so
        # the init distribution is unchanged). q==k==v in SAB; k==v in
        # ISAB/PMA/the final pooling attention. torch_port concatenates
        # the reference's separate weights to import checkpoints.
        if queries is keys and keys is values:
            qkv = TorchLinear(2 * d_k_p + d_v_p,
                              name="qkv_projector")(queries)
            q = qkv[..., :d_k_p]
            k = qkv[..., d_k_p:2 * d_k_p]
            v = qkv[..., 2 * d_k_p:]
        elif keys is values:
            q = TorchLinear(d_k_p, name="q_projector")(queries)
            kv = TorchLinear(d_k_p + d_v_p, name="kv_projector")(keys)
            k = kv[..., :d_k_p]
            v = kv[..., d_k_p:]
        else:
            q = TorchLinear(d_k_p, name="q_projector")(queries)
            k = TorchLinear(d_k_p, name="k_projector")(keys)
            v = TorchLinear(d_v_p, name="v_projector")(values)

        B, N, _ = q.shape
        M = k.shape[1]
        q = q.reshape(B, N, H, d_k_p // H)
        k = k.reshape(B, M, H, d_k_p // H)
        v = v.reshape(B, M, H, d_v_p // H)

        if self.use_pallas:
            # qkv_attention(use_pallas=True): Pallas forward with the
            # jnp path's VJP, so the flag is trainable (ops/attention.py)
            from scae_tpu.ops.attention import qkv_attention

            qh = q.transpose(0, 2, 1, 3).reshape(B * H, N, d_k_p // H)
            kh = k.transpose(0, 2, 1, 3).reshape(B * H, M, d_k_p // H)
            vh = v.transpose(0, 2, 1, 3).reshape(B * H, M, d_v_p // H)
            ph = None if presence is None else jnp.repeat(presence, H,
                                                          axis=0)
            oh = qkv_attention(qh, kh, vh, ph,
                               use_pallas=True).astype(q.dtype)
            o = oh.reshape(B, H, N, d_v_p // H).transpose(0, 2, 1, 3) \
                .reshape(B, N, d_v_p)
        else:
            # routing per head; mask subtracted BEFORE the sqrt(d) scaling
            # (set_transformer.py:40-43). d = per-head key dim, matching
            # the reference where qkv_attention sees the split tensors.
            routing = jnp.einsum("bnhd,bmhd->bhnm", q, k)
            if presence is not None:
                routing = routing \
                    - (1.0 - presence[:, None, None, :]) * _MASK
            d_head = d_k_p // H
            routing = jax.nn.softmax(
                routing / jnp.sqrt(jnp.asarray(d_head, routing.dtype)),
                axis=-1)
            o = jnp.einsum("bhnm,bmhd->bnhd", routing, v) \
                .reshape(B, N, d_v_p)
        return TorchLinear(self.d_v, name="o_projector")(o)


class MAB(nn.Module):
    """Multihead Attention Block: residual attention + rFF."""

    d: int
    n_heads: int
    layer_norm: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, queries, keys, presence=None):
        h = MultiHeadQKVAttention(d_k=self.d, d_v=self.d,
                                  n_heads=self.n_heads,
                                  use_pallas=self.use_pallas,
                                  name="mqkv")(queries, keys, keys, presence)
        h = h + queries

        # The residual re-mask zeroes absent *rows* — meaningful only in
        # self-attention where rows == masked keys. The reference asserts
        # presence.shape[1] == queries.shape[1] == keys.shape[1]
        # (set_transformer.py:123-124), which makes ISAB with a presence
        # mask impossible there (inducing-point queries != set size).
        # Fixed here: the key mask above always applies; the row re-mask
        # applies only when presence rows align with the queries (SAB).
        if presence is not None and presence.shape[1] == queries.shape[1]:
            h = h * presence[..., None]

        if self.layer_norm:
            h = nn.LayerNorm(epsilon=1e-5, name="ln0")(h)

        h = h + jax.nn.relu(TorchLinear(self.d, name="fc")(h))
        if self.layer_norm:
            h = nn.LayerNorm(epsilon=1e-5, name="ln1")(h)
        return h


class SAB(nn.Module):
    d: int
    n_heads: int
    layer_norm: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, presence=None):
        return MAB(d=self.d, n_heads=self.n_heads,
                   layer_norm=self.layer_norm, use_pallas=self.use_pallas,
                   name="mab")(x, x, presence)


class ISAB(nn.Module):
    """Induced SAB: O(N*m) attention through m inducing points."""

    d: int
    n_heads: int
    n_inducing_points: int
    layer_norm: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, presence=None):
        B = x.shape[0]
        m, d = self.n_inducing_points, self.d
        inducing = self.param("I", xavier_uniform_torch(m * d, d), (1, m, d))
        h = MAB(d=d, n_heads=self.n_heads, layer_norm=self.layer_norm,
                use_pallas=self.use_pallas,
                name="mab0")(jnp.broadcast_to(inducing, (B, m, d)), x,
                             presence)
        return MAB(d=d, n_heads=self.n_heads, layer_norm=self.layer_norm,
                   use_pallas=self.use_pallas, name="mab1")(x, h)


class PMA(nn.Module):
    """Pooling by Multihead Attention over learned seed queries."""

    d: int
    n_heads: int
    n_seeds: int
    layer_norm: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, presence=None):
        B = x.shape[0]
        k, d = self.n_seeds, self.d
        seeds = self.param("S", xavier_uniform_torch(k * d, d), (1, k, d))
        return MAB(d=d, n_heads=self.n_heads, layer_norm=self.layer_norm,
                   use_pallas=self.use_pallas,
                   name="mab")(jnp.broadcast_to(seeds, (B, k, d)), x,
                               presence)


class SetTransformer(nn.Module):
    """Permutation-invariant encoder: M part tokens -> O object encodings."""

    dim_in: int
    dim_hidden: int
    dim_out: int
    n_outputs: int
    n_layers: int
    n_heads: int
    layer_norm: bool = False
    n_inducing_points: Optional[int] = None
    # Testing-only: route all attention blocks through the fused Pallas
    # kernel (ops/pallas_attention.py). Demoted from the factory config
    # in round 3 — TPU-measured SLOWER than XLA in every SCAE regime
    # (flagship 0.95x, ISAB-256 0.80x; BASELINE.md). Kept so the
    # neutrality test pins the kernel's numerics in-model.
    use_pallas_attention: bool = False

    @nn.compact
    def __call__(self, x, presence=None):
        B = x.shape[0]
        h = TorchLinear(self.dim_hidden, name="fc1")(x)

        for i in range(self.n_layers):
            if self.n_inducing_points is None:
                h = SAB(d=self.dim_hidden, n_heads=self.n_heads,
                        layer_norm=self.layer_norm,
                        use_pallas=self.use_pallas_attention,
                        name=f"sab_{i}")(h, presence)
            else:
                h = ISAB(d=self.dim_hidden, n_heads=self.n_heads,
                         n_inducing_points=self.n_inducing_points,
                         layer_norm=self.layer_norm,
                         use_pallas=self.use_pallas_attention,
                         name=f"sab_{i}")(h, presence)

        z = TorchLinear(self.dim_out, name="fc2")(h)

        # torch xavier on (1, n_outputs, dim_out): fan_in = n_outputs*dim_out,
        # fan_out = dim_out (set_transformer.py:205-207)
        seeds = self.param(
            "seeds",
            xavier_uniform_torch(self.n_outputs * self.dim_out, self.dim_out),
            (1, self.n_outputs, self.dim_out))
        s = jnp.broadcast_to(seeds, (B, self.n_outputs, self.dim_out))

        return MultiHeadQKVAttention(
            d_k=self.dim_out, d_v=self.dim_out, n_heads=self.n_heads,
            use_pallas=self.use_pallas_attention,
            name="multi_head_attention")(s, z, z, presence)
