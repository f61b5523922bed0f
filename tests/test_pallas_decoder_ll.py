"""Pallas fused decoder-ll vs the XLA fused path (ops/decoder_ll.py),
value + every gradient, in interpreter mode on CPU. The XLA path itself is
golden-tested against the torch reference (tests/test_decoder_ll.py), so
agreement here transfers that parity to the kernel.

Also covers the model-level wiring: TemplateBasedImageDecoder with
fused_impl='pallas' must match fused_impl='xla', and the SetTransformer
use_pallas_attention flag must be numerically neutral.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scae_tpu.ops.decoder_ll import fused_decoder_ll
from scae_tpu.ops.pallas_decoder_ll import pallas_decoder_ll


def _mk_args(B, M, C, Ht, Wt, H, W, batch_alpha=False, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    templates = jax.random.uniform(ks[0], (B, M, C, Ht, Wt))
    Ba = B if batch_alpha else 1
    alpha = jax.random.normal(ks[1], (Ba, M, 1, Ht, Wt)) * 0.5
    pose = jax.random.uniform(ks[2], (B, M, 6), minval=-0.8, maxval=1.2)
    presence = jax.random.uniform(ks[6], (B, M))
    presence = presence.at[0, 0].set(0.0)  # exercise the log_safe floor
    target = jax.random.uniform(ks[7], (B, C, H, W))
    bg_value = jnp.float32(0.3)
    bg_mix = jnp.float32(0.7)
    scale = jnp.asarray([1.2], jnp.float32)
    return (templates, alpha, pose, presence, bg_value, bg_mix, scale,
            target)


@pytest.mark.slow
@pytest.mark.parametrize(
    "B,M,C,Ht,Wt,H,W,batch_alpha",
    [
        (4, 5, 1, 7, 7, 12, 12, False),   # MNIST-like, broadcast alpha
        (3, 4, 3, 6, 5, 10, 8, False),    # multi-channel, non-square
        (2, 3, 1, 5, 5, 9, 9, True),      # batch-expanded alpha
    ],
)
def test_value_and_grads_match_xla(B, M, C, Ht, Wt, H, W, batch_alpha):
    args = _mk_args(B, M, C, Ht, Wt, H, W, batch_alpha)
    out_size = (H, W)

    ll_x = fused_decoder_ll(*args, out_size, jnp.float32)
    ll_p = pallas_decoder_ll(*args, out_size)
    np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll_x),
                               rtol=2e-5, atol=2e-5)

    # non-uniform cotangent so every gradient path is exercised
    cot = jnp.cos(jnp.arange(B * C * H * W, dtype=jnp.float32)
                  ).reshape(B, C, H, W)

    def loss(fn, extra):
        return lambda *a: jnp.sum(fn(*a, out_size, *extra) * cot)

    g_x = jax.grad(loss(fused_decoder_ll, (jnp.float32,)),
                   argnums=tuple(range(8)))(*args)
    g_p = jax.grad(loss(pallas_decoder_ll, ()),
                   argnums=tuple(range(8)))(*args)
    names = ["templates", "alpha", "pose", "presence", "bg_value",
             "bg_mixing_logit", "scale", "target"]
    # g_T/g_A flow through the kernel's bf16 MXU contraction (same
    # precision class as the XLA bench path's bf16 taps) -> looser bar
    # (bf16 has ~8 significand bits -> worst-case ~1e-2 relative)
    tol = {"templates": 1e-2, "alpha": 1e-2}
    for n, a, b in zip(names, g_x, g_p):
        assert a.shape == b.shape, n
        scale_ = float(jnp.max(jnp.abs(a))) + 1e-12
        err = float(jnp.max(jnp.abs(a - b)))
        rtol = tol.get(n, 1e-4)
        assert err / scale_ < rtol or err < 1e-5, (
            f"grad {n}: err {err:.3e} scale {scale_:.3e}")


def test_model_level_pallas_impl_matches_xla():
    from scae_tpu.models.part_decoder import TemplateBasedImageDecoder

    B, M, C, Ht, Wt, H, W = 2, 6, 1, 5, 5, 14, 14
    args = _mk_args(B, M, C, Ht, Wt, H, W)
    templates, _, pose, presence, *_ , target = args

    outs = {}
    for impl in ("xla", "pallas"):
        dec = TemplateBasedImageDecoder(
            n_templates=M, template_size=(Ht, Wt), output_size=(H, W),
            use_alpha_channel=True, background_value=True,
            learn_output_scale=True, use_fused_ll=True, fused_impl=impl)
        variables = dec.init(jax.random.PRNGKey(3), templates, pose,
                             presence, target=target)
        res = dec.apply(variables, templates, pose, presence, target=target)
        outs[impl] = np.asarray(res.target_ll)
    np.testing.assert_allclose(outs["pallas"], outs["xla"],
                               rtol=2e-5, atol=2e-5)


def test_set_transformer_pallas_flag_is_neutral():
    from scae_tpu.models.set_transformer import SetTransformer

    B, M, D = 2, 7, 12
    x = jax.random.normal(jax.random.PRNGKey(0), (B, M, D))
    presence = jax.random.uniform(jax.random.PRNGKey(1), (B, M))

    outs = {}
    for flag in (False, True):
        st = SetTransformer(dim_in=D, dim_hidden=16, dim_out=24,
                            n_outputs=4, n_layers=2, n_heads=2,
                            layer_norm=True, use_pallas_attention=flag)
        variables = st.init(jax.random.PRNGKey(2), x, presence)
        outs[flag] = np.asarray(st.apply(variables, x, presence))
    np.testing.assert_allclose(outs[True], outs[False],
                               rtol=1e-5, atol=1e-5)
