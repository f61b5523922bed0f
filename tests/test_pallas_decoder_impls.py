"""Numerics of the Pallas decoder-ll implementations vs the XLA path.

Runs in interpret mode on the CPU test mesh (tests/conftest.py); the
same comparisons run on real hardware via tools/check_banded_ll.py
(SCAE_CHECK_IMPL=banded|gather). Reference math:
torch_scae/part_decoder.py:152-243 + distributions.py:41-48, already
golden-pinned to torch by tests/test_parity_golden.py through the XLA
path this test compares against.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scae_tpu.ops.decoder_ll import fused_decoder_ll
from scae_tpu.ops.geometry import geometric_transform
from scae_tpu.ops.pallas_decoder_ll_banded import pallas_decoder_ll_banded
from scae_tpu.ops.pallas_decoder_ll_gather import pallas_decoder_ll_gather

GRAD_NAMES = ["templates", "alpha", "pose", "presence", "bg_value",
              "bg_mix", "scale", "target"]


def _inputs(key, B, M, C, Ht, Wt, H, W):
    ks = jax.random.split(key, 8)
    templates = jax.random.uniform(ks[0], (B, M, C, Ht, Wt))
    alpha = jax.random.normal(ks[1], (1, M, 1, Ht, Wt))
    pose = geometric_transform(jax.random.normal(ks[2], (B, M, 6)) * 0.6)
    presence = jax.random.uniform(ks[3], (B, M))
    target = jax.random.uniform(ks[4], (B, C, H, W))
    return (templates, alpha, pose, presence, jnp.asarray(0.3),
            jnp.asarray(0.7), jnp.asarray(1.0), target)


def _check_value_and_grads(impl, tol, shape):
    B, M, C, Ht, Wt, H, W = shape
    args = _inputs(jax.random.PRNGKey(0), *shape)

    ll_ref = fused_decoder_ll(*args, (H, W), jnp.float32)
    ll_new = impl(*args, (H, W))
    assert float(jnp.max(jnp.abs(ll_ref - ll_new))) < 1e-2

    def loss_ref(*a):
        return jnp.sum(fused_decoder_ll(*a, (H, W), jnp.float32) ** 2)

    def loss_new(*a):
        return jnp.sum(impl(*a, (H, W)) ** 2)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    g_new = jax.grad(loss_new, argnums=tuple(range(8)))(*args)
    for n, a, b in zip(GRAD_NAMES, g_ref, g_new):
        d = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(a))) + 1e-30
        assert d / s < tol, f"grad {n}: rel err {d / s:.2e}"


def test_gather_value_and_grads_small():
    """Fast-core sentinel: the gather kernel's value+grad parity at a
    small shape (interpret mode is slow; the flagship-like shapes and
    the banded kernel run under -m slow and on real TPU via
    tools/check_banded_ll.py)."""
    _check_value_and_grads(pallas_decoder_ll_gather, 3e-2,
                           (2, 8, 1, 5, 5, 16, 16))


@pytest.mark.slow
@pytest.mark.parametrize("impl,tol", [
    (pallas_decoder_ll_gather, 3e-2),
    (pallas_decoder_ll_banded, 3e-2),
])
@pytest.mark.parametrize("shape", [
    (2, 16, 1, 11, 11, 40, 40),   # flagship-like
    (2, 13, 1, 5, 5, 24, 24),     # M not a multiple of 8 (pad path)
])
def test_value_and_grads_match_xla(impl, tol, shape):
    _check_value_and_grads(impl, tol, shape)


@pytest.mark.slow
def test_multichannel_two_vreg_gather_matches_xla():
    # 14x14 = 196 texels exercises the two-vreg table path (svhn/cifar)
    shape = (2, 16, 3, 14, 14, 32, 32)
    B, M, C, Ht, Wt, H, W = shape
    args = _inputs(jax.random.PRNGKey(1), *shape)
    ll_ref = fused_decoder_ll(*args, (H, W), jnp.float32)
    ll_new = pallas_decoder_ll_gather(*args, (H, W))
    assert float(jnp.max(jnp.abs(ll_ref - ll_new))) < 1e-2


def test_gather_rejects_oversized_templates():
    args = _inputs(jax.random.PRNGKey(2), 1, 8, 1, 17, 17, 40, 40)
    with pytest.raises(ValueError, match="256-texel"):
        pallas_decoder_ll_gather(*args, (40, 40))


def test_gather_extreme_poses_match_xla():
    """Off-canvas / boundary poses: big translations and degenerate
    scales push every tap-validity branch (clipped indices with zero
    weights must reproduce grid_sample zero padding exactly)."""
    # small-shape family (matches test_gather_value_and_grads_small so
    # the interpret-mode kernel trace is reused in-process); extreme
    # translations push off-canvas at any canvas size
    B, M, C, Ht, Wt, H, W = 2, 8, 1, 5, 5, 16, 16
    ks = jax.random.split(jax.random.PRNGKey(5), 8)
    templates = jax.random.uniform(ks[0], (B, M, C, Ht, Wt))
    alpha = jax.random.normal(ks[1], (1, M, 1, Ht, Wt))
    # raw pose scaled up -> tanh saturates translations to +-1, theta
    # spins freely; plus a few hand-built degenerate rows
    pose = geometric_transform(jax.random.normal(ks[2], (B, M, 6)) * 4.0)
    pose = pose.at[:, 0].set(jnp.asarray([0.01, 0, 1.0, 0, 0.01, 1.0]))
    pose = pose.at[:, 1].set(jnp.asarray([1.01, 0, -1.0, 0, 1.01, 0.0]))
    presence = jax.random.uniform(ks[3], (B, M))
    target = jax.random.uniform(ks[4], (B, C, H, W))
    args = (templates, alpha, pose, presence, jnp.asarray(0.3),
            jnp.asarray(0.7), jnp.asarray(1.0), target)
    ll_ref = fused_decoder_ll(*args, (H, W), jnp.float32)
    ll_new = pallas_decoder_ll_gather(*args, (H, W))
    assert float(jnp.max(jnp.abs(ll_ref - ll_new))) < 1e-4


def test_gather_partitions_over_data():
    """The gather kernel's custom_partitioning: under a jit with
    batch-sharded inputs on a ('data',) mesh, values and gradients must
    match the single-device run exactly (each shard runs the kernel on
    its local batch; all math is per-example)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # per-example math is shape-independent; the small shape keeps the
    # 8 per-shard interpret instances cheap (flagship shapes run under
    # -m slow and on real TPU)
    B, M, C, Ht, Wt, H, W = 8, 8, 1, 5, 5, 16, 16
    args = _inputs(jax.random.PRNGKey(7), B, M, C, Ht, Wt, H, W)

    def loss(*a):
        return jnp.sum(pallas_decoder_ll_gather(*a, (H, W)) ** 2)

    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 2, 3)))
    v_ref, g_ref = vg(*args)

    devs = jax.devices()
    assert len(devs) >= 8, "conftest provides an 8-device CPU mesh"
    mesh = Mesh(np.array(devs[:8]), ("data",))
    batched = lambda x: NamedSharding(  # noqa: E731
        mesh, P(*(("data",) + (None,) * (x.ndim - 1))))

    sharded_args = []
    for i, a in enumerate(args):
        a = jnp.asarray(a)
        if a.ndim and a.shape[0] == B:
            sharded_args.append(jax.device_put(a, batched(a)))
        else:
            sharded_args.append(
                jax.device_put(a, NamedSharding(mesh, P())))
    v_dp, g_dp = vg(*sharded_args)

    np.testing.assert_allclose(float(v_ref), float(v_dp), rtol=1e-6)
    for a, b in zip(g_ref, g_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
