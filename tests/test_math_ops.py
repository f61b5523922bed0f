import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.ops import math_ops


def test_log_safe_floors_small_values():
    x = jnp.asarray([0.0, 1e-20, 1e-10, 1.0, np.e])
    out = math_ops.log_safe(x)
    np.testing.assert_allclose(out[:2], [-1e8, -1e8])
    np.testing.assert_allclose(out[3:], [0.0, 1.0], atol=1e-4)
    assert np.isfinite(np.asarray(out)).all()


def test_log_safe_gradient_finite_at_zero():
    g = jax.grad(lambda x: jnp.sum(math_ops.log_safe(x)))(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()


def test_normalize_sums_to_one():
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (4, 7)))
    out = math_ops.normalize(x, 1)
    np.testing.assert_allclose(np.asarray(jnp.sum(out, 1)), np.ones(4),
                               rtol=1e-5)


def test_l2_loss():
    x = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(float(math_ops.l2_loss(x)), 7.0)


def test_relu1_clips():
    x = jnp.asarray([-1.0, 0.0, 0.25, 0.5, 1.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(math_ops.relu1(x)), [0.0, 0.0, 0.25, 0.5, 1.0, 1.0])


def test_cross_entropy_safe_matches_manual():
    p = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (3, 5)))
    out = float(math_ops.cross_entropy_safe(p, p))
    manual = float(jnp.mean(-jnp.sum(p * jnp.log(p), -1)))
    np.testing.assert_allclose(out, manual, rtol=1e-5)
