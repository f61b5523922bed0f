import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.ops.gmm import GaussianMixture, normal_log_prob


def _make(key, B=3, K=4, shape=(2, 5, 5)):
    k1, k2 = jax.random.split(key)
    loc = jax.random.normal(k1, (B, K, *shape))
    logits = jax.random.normal(k2, (B, K, *shape))
    return GaussianMixture.make_from_stats(loc, 0.7, logits)


def test_log_prob_matches_manual_logsumexp():
    gmm = _make(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 5, 5))
    got = gmm.log_prob(x)
    lp = normal_log_prob(x[:, None], gmm.loc, gmm.scale)
    want = jax.nn.logsumexp(lp + jax.nn.log_softmax(gmm.mixing_logits, 1), 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
    assert got.shape == (3, 2, 5, 5)


def test_single_component_reduces_to_normal():
    loc = jnp.zeros((2, 1, 3))
    gmm = GaussianMixture.make_from_stats(loc, 1.0, jnp.zeros((2, 1, 3)))
    x = jnp.ones((2, 3))
    want = -0.5 - 0.5 * np.log(2 * np.pi)
    np.testing.assert_allclose(np.asarray(gmm.log_prob(x)),
                               np.full((2, 3), want), rtol=1e-6)


def test_mode_selects_argmax_component():
    loc = jnp.stack([jnp.zeros((2, 4)), jnp.ones((2, 4))], axis=1)
    logits = jnp.stack([jnp.full((2, 4), -5.0), jnp.full((2, 4), 5.0)], axis=1)
    gmm = GaussianMixture.make_from_stats(loc, 1.0, logits)
    np.testing.assert_allclose(np.asarray(gmm.mode()), np.ones((2, 4)))


def test_mode_straight_through_has_gradient():
    def f(logits):
        loc = jnp.stack([jnp.zeros((1, 2)), jnp.ones((1, 2))], 1)
        gmm = GaussianMixture.make_from_stats(loc, 1.0, logits)
        return jnp.sum(gmm.mode(straight_through_gradient=True))

    logits = jnp.zeros((1, 2, 2))
    g = jax.grad(f)(logits)
    assert float(jnp.abs(g).sum()) > 0


def test_mean_is_softmax_weighted():
    gmm = _make(jax.random.PRNGKey(2))
    want = jnp.sum(jax.nn.softmax(gmm.mixing_logits, 1) * gmm.loc, 1)
    np.testing.assert_allclose(np.asarray(gmm.mean()), np.asarray(want),
                               rtol=1e-5)


def test_broadcastable_mixing_logits():
    # mixing logits may have a singleton channel dim vs loc (alpha-channel path)
    loc = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 3, 5, 5))
    logits = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 1, 5, 5))
    gmm = GaussianMixture.make_from_stats(loc, 1.0, logits)
    out = gmm.log_prob(jnp.zeros((2, 3, 5, 5)))
    assert out.shape == (2, 3, 5, 5)
