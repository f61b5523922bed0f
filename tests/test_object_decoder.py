import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.models.object_decoder import (
    CapsuleLayer,
    CapsuleObjectDecoder,
    capsule_entropy_loss,
    capsule_l2_loss,
    capsule_likelihood,
    sparsity_loss,
)

B, O, F, V, D = 2, 5, 32, 7, 8


def _layer(**kw):
    defaults = dict(n_caps=O, dim_feature=F, n_votes=V, dim_caps=D,
                    hidden_sizes=(16,), learn_vote_scale=True,
                    noise_type="uniform", noise_scale=4.0,
                    similarity_transform=False)
    defaults.update(kw)
    return CapsuleLayer(**defaults)


def test_capsule_layer_shapes():
    layer = _layer()
    feat = jax.random.normal(jax.random.PRNGKey(1), (B, O, F))
    variables = layer.init(jax.random.PRNGKey(0), feat)
    res = layer.apply(variables, feat)
    assert res.vote.shape == (B, O, V, 3, 3)
    assert res.scale.shape == (B, O, V)
    assert res.vote_presence.shape == (B, O, V)
    assert res.presence_logit_per_caps.shape == (B, O, 1)
    assert res.presence_logit_per_vote.shape == (B, O, V)
    assert res.cpr_dynamic_reg_loss.shape == ()
    assert (np.asarray(res.scale) > 0).all()


def test_capsule_layer_independent_capsule_weights():
    """Capsules with identical inputs but different weights must differ."""
    layer = _layer(noise_type=None)
    feat = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(2), (B, 1, F)), (B, O, F))
    variables = layer.init(jax.random.PRNGKey(0), feat)
    res = layer.apply(variables, feat)
    votes = np.asarray(res.vote)
    assert not np.allclose(votes[:, 0], votes[:, 1])


def test_capsule_layer_deformations_off_zeroes_reg():
    layer = _layer(allow_deformations=False, noise_type=None)
    feat = jax.random.normal(jax.random.PRNGKey(1), (B, O, F))
    variables = layer.init(jax.random.PRNGKey(0), feat)
    res = layer.apply(variables, feat)
    assert float(res.cpr_dynamic_reg_loss) == 0.0


def test_capsule_layer_noise_only_when_training():
    layer = _layer()
    feat = jax.random.normal(jax.random.PRNGKey(1), (B, O, F))
    variables = layer.init(jax.random.PRNGKey(0), feat)
    res1 = layer.apply(variables, feat, deterministic=True)
    res2 = layer.apply(variables, feat, deterministic=True)
    np.testing.assert_allclose(np.asarray(res1.vote_presence),
                               np.asarray(res2.vote_presence))
    res3 = layer.apply(variables, feat, deterministic=False,
                       rngs={"noise": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(res1.vote_presence),
                           np.asarray(res3.vote_presence))


def test_capsule_likelihood_shapes_and_finiteness():
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 6)
    M = V
    vote = jax.random.normal(ks[0], (B, O, M, 6))
    scale = jax.random.uniform(ks[1], (B, O, M)) + 0.5
    vote_presence = jax.random.uniform(ks[2], (B, O, M))
    dummy_vote = jax.random.normal(ks[3], (1, 1, M, 6))
    x = jax.random.normal(ks[4], (B, M, 6))
    presence = jax.random.uniform(ks[5], (B, M))

    res = capsule_likelihood(vote, scale, vote_presence, dummy_vote, x,
                             presence)
    assert res.log_prob.shape == ()
    assert res.winner.shape == (B, M, 6)
    assert res.winner_presence.shape == (B, M)
    assert res.soft_winner.shape == (B, M, 6)
    assert res.soft_winner_presence.shape == (B, M)
    assert res.posterior_mixing_prob.shape == (B, O, M)
    assert res.mixing_logit.shape == (B, O + 1, M)
    assert res.vote_presence_binary.shape == (B, O, M)
    assert np.isfinite(float(res.log_prob))
    # posterior over O+1 sums to <= 1 after dropping dummy
    s = np.asarray(res.posterior_mixing_prob.sum(1))
    assert (s <= 1 + 1e-5).all()


def test_capsule_likelihood_winner_is_argmax_vote():
    """With one dominant capsule, winner must equal its vote."""
    M = 4
    vote = jnp.zeros((1, 2, M, 6))
    vote = vote.at[:, 1].set(3.0)
    scale = jnp.ones((1, 2, M))
    # capsule 1 present, capsule 0 not
    vote_presence = jnp.stack(
        [jnp.zeros((1, M)), jnp.ones((1, M))], axis=1)
    dummy_vote = jnp.zeros((1, 1, M, 6))
    x = jnp.full((1, M, 6), 3.0)  # matches capsule 1's vote
    res = capsule_likelihood(vote, scale, vote_presence, dummy_vote, x)
    np.testing.assert_allclose(np.asarray(res.winner),
                               np.full((1, M, 6), 3.0))
    np.testing.assert_allclose(np.asarray(res.winner_presence),
                               np.ones((1, M)))


def test_object_decoder_end_to_end_shapes():
    layer = _layer(noise_type=None)
    dec = CapsuleObjectDecoder(capsule_layer=layer)
    M = V
    enc = jax.random.normal(jax.random.PRNGKey(5), (B, O, F))
    pose = jax.random.normal(jax.random.PRNGKey(6), (B, M, 6))
    presence = jax.random.uniform(jax.random.PRNGKey(7), (B, M))
    variables = dec.init(jax.random.PRNGKey(0), enc, pose, presence)
    res = dec.apply(variables, enc, pose, presence)
    assert res.vote.shape == (B, O, M, 6)
    assert res.caps_presence.shape == (B, O)
    assert dec.n_obj_capsules == O


def test_sparsity_losses():
    cp = jax.random.uniform(jax.random.PRNGKey(8), (6, O))
    w, b = capsule_l2_loss(cp, n_classes=3)
    assert w.shape == () and b.shape == ()
    w2, b2 = capsule_entropy_loss(cp)
    assert np.isfinite(float(w2)) and np.isfinite(float(b2))
    # dispatcher
    for lt in ("l2", "entropy", "kl"):
        out = sparsity_loss(lt, cp, n_classes=3)
        assert len(out) == 2
    try:
        sparsity_loss("nope", cp, n_classes=3)
        assert False
    except ValueError:
        pass


def test_capsule_layer_hierarchical_parent_hooks():
    """parent_transform/parent_presence substitution (reference
    object_decoder.py:184-187,214-217)."""
    layer = _layer(noise_type=None)
    feat = jax.random.normal(jax.random.PRNGKey(9), (B, O, F))
    variables = layer.init(jax.random.PRNGKey(0), feat)

    parent_transform = jnp.broadcast_to(jnp.eye(3), (B, O, 1, 3, 3))
    parent_presence = jnp.full((B, O, 1), 0.25)
    res = layer.apply(variables, feat, parent_transform=parent_transform,
                      parent_presence=parent_presence)
    # with identity OVR, vote == OPR transform; presence capped by parent
    assert res.vote.shape == (B, O, V, 3, 3)
    assert float(jnp.max(res.vote_presence)) <= 0.25 + 1e-6

    res_noparent = layer.apply(variables, feat)
    assert not np.allclose(np.asarray(res.vote),
                           np.asarray(res_noparent.vote))
