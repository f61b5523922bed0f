import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.models.set_transformer import (
    ISAB,
    MAB,
    PMA,
    SAB,
    MultiHeadQKVAttention,
    SetTransformer,
)


def _init_apply(module, *args):
    variables = module.init(jax.random.PRNGKey(0), *args)
    return module.apply(variables, *args), variables


def test_multihead_shapes_with_padding():
    # d_k=10 not divisible by 4 heads -> internal padding to 12
    q = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 10))
    k = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 10))
    v = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 6))
    out, _ = _init_apply(MultiHeadQKVAttention(d_k=10, d_v=6, n_heads=4),
                         q, k, v)
    assert out.shape == (2, 5, 6)


def test_mab_sab_shapes():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 9, 16))
    out, _ = _init_apply(MAB(d=16, n_heads=2, layer_norm=True), x, x)
    assert out.shape == (2, 9, 16)
    out, _ = _init_apply(SAB(d=16, n_heads=2), x)
    assert out.shape == (2, 9, 16)


def test_isab_pma_shapes():
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 9, 16))
    out, _ = _init_apply(ISAB(d=16, n_heads=2, n_inducing_points=4), x)
    assert out.shape == (2, 9, 16)
    out, _ = _init_apply(PMA(d=16, n_heads=2, n_seeds=3), x)
    assert out.shape == (2, 3, 16)


def test_set_transformer_output_shape():
    st = SetTransformer(dim_in=23, dim_hidden=16, dim_out=32, n_outputs=10,
                        n_layers=3, n_heads=1, layer_norm=True)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 15, 23))
    presence = jnp.ones((4, 15))
    variables = st.init(jax.random.PRNGKey(0), x, presence)
    out = st.apply(variables, x, presence)
    assert out.shape == (4, 10, 32)


def test_set_transformer_permutation_invariance():
    """Full presence + token permutation must leave outputs unchanged."""
    st = SetTransformer(dim_in=8, dim_hidden=16, dim_out=12, n_outputs=5,
                        n_layers=2, n_heads=2, layer_norm=False)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 9, 8))
    variables = st.init(jax.random.PRNGKey(0), x)
    out = st.apply(variables, x)
    perm = jax.random.permutation(jax.random.PRNGKey(8), 9)
    out_p = st.apply(variables, x[:, perm])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_p), atol=1e-4)


def test_set_transformer_masked_tokens_ignored():
    st = SetTransformer(dim_in=8, dim_hidden=16, dim_out=12, n_outputs=5,
                        n_layers=2, n_heads=1, layer_norm=True)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 6, 8))
    presence = jnp.asarray([[1.0, 1.0, 1.0, 1.0, 0.0, 0.0]])
    variables = st.init(jax.random.PRNGKey(0), x, presence)
    out1 = st.apply(variables, x, presence)
    # mutate the masked tokens; output must not change
    x2 = x.at[:, 4:].set(100.0)
    out2 = st.apply(variables, x2, presence)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)

def test_isab_with_presence_masks_keys():
    """ISAB + presence: the reference's MAB asserts presence length ==
    query count (set_transformer.py:123-124), which makes ISAB with a
    presence mask impossible there (m inducing queries != N set size).
    Fixed defect: the key mask applies in mab0; the residual row
    re-mask is skipped when rows don't align. Masked tokens must not
    influence present rows' outputs."""
    isab = ISAB(d=16, n_heads=2, n_inducing_points=4)
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 6, 16))
    presence = jnp.asarray([[1.0, 1.0, 1.0, 1.0, 0.0, 0.0]] * 2)
    variables = isab.init(jax.random.PRNGKey(0), x, presence)
    out1 = isab.apply(variables, x, presence)
    assert out1.shape == (2, 6, 16)
    assert np.isfinite(np.asarray(out1)).all()
    x2 = x.at[:, 4:].set(100.0)
    out2 = isab.apply(variables, x2, presence)
    # present rows unchanged by mutated absent tokens (absent rows self-
    # attend to the inducing summaries, so only their own input varies)
    np.testing.assert_allclose(np.asarray(out1[:, :4]),
                               np.asarray(out2[:, :4]), atol=1e-4)


def test_full_model_isab_with_presence_trains():
    """SetTransformer(n_inducing_points=...) composes with presence end
    to end (the regime measured in BASELINE.md round-3 attention A/B)."""
    st = SetTransformer(dim_in=8, dim_hidden=8, dim_out=8, n_outputs=2,
                        n_layers=1, n_heads=2, layer_norm=True,
                        n_inducing_points=5)
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 9, 8))
    presence = jnp.asarray([[1.0] * 6 + [0.0] * 3] * 2)
    variables = st.init(jax.random.PRNGKey(0), x, presence)

    @jax.jit
    def grad(v):
        return jax.grad(
            lambda v: jnp.sum(st.apply(v, x, presence) ** 2))(v)

    g = grad(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
