import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.ops.geometry import geometric_transform


def test_flat_shape():
    pose = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 6))
    out = geometric_transform(pose)
    assert out.shape == (4, 16, 6)


def test_matrix_shape_and_homogeneous_row():
    pose = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 6))
    out = geometric_transform(pose, as_matrix=True)
    assert out.shape == (4, 16, 3, 3)
    np.testing.assert_allclose(np.asarray(out[..., 2, :]),
                               np.broadcast_to([0.0, 0.0, 1.0], (4, 16, 3)))


def test_similarity_is_rotation_scale():
    pose = jax.random.normal(jax.random.PRNGKey(1), (8, 6))
    out = geometric_transform(pose, similarity=True)
    a, b, _, c, d, _ = [np.asarray(out[..., i]) for i in range(6)]
    # similarity: [s c, -s s; s s, s c] -> a == d, b == -c
    np.testing.assert_allclose(a, d, rtol=1e-5)
    np.testing.assert_allclose(b, -c, rtol=1e-5)


def test_nonlinear_ranges():
    pose = 10.0 * jax.random.normal(jax.random.PRNGKey(2), (100, 6))
    out = np.asarray(geometric_transform(pose))
    # translations squashed by tanh(5x)
    assert np.abs(out[:, 2]).max() <= 1.0
    assert np.abs(out[:, 5]).max() <= 1.0


def test_linear_scale_abs():
    pose = jnp.asarray([[-2.0, -3.0, 0.0, 0.0, 0.0, 0.0]])
    out = np.asarray(geometric_transform(pose, nonlinear=False))
    # theta=0 => a = scale_x = |-2|+1e-2
    np.testing.assert_allclose(out[0, 0], 2.01, rtol=1e-6)
    np.testing.assert_allclose(out[0, 4], 3.01, rtol=1e-6)


def test_compose_affines_matches_matmul():
    """compose_affines == homogeneous 3x3 matmul, incl. broadcasting
    (the CapsuleLayer vote shape: (B,O,1,6) outer x (B,O,V,6) inner)."""
    from scae_tpu.ops.geometry import affine_to_matrix, compose_affines

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    outer = geometric_transform(jax.random.normal(k1, (2, 5, 1, 6)))
    inner = geometric_transform(jax.random.normal(k2, (2, 5, 7, 6)))
    got = affine_to_matrix(compose_affines(outer, inner))
    want = jnp.matmul(affine_to_matrix(outer), affine_to_matrix(inner))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-7)
