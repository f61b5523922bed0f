import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu.models.part_encoder import CNNEncoder, CapsuleImageEncoder


def _cnn(input_shape=(1, 28, 28)):
    return CNNEncoder(input_shape=input_shape, out_channels=(32, 32, 32, 32),
                      kernel_sizes=(3, 3, 3, 3), strides=(2, 2, 1, 1))


def test_cnn_encoder_static_output_shape_matches_forward():
    cnn = _cnn()
    img = jnp.zeros((2, 1, 28, 28))
    variables = cnn.init(jax.random.PRNGKey(0), img)
    out = cnn.apply(variables, img)
    assert out.shape[1:] == cnn.output_shape  # (32, 4, 2?) static arithmetic
    # 28 -k3s2-> 13 -k3s2-> 6 -k3s1-> 4 -k3s1-> 2
    assert cnn.output_shape == (32, 2, 2)


def test_capsule_image_encoder_output_shapes():
    cnn = _cnn()
    enc = CapsuleImageEncoder(input_shape=(1, 28, 28), encoder=cnn,
                              n_caps=16, n_poses=6, n_special_features=8)
    img = jax.random.uniform(jax.random.PRNGKey(1), (4, 1, 28, 28))
    variables = enc.init(jax.random.PRNGKey(0), img)
    res = enc.apply(variables, img)
    assert res.pose.shape == (4, 16, 6)
    assert res.presence.shape == (4, 16)
    assert res.feature.shape == (4, 16, 8)
    assert (np.asarray(res.presence) >= 0).all()
    assert (np.asarray(res.presence) <= 1).all()


def test_no_special_features_gives_none():
    cnn = _cnn()
    enc = CapsuleImageEncoder(input_shape=(1, 28, 28), encoder=cnn,
                              n_caps=8, n_poses=6, n_special_features=0)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 28, 28))
    variables = enc.init(jax.random.PRNGKey(0), img)
    res = enc.apply(variables, img)
    assert res.feature is None


def test_train_noise_changes_presence_only_with_rng():
    cnn = _cnn()
    enc = CapsuleImageEncoder(input_shape=(1, 28, 28), encoder=cnn,
                              n_caps=8, noise_scale=4.0)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 28, 28))
    variables = enc.init(jax.random.PRNGKey(0), img)
    res_det = enc.apply(variables, img, deterministic=True)
    res_noise = enc.apply(variables, img, deterministic=False,
                          rngs={"noise": jax.random.PRNGKey(7)})
    assert not np.allclose(np.asarray(res_det.presence),
                           np.asarray(res_noise.presence))
    # pose unaffected by presence noise
    np.testing.assert_allclose(np.asarray(res_det.pose),
                               np.asarray(res_noise.pose), rtol=1e-6)


def test_cnn_compute_dtype_bf16_close_to_f32():
    cnn32 = _cnn()
    img = jax.random.uniform(jax.random.PRNGKey(5), (2, 1, 28, 28))
    variables = cnn32.init(jax.random.PRNGKey(0), img)
    out32 = cnn32.apply(variables, img)
    from scae_tpu.models.part_encoder import CNNEncoder
    cnn16 = CNNEncoder(input_shape=(1, 28, 28), out_channels=(32,) * 4,
                       kernel_sizes=(3,) * 4, strides=(2, 2, 1, 1),
                       compute_dtype="bfloat16")
    out16 = cnn16.apply(variables, img)
    assert out16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=0.1, atol=0.1)
