"""Multi-channel (SVHN/CIFAR-family) model + pipeline coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scae_tpu.config import load_config
from scae_tpu.factory import make_scae, prepare_model_params
from scae_tpu.train.data import Dataset, synthetic_digits, to_nchw_float


def tiny_color_model():
    return make_scae(dict(
        image_shape=(3, 24, 24),
        n_classes=10,
        n_part_caps=6,
        n_obj_caps=4,
        pcae_cnn_encoder_params=dict(out_channels=[16] * 4),
        pcae_template_generator_params=dict(template_size=(6, 6)),
        ocae_encoder_set_transformer_params=dict(dim_hidden=8, dim_out=16),
        ocae_decoder_capsule_params=dict(dim_caps=8, hidden_sizes=(16,)),
        pcae_decoder_params=dict(learn_output_scale=True),
        scae_params=dict(reconstruct_alternatives=False),
    ))


@pytest.mark.slow
def test_color_model_forward_loss_grads():
    model = tiny_color_model()
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 24, 24))
    label = jnp.asarray([1, 2])
    variables = model.init({"params": jax.random.PRNGKey(1)}, img)

    def loss_fn(params):
        res = model.apply({"params": params}, img)
        loss, _ = model.loss(res, img, label)
        return loss

    loss = loss_fn(variables["params"])
    assert np.isfinite(float(loss))
    grads = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


@pytest.mark.slow
def test_color_model_template_shapes():
    model = tiny_color_model()
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 24, 24))
    variables = model.init({"params": jax.random.PRNGKey(1)}, img)
    res = model.apply({"params": variables["params"]}, img)
    assert res.templates.shape == (2, 6, 3, 6, 6)
    assert res.rec.transformed_templates.shape == (2, 7, 3, 24, 24)
    # alpha-channel mixing logits stay single-channel (broadcastable)
    assert res.rec.mixing_logits.shape == (2, 7, 1, 24, 24)
    assert res.rec.target_ll.shape == (2, 3, 24, 24)


def test_synthetic_color_digits_and_dataset():
    im, lb = synthetic_digits(12, seed=0, size=24, n_channels=3)
    assert im.shape == (12, 24, 24, 3) and im.dtype == np.uint8
    ds = Dataset(im, lb)
    batch = next(ds.batches(4, seed=0))
    assert batch["image"].shape == (4, 3, 24, 24)
    # class tints differ across channels for most samples
    chan_means = batch["image"].mean(axis=(2, 3))
    assert np.std(chan_means) > 0


def test_to_nchw_float_gray_and_color():
    gray = np.zeros((2, 5, 5), np.uint8)
    assert to_nchw_float(gray).shape == (2, 1, 5, 5)
    color = np.zeros((2, 5, 5, 3), np.uint8)
    assert to_nchw_float(color).shape == (2, 3, 5, 5)


def test_svhn_cifar_configs_materialize():
    for name in ("svhn", "cifar10", "mnist28"):
        cfg = load_config("config", overrides=[f"model={name}"])
        params = prepare_model_params(**cfg["model"])
        assert params["pcae_template_generator"]["n_channels"] \
            == cfg["model"]["image_shape"][0]
        st = params["ocae_encoder_set_transformer"]
        tg = params["pcae_template_generator"]
        expected_dim_in = (6 + 16 + 1 + tg["n_channels"]
                           * tg["template_size"][0] * tg["template_size"][1])
        assert st["dim_in"] == expected_dim_in
