import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scae_tpu.models.part_decoder import (
    TemplateBasedImageDecoder,
    TemplateGenerator,
)

B, M, C, TS, OS = 3, 6, 1, (5, 5), (12, 12)


def test_template_generator_colorized():
    gen = TemplateGenerator(n_templates=M, n_channels=C, template_size=TS,
                            template_nonlin="sigmoid", dim_feature=8,
                            colorize_templates=True, color_nonlin="sigmoid")
    feat = jax.random.normal(jax.random.PRNGKey(1), (B, M, 8))
    variables = gen.init(jax.random.PRNGKey(0), feature=feat)
    res = gen.apply(variables, feature=feat)
    assert res.raw_templates.shape == (1, M, C, *TS)
    assert res.templates.shape == (B, M, C, *TS)
    raw = np.asarray(res.raw_templates)
    assert raw.min() >= 0 and raw.max() <= 1  # sigmoid


def test_template_generator_uncolorized_broadcasts():
    gen = TemplateGenerator(n_templates=M, n_channels=C, template_size=TS)
    variables = gen.init(jax.random.PRNGKey(0), batch_size=B)
    res = gen.apply(variables, batch_size=B)
    assert res.templates.shape == (B, M, C, *TS)
    np.testing.assert_allclose(np.asarray(res.templates[0]),
                               np.asarray(res.templates[1]))


def test_template_init_minmax_normalized():
    gen = TemplateGenerator(n_templates=M, n_channels=C, template_size=TS)
    variables = gen.init(jax.random.PRNGKey(0), batch_size=B)
    logits = np.asarray(variables["params"]["template_logits"])
    assert logits.min() == pytest.approx(0.0, abs=1e-6)
    assert logits.max() == pytest.approx(1.0, abs=1e-6)


@pytest.mark.parametrize("use_alpha,learn_scale,bg", [
    (True, False, True),
    (False, True, True),
    (False, False, True),
    (True, True, True),
])
def test_decoder_output_has_background_component(use_alpha, learn_scale, bg):
    dec = TemplateBasedImageDecoder(
        n_templates=M, template_size=TS, output_size=OS,
        learn_output_scale=learn_scale, use_alpha_channel=use_alpha,
        background_value=bg)
    templates = jax.random.uniform(jax.random.PRNGKey(1), (B, M, C, *TS))
    pose = jax.random.normal(jax.random.PRNGKey(2), (B, M, 6)) * 0.1 \
        + jnp.asarray([1, 0, 0, 0, 1, 0])
    presence = jax.random.uniform(jax.random.PRNGKey(3), (B, M))
    variables = dec.init(jax.random.PRNGKey(0), templates, pose, presence)
    res = dec.apply(variables, templates, pose, presence)
    # M+1 components including the background (reference part_decoder.py:195)
    assert res.transformed_templates.shape == (B, M + 1, C, *OS)
    exp_mix_c = 1 if use_alpha else C
    assert res.mixing_logits.shape == (B, M + 1, exp_mix_c, *OS)
    ll = res.pdf.log_prob(jnp.zeros((B, C, *OS)))
    assert np.isfinite(np.asarray(ll)).all()


def test_decoder_with_bg_image():
    dec = TemplateBasedImageDecoder(n_templates=M, template_size=TS,
                                    output_size=OS, use_alpha_channel=True)
    templates = jax.random.uniform(jax.random.PRNGKey(1), (B, M, C, *TS))
    pose = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0, 1, 0]), (B, M, 6))
    bg_image = jnp.full((B, C, *OS), 0.25)
    variables = dec.init(jax.random.PRNGKey(0), templates, pose,
                         bg_image=bg_image)
    res = dec.apply(variables, templates, pose, bg_image=bg_image)
    np.testing.assert_allclose(np.asarray(res.transformed_templates[:, -1]),
                               np.asarray(bg_image))


def test_zero_presence_kills_component_mixing():
    dec = TemplateBasedImageDecoder(n_templates=M, template_size=TS,
                                    output_size=OS, use_alpha_channel=True)
    templates = jax.random.uniform(jax.random.PRNGKey(1), (B, M, C, *TS))
    pose = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0, 1, 0]), (B, M, 6))
    presence = jnp.zeros((B, M))
    variables = dec.init(jax.random.PRNGKey(0), templates, pose, presence)
    res = dec.apply(variables, templates, pose, presence)
    mix = np.asarray(jax.nn.softmax(res.mixing_logits, 1))
    # all mass on background when no part is present
    np.testing.assert_allclose(mix[:, -1], np.ones_like(mix[:, -1]),
                               atol=1e-6)


def test_fused_impl_auto_matches_xla_on_cpu():
    """'auto' resolves to the XLA einsum path off-TPU (part_decoder.py):
    target_ll must be identical to an explicit fused_impl='xla' module."""
    kwargs = dict(n_templates=M, template_size=TS, output_size=OS,
                  use_alpha_channel=True, background_value=True)
    dec_auto = TemplateBasedImageDecoder(fused_impl="auto", **kwargs)
    dec_xla = TemplateBasedImageDecoder(fused_impl="xla", **kwargs)
    templates = jax.random.uniform(jax.random.PRNGKey(1), (B, M, C, *TS))
    pose = jax.random.normal(jax.random.PRNGKey(2), (B, M, 6)) * 0.1 \
        + jnp.asarray([1, 0, 0, 0, 1, 0])
    presence = jax.random.uniform(jax.random.PRNGKey(3), (B, M))
    target = jax.random.uniform(jax.random.PRNGKey(4), (B, C, *OS))
    variables = dec_auto.init(jax.random.PRNGKey(0), templates, pose,
                              presence, target=target)
    ll_a = dec_auto.apply(variables, templates, pose, presence,
                          target=target).target_ll
    ll_x = dec_xla.apply(variables, templates, pose, presence,
                         target=target).target_ll
    assert jax.default_backend() == "cpu"
    assert np.array_equal(np.asarray(ll_a), np.asarray(ll_x))
