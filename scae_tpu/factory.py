"""Model factory / config materialization.

Parity target: reference ``torch_scae/factory.py:10-178`` — the canonical
default hyperparameters for all six sub-configs, user overrides dict-merged
on top, with asserts forbidding overrides of derived keys (factory.py:32,
52-54, 66-68, 88-89, 101-103, 119) and cross-component derived values
(template count = part-caps count :56; decoder n_votes = n_templates :107;
set-transformer dim_in :79-86).

Fixed defect (SURVEY.md §2.4(7)): the reference computes the flattened
template contribution to ``dim_in`` as ``template_size[0] ** 2``; here it is
``template_size[0] * template_size[1]`` (identical for the square templates
every shipped config uses).
"""

from types import SimpleNamespace

from scae_tpu.models.object_decoder import CapsuleLayer, CapsuleObjectDecoder
from scae_tpu.models.part_decoder import (
    TemplateBasedImageDecoder,
    TemplateGenerator,
)
from scae_tpu.models.part_encoder import CNNEncoder, CapsuleImageEncoder
from scae_tpu.models.set_transformer import SetTransformer
from scae_tpu.models.scae import SCAE


def prepare_model_params(
        image_shape,
        n_classes,
        n_part_caps,
        n_obj_caps,
        pcae_cnn_encoder_params=None,
        pcae_encoder_params=None,
        pcae_template_generator_params=None,
        pcae_decoder_params=None,
        ocae_encoder_set_transformer_params=None,
        ocae_decoder_capsule_params=None,
        scae_params=None,
):
    """Merge user overrides onto the canonical architecture defaults."""
    pcae_cnn_encoder_params = dict(pcae_cnn_encoder_params or {})
    pcae_encoder_params = dict(pcae_encoder_params or {})
    pcae_template_generator_params = dict(pcae_template_generator_params or {})
    pcae_decoder_params = dict(pcae_decoder_params or {})
    ocae_encoder_set_transformer_params = dict(
        ocae_encoder_set_transformer_params or {})
    ocae_decoder_capsule_params = dict(ocae_decoder_capsule_params or {})
    scae_params = dict(scae_params or {})

    assert 'input_shape' not in pcae_cnn_encoder_params
    pcae_cnn_encoder = dict(
        input_shape=tuple(image_shape),
        out_channels=[128] * 4,
        kernel_sizes=[3, 3, 3, 3],
        strides=[2, 2, 1, 1],
        activate_final=True,
        compute_dtype=None,
    )
    pcae_cnn_encoder.update(pcae_cnn_encoder_params)

    assert 'input_shape' not in pcae_encoder_params
    pcae_encoder = dict(
        input_shape=tuple(image_shape),
        n_caps=n_part_caps,
        n_poses=6,
        n_special_features=16,
        similarity_transform=False,
    )
    pcae_encoder.update(pcae_encoder_params)

    assert 'n_templates' not in pcae_template_generator_params
    assert 'n_channels' not in pcae_template_generator_params
    assert 'dim_feature' not in pcae_template_generator_params
    pcae_template_generator = dict(
        n_templates=pcae_encoder['n_caps'],
        n_channels=image_shape[0],
        template_size=(11, 11),
        template_nonlin='sigmoid',
        dim_feature=pcae_encoder['n_special_features'],
        colorize_templates=True,
        color_nonlin='sigmoid',
    )
    pcae_template_generator.update(pcae_template_generator_params)

    assert 'n_templates' not in pcae_decoder_params
    assert 'template_size' not in pcae_decoder_params
    assert 'output_size' not in pcae_decoder_params
    pcae_decoder = dict(
        n_templates=pcae_template_generator['n_templates'],
        template_size=pcae_template_generator['template_size'],
        output_size=tuple(image_shape[1:]),
        learn_output_scale=False,
        use_alpha_channel=True,
        background_value=True,
        use_fused_ll=True,
        fused_tap_dtype='float32',
        fused_impl='xla',
    )
    pcae_decoder.update(pcae_decoder_params)

    _ocae_st_dim_in = (
        pcae_encoder['n_poses']
        + pcae_template_generator['dim_feature']
        + 1
        + (pcae_template_generator['n_channels']
           * pcae_template_generator['template_size'][0]
           * pcae_template_generator['template_size'][1])
    )

    assert '_ocae_st_dim_in' not in ocae_encoder_set_transformer_params
    assert 'n_obj_caps' not in ocae_encoder_set_transformer_params
    ocae_encoder_set_transformer = dict(
        n_layers=3,
        n_heads=1,
        dim_in=_ocae_st_dim_in,
        dim_hidden=16,
        dim_out=256,
        n_outputs=n_obj_caps,
        layer_norm=True,
        use_pallas_attention=False,
    )
    ocae_encoder_set_transformer.update(ocae_encoder_set_transformer_params)

    assert 'n_caps' not in ocae_decoder_capsule_params
    assert 'dim_feature' not in ocae_decoder_capsule_params
    assert 'n_votes' not in ocae_decoder_capsule_params
    ocae_decoder_capsule = dict(
        n_caps=ocae_encoder_set_transformer['n_outputs'],
        dim_feature=ocae_encoder_set_transformer['dim_out'],
        n_votes=pcae_decoder['n_templates'],
        dim_caps=32,
        hidden_sizes=(128,),
        caps_dropout_rate=0.0,
        learn_vote_scale=True,
        allow_deformations=True,
        noise_type='uniform',
        noise_scale=4.,
        similarity_transform=False,
    )
    ocae_decoder_capsule.update(ocae_decoder_capsule_params)

    assert 'n_classes' not in scae_params
    scae = dict(
        n_classes=n_classes,
        vote_type='enc',
        presence_type='enc',
        stop_grad_caps_input=True,
        stop_grad_caps_target=True,
        caps_ll_weight=1.,
        cpr_dynamic_reg_weight=10,
        prior_sparsity_loss_type='l2',
        prior_within_example_sparsity_weight=2.0,
        prior_between_example_sparsity_weight=0.35,
        posterior_sparsity_loss_type='entropy',
        posterior_within_example_sparsity_weight=0.7,
        posterior_between_example_sparsity_weight=0.2,
    )
    scae.update(scae_params)

    return dict(
        image_shape=tuple(image_shape),
        n_classes=n_classes,
        n_part_caps=n_part_caps,
        n_obj_caps=n_obj_caps,
        pcae_cnn_encoder=pcae_cnn_encoder,
        pcae_encoder=pcae_encoder,
        pcae_template_generator=pcae_template_generator,
        pcae_decoder=pcae_decoder,
        ocae_encoder_set_transformer=ocae_encoder_set_transformer,
        ocae_decoder_capsule=ocae_decoder_capsule,
        scae=scae,
    )


def make_scae(model_params: dict) -> SCAE:
    """Construct the SCAE Linen module from a model-params dict
    (reference factory.py:152-178)."""
    config = SimpleNamespace(**prepare_model_params(**model_params))

    cnn = config.pcae_cnn_encoder
    cnn_encoder = CNNEncoder(
        input_shape=tuple(cnn['input_shape']),
        out_channels=tuple(cnn['out_channels']),
        kernel_sizes=tuple(cnn['kernel_sizes']),
        strides=tuple(cnn['strides']),
        activate_final=cnn['activate_final'],
        compute_dtype=cnn.get('compute_dtype'),
    )

    pe = config.pcae_encoder
    part_encoder = CapsuleImageEncoder(
        input_shape=tuple(pe['input_shape']),
        encoder=cnn_encoder,
        n_caps=pe['n_caps'],
        n_poses=pe['n_poses'],
        n_special_features=pe['n_special_features'],
        noise_scale=pe.get('noise_scale', 4.0),
        similarity_transform=pe['similarity_transform'],
    )

    tg = config.pcae_template_generator
    template_generator = TemplateGenerator(
        n_templates=tg['n_templates'],
        n_channels=tg['n_channels'],
        template_size=tuple(tg['template_size']),
        template_nonlin=tg['template_nonlin'],
        dim_feature=tg['dim_feature'],
        colorize_templates=tg['colorize_templates'],
        color_nonlin=tg['color_nonlin'],
    )

    pd = config.pcae_decoder
    part_decoder = TemplateBasedImageDecoder(
        n_templates=pd['n_templates'],
        template_size=tuple(pd['template_size']),
        output_size=tuple(pd['output_size']),
        learn_output_scale=pd['learn_output_scale'],
        use_alpha_channel=pd['use_alpha_channel'],
        background_value=pd['background_value'],
        use_fused_ll=pd.get('use_fused_ll', True),
        fused_tap_dtype=pd.get('fused_tap_dtype', 'float32'),
        fused_impl=pd.get('fused_impl', 'xla'),
    )

    st = config.ocae_encoder_set_transformer
    obj_encoder = SetTransformer(
        dim_in=st['dim_in'],
        dim_hidden=st['dim_hidden'],
        dim_out=st['dim_out'],
        n_outputs=st['n_outputs'],
        n_layers=st['n_layers'],
        n_heads=st['n_heads'],
        layer_norm=st['layer_norm'],
        n_inducing_points=st.get('n_inducing_points'),
        use_pallas_attention=st.get('use_pallas_attention', False),
    )

    oc = config.ocae_decoder_capsule
    capsule_layer = CapsuleLayer(
        n_caps=oc['n_caps'],
        dim_feature=oc['dim_feature'],
        n_votes=oc['n_votes'],
        dim_caps=oc['dim_caps'],
        hidden_sizes=tuple(oc['hidden_sizes']),
        caps_dropout_rate=oc['caps_dropout_rate'],
        learn_vote_scale=oc['learn_vote_scale'],
        allow_deformations=oc['allow_deformations'],
        noise_type=oc['noise_type'],
        noise_scale=oc['noise_scale'],
        similarity_transform=oc['similarity_transform'],
    )
    obj_decoder = CapsuleObjectDecoder(capsule_layer=capsule_layer)

    return SCAE(
        part_encoder=part_encoder,
        template_generator=template_generator,
        part_decoder=part_decoder,
        obj_encoder=obj_encoder,
        obj_decoder=obj_decoder,
        **config.scae,
    )
