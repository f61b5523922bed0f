"""Numerical parity against the torch reference (fixed-seed goldens).

Fixtures in tests/golden/*.npz were produced by tools/gen_golden.py running
the PyTorch reference. These tests load the reference state_dicts through
scae_tpu.utils.torch_port and require output agreement — coverage the
reference itself never had (its suite asserts shapes only, SURVEY.md §4).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scae_tpu.ops.attention import qkv_attention
from scae_tpu.ops.geometry import geometric_transform
from scae_tpu.ops.gmm import GaussianMixture
from scae_tpu.ops.pooling import multiple_attention_pooling_2d
from scae_tpu.ops.warp import affine_warp
from scae_tpu.utils import torch_port

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

# the torch-parity goldens are the smoke tier's core (README "Test
# tiers"); the full-model goldens keep their additional `slow` mark
# (smoke runs deselect them via -m "smoke and not slow")
pytestmark = pytest.mark.smoke


def load(name):
    data = dict(np.load(os.path.join(GOLDEN, f"{name}.npz")))
    sd = {k[3:]: v for k, v in data.items() if k.startswith("sd/")}
    arrays = {k: v for k, v in data.items() if not k.startswith("sd/")}
    return arrays, sd


def close(got, want, rtol=1e-5, atol=1e-5):
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=rtol, atol=atol)


# ------------------------------------------------------------------ ops


def test_geometric_transform_golden():
    g, _ = load("geometric_transform")
    pose = jnp.asarray(g["pose"])
    close(geometric_transform(pose), g["flat"])
    close(geometric_transform(pose, as_matrix=True), g["matrix"])
    close(geometric_transform(pose, similarity=True), g["similarity"])
    close(geometric_transform(pose, nonlinear=False), g["linear"])
    close(geometric_transform(pose, similarity=True, as_matrix=True),
          g["sim_matrix"])


def test_grid_sample_golden():
    """affine_warp == F.affine_grid + F.grid_sample(align_corners=False)."""
    g, _ = load("grid_sample")
    H, W = [int(v) for v in g["out_size"]]
    pose = g["theta"].reshape(-1, 6)  # rows (a,b,tx,c,d,ty)
    got = affine_warp(jnp.asarray(g["templates"]), jnp.asarray(pose), (H, W))
    close(got, g["out"], atol=1e-5)


def test_gmm_golden():
    g, _ = load("gmm")
    gmm = GaussianMixture.make_from_stats(
        jnp.asarray(g["loc"]), jnp.asarray(g["scale"]),
        jnp.asarray(g["logits"]))
    close(gmm.log_prob(jnp.asarray(g["x"])), g["log_prob"])
    close(gmm.mean(), g["mean"])
    close(gmm.mode(), g["mode"])


def test_qkv_attention_golden():
    g, _ = load("qkv_attention")
    q, k, v = [jnp.asarray(g[n]) for n in "qkv"]
    close(qkv_attention(q, k, v), g["out"])
    close(qkv_attention(q, k, v, jnp.asarray(g["presence"])),
          g["out_masked"])


def test_attention_pooling_golden():
    g, _ = load("attention_pooling")
    close(multiple_attention_pooling_2d(jnp.asarray(g["fm"]), 3), g["out"],
          atol=1e-5)


# ------------------------------------------------------------- modules


def test_set_transformer_golden():
    from scae_tpu.models.set_transformer import SetTransformer
    g, sd = load("set_transformer")
    st = SetTransformer(dim_in=23, dim_hidden=16, dim_out=24, n_outputs=5,
                        n_layers=3, n_heads=2, layer_norm=True)
    params = torch_port.port_set_transformer(sd)
    x = jnp.asarray(g["x"])
    presence = jnp.asarray(g["presence"])
    close(st.apply({"params": params}, x, presence), g["out"], atol=1e-4)
    close(st.apply({"params": params}, x), g["out_nopres"], atol=1e-4)


def test_part_encoder_golden():
    from scae_tpu.models.part_encoder import CNNEncoder, CapsuleImageEncoder
    g, sd = load("part_encoder")
    cnn = CNNEncoder(input_shape=(1, 28, 28), out_channels=(32,) * 4,
                     kernel_sizes=(3,) * 4, strides=(2, 2, 1, 1))
    enc = CapsuleImageEncoder(input_shape=(1, 28, 28), encoder=cnn,
                              n_caps=8, n_poses=6, n_special_features=5,
                              noise_scale=0.0)
    params = torch_port.port_capsule_image_encoder(sd)
    res = enc.apply({"params": params}, jnp.asarray(g["img"]))
    close(res.pose, g["pose"], atol=1e-5)
    close(res.presence, g["presence"], atol=1e-5)
    close(res.feature, g["feature"], atol=1e-4)


def test_part_decoder_golden():
    from scae_tpu.models.part_decoder import (TemplateBasedImageDecoder,
                                              TemplateGenerator)
    g, sd = load("part_decoder")
    gen_sd = {k[4:]: v for k, v in sd.items() if k.startswith("gen.")}
    dec_sd = {k[4:]: v for k, v in sd.items() if k.startswith("dec.")}

    gen = TemplateGenerator(n_templates=6, n_channels=1, template_size=(5, 5),
                            template_nonlin="sigmoid", dim_feature=5,
                            colorize_templates=True, color_nonlin="sigmoid")
    dec = TemplateBasedImageDecoder(n_templates=6, template_size=(5, 5),
                                    output_size=(12, 12),
                                    learn_output_scale=True,
                                    use_alpha_channel=True,
                                    background_value=True)
    gen_params = torch_port.port_template_generator(gen_sd)
    dec_params = torch_port.port_template_decoder(dec_sd)

    tres = gen.apply({"params": gen_params},
                     feature=jnp.asarray(g["feature"]))
    close(tres.raw_templates, g["raw_templates"])
    close(tres.templates, g["templates"], atol=1e-5)

    dres = dec.apply({"params": dec_params}, tres.templates,
                     jnp.asarray(g["pose"]), jnp.asarray(g["presence"]))
    close(dres.transformed_templates, g["transformed_templates"], atol=1e-5)
    # reference materializes mixing logits at full channel count; ours keep
    # a broadcastable singleton channel — compare via broadcasting
    want_mix = g["mixing_logits"]
    got_mix = np.broadcast_to(np.asarray(dres.mixing_logits), want_mix.shape)
    close(got_mix, want_mix, atol=1e-4)
    close(dres.pdf.log_prob(jnp.asarray(g["target"])), g["ll"], atol=1e-4)
    close(dres.pdf.mode(), g["mode"], atol=1e-5)


def test_part_decoder_color_golden():
    """C=3 path: color MLP (reference part_decoder.py:71-105), color
    decoder + GMM — previously covered only by self-consistency tests
    (VERDICT round-2 missing item 3)."""
    from scae_tpu.models.part_decoder import (TemplateBasedImageDecoder,
                                              TemplateGenerator)
    g, sd = load("part_decoder_color")
    gen_sd = {k[4:]: v for k, v in sd.items() if k.startswith("gen.")}
    dec_sd = {k[4:]: v for k, v in sd.items() if k.startswith("dec.")}

    gen = TemplateGenerator(n_templates=6, n_channels=3, template_size=(5, 5),
                            template_nonlin="sigmoid", dim_feature=5,
                            colorize_templates=True, color_nonlin="sigmoid")
    dec = TemplateBasedImageDecoder(n_templates=6, template_size=(5, 5),
                                    output_size=(12, 12),
                                    learn_output_scale=True,
                                    use_alpha_channel=True,
                                    background_value=True)
    gen_params = torch_port.port_template_generator(gen_sd)
    dec_params = torch_port.port_template_decoder(dec_sd)

    tres = gen.apply({"params": gen_params},
                     feature=jnp.asarray(g["feature"]))
    close(tres.raw_templates, g["raw_templates"])
    close(tres.templates, g["templates"], atol=1e-5)

    dres = dec.apply({"params": dec_params}, tres.templates,
                     jnp.asarray(g["pose"]), jnp.asarray(g["presence"]))
    close(dres.transformed_templates, g["transformed_templates"], atol=1e-5)
    want_mix = g["mixing_logits"]
    got_mix = np.broadcast_to(np.asarray(dres.mixing_logits), want_mix.shape)
    close(got_mix, want_mix, atol=1e-4)
    close(dres.pdf.log_prob(jnp.asarray(g["target"])), g["ll"], atol=1e-4)
    close(dres.pdf.mode(), g["mode"], atol=1e-5)


@pytest.fixture(scope="module")
def scae_color_golden():
    from scae_tpu.factory import make_scae
    g, sd = load("scae_color")
    model = make_scae(dict(
        image_shape=(3, 24, 24), n_classes=10,
        n_part_caps=8, n_obj_caps=6,
        pcae_cnn_encoder_params=dict(out_channels=[32] * 4),
        pcae_encoder_params=dict(noise_scale=0.0),
        pcae_template_generator_params=dict(template_size=(6, 6)),
        ocae_decoder_capsule_params=dict(noise_type=None, noise_scale=0.0),
        scae_params=dict(reconstruct_alternatives=True,
                         compat_posterior_cls_bug=True,
                         compat_posterior_gate_bug=True,
                         compat_double_softmax_xe=True),
    ))
    params = torch_port.port_scae(sd, n_obj_caps=6)
    res = model.apply({"params": params}, jnp.asarray(g["img"]))
    return g, model, res


@pytest.mark.slow
def test_scae_color_forward_golden(scae_color_golden):
    g, model, res = scae_color_golden
    close(res.part_pose, g["part_pose"], atol=1e-5)
    close(res.part_presence, g["part_presence"], atol=1e-5)
    close(res.obj.caps_presence, g["caps_presence"], atol=1e-4)
    close(res.obj.vote, g["vote"], atol=1e-3)
    close(res.obj.log_prob, g["log_prob"], rtol=1e-3)
    close(res.obj.winner, g["winner"], atol=1e-3)
    close(res.obj.soft_winner, g["soft_winner"], atol=1e-3)
    B = g["img"].shape[0]
    rec_ll = jnp.mean(jnp.sum(
        res.rec.pdf.log_prob(jnp.asarray(g["img"])).reshape(B, -1), -1))
    close(rec_ll, g["rec_mean_ll"], rtol=1e-4)


@pytest.mark.slow
def test_scae_color_loss_golden(scae_color_golden):
    g, model, res = scae_color_golden
    loss, log = model.loss(res, jnp.asarray(g["img"]),
                           jnp.asarray(g["label"]))
    close(loss, g["loss"], rtol=1e-3)
    for k, v in g.items():
        if k.startswith("log/"):
            name = k[4:]
            assert name in log, name
            close(log[name], v, rtol=2e-3, atol=1e-4)
    close(model.calculate_accuracy(res, jnp.asarray(g["label"])),
          g["accuracy"])


def test_object_decoder_golden():
    from scae_tpu.models.object_decoder import (CapsuleLayer,
                                                CapsuleObjectDecoder)
    g, sd = load("object_decoder")
    layer = CapsuleLayer(n_caps=5, dim_feature=24, n_votes=6, dim_caps=8,
                         hidden_sizes=(16,), learn_vote_scale=True,
                         allow_deformations=True, noise_type=None,
                         noise_scale=0.0, similarity_transform=False)
    dec = CapsuleObjectDecoder(capsule_layer=layer)
    params = torch_port.port_capsule_object_decoder(sd, n_caps=5)
    res = dec.apply({"params": params}, jnp.asarray(g["enc"]),
                    jnp.asarray(g["pose"]), jnp.asarray(g["presence"]))
    close(res.vote, g["vote"], atol=1e-4)
    close(res.scale, g["scale"], atol=1e-5)
    close(res.vote_presence, g["vote_presence"], atol=1e-5)
    close(res.caps_presence, g["caps_presence"], atol=1e-5)
    close(res.log_prob, g["log_prob"], rtol=1e-4)
    close(res.winner, g["winner"], atol=1e-4)
    close(res.winner_presence, g["winner_presence"], atol=1e-5)
    close(res.soft_winner, g["soft_winner"], atol=1e-4)
    close(res.soft_winner_presence, g["soft_winner_presence"], atol=1e-5)
    close(res.posterior_mixing_prob, g["posterior_mixing_prob"], atol=1e-5)
    close(res.mixing_logit, g["mixing_logit"], rtol=1e-4, atol=1e-4)
    close(res.cpr_dynamic_reg_loss, g["cpr_dynamic_reg_loss"], rtol=1e-4)


@pytest.fixture(scope="module")
def scae_golden():
    from scae_tpu.factory import make_scae
    g, sd = load("scae")
    model = make_scae(dict(
        image_shape=(1, 28, 28), n_classes=10,
        n_part_caps=8, n_obj_caps=6,
        pcae_cnn_encoder_params=dict(out_channels=[32] * 4),
        pcae_encoder_params=dict(noise_scale=0.0),
        ocae_decoder_capsule_params=dict(noise_type=None, noise_scale=0.0),
        scae_params=dict(reconstruct_alternatives=True,
                         compat_posterior_cls_bug=True,
                         compat_posterior_gate_bug=True,
                         compat_double_softmax_xe=True),
    ))
    params = torch_port.port_scae(sd, n_obj_caps=6)
    res = model.apply({"params": params}, jnp.asarray(g["img"]))
    return g, model, res


@pytest.mark.slow
def test_scae_forward_golden(scae_golden):
    g, model, res = scae_golden
    close(res.part_pose, g["part_pose"], atol=1e-5)
    close(res.part_presence, g["part_presence"], atol=1e-5)
    close(res.obj.caps_presence, g["caps_presence"], atol=1e-4)
    close(res.obj.vote, g["vote"], atol=1e-3)
    close(res.obj.log_prob, g["log_prob"], rtol=1e-3)
    close(res.obj.winner, g["winner"], atol=1e-3)
    close(res.obj.soft_winner, g["soft_winner"], atol=1e-3)
    close(res.prior_cls_prob, g["prior_cls_prob"], atol=1e-5)
    close(res.posterior_cls_prob, g["posterior_cls_prob"], atol=1e-5)

    B = g["img"].shape[0]
    rec_ll = jnp.mean(jnp.sum(
        res.rec.pdf.log_prob(jnp.asarray(g["img"])).reshape(B, -1), -1))
    close(rec_ll, g["rec_mean_ll"], rtol=1e-4)
    bu_ll = jnp.mean(jnp.sum(
        res.bottom_up_rec.pdf.log_prob(jnp.asarray(g["img"]))
        .reshape(B, -1), -1))
    close(bu_ll, g["bottom_up_ll"], rtol=1e-4)
    td_ll = jnp.mean(jnp.sum(
        res.top_down_rec.pdf.log_prob(jnp.asarray(g["img"]))
        .reshape(B, -1), -1))
    close(td_ll, g["top_down_ll"], rtol=1e-4)


@pytest.mark.slow
def test_scae_loss_golden(scae_golden):
    g, model, res = scae_golden
    loss, log = model.loss(res, jnp.asarray(g["img"]),
                           jnp.asarray(g["label"]))
    close(loss, g["loss"], rtol=1e-3)
    for k, v in g.items():
        if k.startswith("log/"):
            name = k[4:]
            assert name in log, name
            close(log[name], v, rtol=2e-3, atol=1e-4)
    close(model.calculate_accuracy(res, jnp.asarray(g["label"])),
          g["accuracy"])


@pytest.mark.slow
def test_train_trajectory_golden():
    """Optimization-trajectory parity: N jitted train steps (RMSprop with
    the harness' eps=1e-2/B^2 rule, noise off, identical init via
    torch_port) must track the torch reference's per-step losses.
    Fixture: tools/gen_golden.py::gen_train_trajectory (reference
    base_experiment.py:109-126 + :47)."""
    import optax

    from scae_tpu.factory import make_scae
    from scae_tpu.optim import make_optimizer

    data = dict(np.load(os.path.join(GOLDEN, "train_trajectory.npz")))
    init_sd = {k[8:]: v for k, v in data.items()
               if k.startswith("init_sd/")}
    imgs = jnp.asarray(data["imgs"])           # (N, B, 1, 28, 28)
    labels = jnp.asarray(data["labels"])       # (N, B)
    n_steps, B = labels.shape

    model = make_scae(dict(
        image_shape=(1, 28, 28), n_classes=10,
        n_part_caps=8, n_obj_caps=6,
        pcae_cnn_encoder_params=dict(out_channels=[32] * 4),
        pcae_encoder_params=dict(noise_scale=0.0),
        ocae_decoder_capsule_params=dict(noise_type=None, noise_scale=0.0),
        scae_params=dict(reconstruct_alternatives=False,
                         compat_posterior_cls_bug=True,
                         compat_posterior_gate_bug=True,
                         compat_double_softmax_xe=True),
    ))
    params = torch_port.port_scae(init_sd, n_obj_caps=6)
    tx = make_optimizer("rmsprop", 1e-4, batch_size=B, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, img, label, rng):
        def lf(p):
            res = model.apply({"params": p}, img, deterministic=False,
                              rngs={"noise": rng})
            loss, _ = model.loss(res, img, label)
            return loss

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    rng = jax.random.PRNGKey(0)  # noise scales are all zero -> inert
    for t in range(n_steps):
        params, opt_state, loss = step(params, opt_state, imgs[t],
                                       labels[t], jax.random.fold_in(rng, t))
        losses.append(float(loss))

    # per-step losses transitively verify grads + optimizer updates: the
    # loss at step t depends on every preceding gradient/update
    close(np.asarray(losses), data["losses"], rtol=2e-3)

    # and the accumulated parameter movement matches the reference's
    final_sd = {k[9:]: v for k, v in data.items()
                if k.startswith("final_sd/")}
    final_ref = torch_port.port_scae(final_sd, n_obj_caps=6)
    init_ref = torch_port.port_scae(init_sd, n_obj_caps=6)
    flat_ours = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_final = dict(jax.tree_util.tree_flatten_with_path(final_ref)[0])
    flat_init = dict(jax.tree_util.tree_flatten_with_path(init_ref)[0])
    checked = 0
    for key, ours in flat_ours.items():
        want_delta = np.asarray(flat_final[key]) - np.asarray(flat_init[key])
        got_delta = np.asarray(ours) - np.asarray(flat_init[key])
        scale = np.abs(want_delta).max()
        if scale < 1e-7:      # params the reference never moves (e.g. the
            continue          # posterior classifier under the cls bug)
        np.testing.assert_allclose(got_delta, want_delta, atol=0.05 * scale,
                                   rtol=0.05)
        checked += 1
    assert checked > 10, f"only {checked} moving params compared"


def test_radam_trajectory_golden():
    import optax
    from scae_tpu.optim import lookahead, radam
    g, _ = load("radam")
    x0, target = jnp.asarray(g["x0"]), jnp.asarray(g["target"])

    def run(tx, n=15):
        params = x0
        state = tx.init(params)
        traj = []
        for _ in range(n):
            grads = jax.grad(lambda p: jnp.sum((p - target) ** 2))(params)
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
            traj.append(np.asarray(params))
        return np.stack(traj)

    # torch computes the rectification scalar in float64 (math.sqrt);
    # ours is f32 under jit -> small per-step drift accumulates
    close(run(radam(0.05, eps=1e-8)), g["traj"], atol=2e-4)
    close(run(lookahead(radam(0.05, eps=1e-8), alpha=0.5, k=3)),
          g["traj_lookahead"], atol=2e-4)


def test_rmsprop_trajectory_golden():
    """optax.rmsprop(eps_in_sqrt=False) == torch.optim.RMSprop with the
    harness' alpha/momentum/eps settings (base_experiment.py:48-56)."""
    import optax

    from scae_tpu.optim import make_optimizer
    g, _ = load("rmsprop")
    x0, target = jnp.asarray(g["x0"]), jnp.asarray(g["target"])
    tx = make_optimizer("rmsprop", 0.01, batch_size=128, momentum=0.9)

    params, state = x0, tx.init(x0)
    traj = []
    for _ in range(15):
        grads = jax.grad(lambda p: jnp.sum((p - target) ** 2))(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        traj.append(np.asarray(params))
    close(np.stack(traj), g["traj"], atol=5e-4)
