"""Generate golden parity fixtures by running the torch reference.

Runs the PyTorch reference (read-only at /root/reference, with a tiny
`monty` shim) on fixed-seed inputs and stores inputs, state_dicts and
outputs as .npz files under tests/golden/. The scae_tpu parity tests load
these fixtures; the reference itself is NOT required at test time.

Usage:  python tools/gen_golden.py
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "refshim"))  # monty shim
sys.path.insert(0, "/root/reference")

import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

OUT_DIR = os.path.join(HERE, "..", "tests", "golden")
os.makedirs(OUT_DIR, exist_ok=True)

torch.manual_seed(0)
np.random.seed(0)


def save(name, **arrays):
    path = os.path.join(OUT_DIR, f"{name}.npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path}: {sorted(arrays)[:8]}{'...' if len(arrays) > 8 else ''}")


def flat_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def prefixed(sd):
    """np.savez-safe flat dict with sd/ prefix."""
    return {f"sd/{k}": v for k, v in sd.items()}


# ---------------------------------------------------------------- 1. cv_ops
def gen_geometric_transform():
    from torch_scae import cv_ops
    g = torch.Generator().manual_seed(42)
    pose = torch.randn(7, 5, 6, generator=g)
    # NOTE: the reference mutates its input in-place (theta *= 2*pi on a
    # torch.split view, cv_ops.py:45), so each call gets a fresh clone and
    # the input is snapshotted up front.
    pose_np = pose.numpy().copy()
    save(
        "geometric_transform",
        pose=pose_np,
        flat=cv_ops.geometric_transform(pose.clone()).numpy(),
        matrix=cv_ops.geometric_transform(pose.clone(),
                                          as_matrix=True).numpy(),
        similarity=cv_ops.geometric_transform(pose.clone(),
                                              similarity=True).numpy(),
        linear=cv_ops.geometric_transform(pose.clone(),
                                          nonlinear=False).numpy(),
        sim_matrix=cv_ops.geometric_transform(
            pose.clone(), similarity=True, as_matrix=True).numpy(),
    )


# ------------------------------------------------------------- 2. grid warp
def gen_grid_sample():
    g = torch.Generator().manual_seed(43)
    B, C, Ht, Wt, H, W = 6, 2, 5, 7, 9, 11
    templates = torch.rand(B, C, Ht, Wt, generator=g)
    theta = torch.randn(B, 2, 3, generator=g) * 0.4 \
        + torch.tensor([[1.0, 0, 0], [0, 1.0, 0]])
    grid = F.affine_grid(theta, [B, C, H, W], align_corners=False)
    out = F.grid_sample(templates, grid, align_corners=False)
    save("grid_sample", templates=templates.numpy(), theta=theta.numpy(),
         out=out.numpy(), out_size=np.asarray([H, W]))


# ---------------------------------------------------------------- 3. GMM
def gen_gmm():
    from torch_scae.distributions import GaussianMixture
    g = torch.Generator().manual_seed(44)
    loc = torch.randn(3, 4, 2, 5, 5, generator=g)
    logits = torch.randn(3, 4, 2, 5, 5, generator=g)
    scale = torch.tensor([0.7])
    x = torch.randn(3, 2, 5, 5, generator=g)
    gmm = GaussianMixture.make_from_stats(loc, scale, logits)
    save("gmm", loc=loc.numpy(), logits=logits.numpy(),
         scale=scale.numpy(), x=x.numpy(),
         log_prob=gmm.log_prob(x).numpy(),
         mean=gmm.mean().numpy(),
         mode=gmm.mode().numpy())


# ----------------------------------------------------------- 4. attention
def gen_attention():
    from torch_scae.set_transformer import qkv_attention
    g = torch.Generator().manual_seed(45)
    q = torch.randn(2, 5, 8, generator=g)
    k = torch.randn(2, 7, 8, generator=g)
    v = torch.randn(2, 7, 12, generator=g)
    presence = (torch.rand(2, 7, generator=g) > 0.3).float()
    save("qkv_attention", q=q.numpy(), k=k.numpy(), v=v.numpy(),
         presence=presence.numpy(),
         out=qkv_attention(q, k, v).numpy(),
         out_masked=qkv_attention(q, k, v, presence).numpy())


# ------------------------------------------------------------- 5. pooling
def gen_pooling():
    from torch_scae.nn_ext import multiple_attention_pooling_2d
    g = torch.Generator().manual_seed(46)
    fm = torch.randn(2, 3 * 5, 4, 6, generator=g)
    save("attention_pooling", fm=fm.numpy(),
         out=multiple_attention_pooling_2d(fm, 3).numpy())


# ----------------------------------------------------- 6. set transformer
def gen_set_transformer():
    from torch_scae.set_transformer import SetTransformer
    torch.manual_seed(47)
    st = SetTransformer(dim_in=23, dim_hidden=16, dim_out=24, n_outputs=5,
                        n_layers=3, n_heads=2, layer_norm=True)
    st.eval()
    g = torch.Generator().manual_seed(48)
    x = torch.randn(3, 9, 23, generator=g)
    presence = (torch.rand(3, 9, generator=g) > 0.2).float()
    with torch.no_grad():
        out = st(x, presence)
        out_nopres = st(x)
    save("set_transformer", x=x.numpy(), presence=presence.numpy(),
         out=out.numpy(), out_nopres=out_nopres.numpy(),
         **prefixed(flat_sd(st)))


# ------------------------------------------------------- 7. part encoder
def gen_part_encoder():
    from torch_scae.part_encoder import CNNEncoder, CapsuleImageEncoder
    torch.manual_seed(49)
    cnn = CNNEncoder(input_shape=(1, 28, 28), out_channels=[32] * 4,
                     kernel_sizes=[3, 3, 3, 3], strides=[2, 2, 1, 1])
    enc = CapsuleImageEncoder(input_shape=(1, 28, 28), encoder=cnn,
                              n_caps=8, n_poses=6, n_special_features=5,
                              noise_scale=0.0)
    enc.eval()
    g = torch.Generator().manual_seed(50)
    img = torch.rand(3, 1, 28, 28, generator=g)
    with torch.no_grad():
        res = enc(img)
    save("part_encoder", img=img.numpy(), pose=res.pose.numpy(),
         presence=res.presence.numpy(), feature=res.feature.numpy(),
         **prefixed(flat_sd(enc)))


# -------------------------------------------- 8. template gen + decoder
def gen_part_decoder():
    from torch_scae.part_decoder import (TemplateBasedImageDecoder,
                                         TemplateGenerator)
    torch.manual_seed(51)
    np.random.seed(51)
    M, C, TS, OS = 6, 1, (5, 5), (12, 12)
    gen = TemplateGenerator(n_templates=M, n_channels=C, template_size=TS,
                            template_nonlin='sigmoid', dim_feature=5,
                            colorize_templates=True, color_nonlin='sigmoid')
    dec = TemplateBasedImageDecoder(n_templates=M, template_size=TS,
                                    output_size=OS, learn_output_scale=True,
                                    use_alpha_channel=True,
                                    background_value=True)
    gen.eval(), dec.eval()
    # give alpha/bg params non-trivial values
    with torch.no_grad():
        dec.templates_alpha.uniform_(-1, 1)
        dec.bg_mixing_logit.fill_(0.3)
        dec.bg_value.fill_(-0.2)

    g = torch.Generator().manual_seed(52)
    feature = torch.randn(3, M, 5, generator=g)
    pose6 = torch.randn(3, M, 6, generator=g) * 0.3 \
        + torch.tensor([1.0, 0, 0, 0, 1.0, 0])
    presence = torch.rand(3, M, generator=g)
    target = torch.rand(3, C, *OS, generator=g)
    with torch.no_grad():
        tres = gen(feature=feature)
        dres = dec(templates=tres.templates, pose=pose6, presence=presence)
        ll = dres.pdf.log_prob(target)
        mode = dres.pdf.mode()
    save("part_decoder",
         feature=feature.numpy(), pose=pose6.numpy(),
         presence=presence.numpy(), target=target.numpy(),
         raw_templates=tres.raw_templates.numpy(),
         templates=tres.templates.numpy(),
         transformed_templates=dres.transformed_templates.numpy(),
         mixing_logits=dres.mixing_logits.numpy(),
         ll=ll.numpy(), mode=mode.numpy(),
         **prefixed({**{f"gen.{k}": v for k, v in flat_sd(gen).items()},
                     **{f"dec.{k}": v for k, v in flat_sd(dec).items()}}))


# ------------------------------------------------------ 9. capsule layer
def gen_object_decoder():
    from torch_scae.object_decoder import CapsuleLayer, CapsuleObjectDecoder
    torch.manual_seed(53)
    B, O, Fdim, V, D = 3, 5, 24, 6, 8
    layer = CapsuleLayer(n_caps=O, dim_feature=Fdim, n_votes=V, dim_caps=D,
                         hidden_sizes=[16], caps_dropout_rate=0.0,
                         learn_vote_scale=True, allow_deformations=True,
                         noise_type=None, noise_scale=0.0,
                         similarity_transform=False)
    dec = CapsuleObjectDecoder(layer)
    dec.eval()
    with torch.no_grad():
        # non-zero statics so the transform paths are exercised
        layer.cpr_static.uniform_(-0.5, 0.5)
        dec.dummy_vote.uniform_(-0.5, 0.5)
        for p in layer.caps_bias_list:
            p.uniform_(-0.3, 0.3)

    g = torch.Generator().manual_seed(54)
    enc = torch.randn(B, O, Fdim, generator=g)
    pose = torch.randn(B, V, 6, generator=g)
    presence = torch.rand(B, V, generator=g)
    with torch.no_grad():
        res = dec(enc, pose, presence)
    save("object_decoder",
         enc=enc.numpy(), pose=pose.numpy(), presence=presence.numpy(),
         vote=res.vote.numpy(), scale=res.scale.numpy(),
         vote_presence=res.vote_presence.numpy(),
         caps_presence=res.caps_presence.numpy(),
         log_prob=np.asarray(res.log_prob.numpy()),
         winner=res.winner.numpy(),
         winner_presence=res.winner_presence.numpy(),
         soft_winner=res.soft_winner.numpy(),
         soft_winner_presence=res.soft_winner_presence.numpy(),
         posterior_mixing_prob=res.posterior_mixing_prob.numpy(),
         mixing_logit=res.mixing_logit.numpy(),
         cpr_dynamic_reg_loss=np.asarray(res.cpr_dynamic_reg_loss.numpy()),
         **prefixed(flat_sd(dec)))


# ------------------------------------------------------------ 10. full SCAE
def gen_scae():
    from torch_scae.factory import make_scae
    torch.manual_seed(55)
    np.random.seed(55)
    model_params = dict(
        image_shape=(1, 28, 28), n_classes=10,
        n_part_caps=8, n_obj_caps=6,
        pcae_cnn_encoder_params=dict(out_channels=[32] * 4),
        pcae_encoder_params=dict(noise_scale=0.0),
        ocae_decoder_capsule_params=dict(noise_type=None, noise_scale=0.0),
        scae_params=dict(reconstruct_alternatives=True),
    )
    scae = make_scae(model_params)
    scae.eval()
    g = torch.Generator().manual_seed(56)
    img = torch.rand(3, 1, 28, 28, generator=g)
    label = torch.tensor([1, 4, 7])
    with torch.no_grad():
        res = scae(img)
        loss, log = scae.loss(res, img, label)
        acc = scae.calculate_accuracy(res, label)
        part_pose = scae.part_encoder(img).pose
    save("scae",
         img=img.numpy(), label=label.numpy(),
         part_pose=part_pose.numpy(),
         part_presence=res.part_presence.numpy(),
         caps_presence=res.caps_presence.numpy(),
         vote=res.vote.numpy(),
         log_prob=np.asarray(res.log_prob.numpy()),
         rec_mean_ll=np.asarray(
             res.rec.pdf.log_prob(img).flatten(1).sum(-1).mean().numpy()),
         winner=res.winner.numpy(),
         soft_winner=res.soft_winner.numpy(),
         prior_cls_prob=res.prior_cls_prob.numpy(),
         posterior_cls_prob=res.posterior_cls_prob.numpy(),
         bottom_up_ll=np.asarray(
             res.bottom_up_rec.pdf.log_prob(img).flatten(1).sum(-1)
             .mean().numpy()),
         top_down_ll=np.asarray(
             res.top_down_rec.pdf.log_prob(img).flatten(1).sum(-1)
             .mean().numpy()),
         loss=np.asarray(loss.numpy()),
         accuracy=np.asarray(acc.numpy()),
         **{f"log/{k}": np.asarray(v.numpy()) for k, v in log.items()},
         **prefixed(flat_sd(scae)))


# ---------------------------------------------- 10b. color (C=3) goldens
def gen_part_decoder_color():
    """C=3 path: per-capsule color MLP driven by special features
    (reference part_decoder.py:71-105) + 3-channel decoder/GMM."""
    from torch_scae.part_decoder import (TemplateBasedImageDecoder,
                                         TemplateGenerator)
    torch.manual_seed(61)
    np.random.seed(61)
    M, C, TS, OS = 6, 3, (5, 5), (12, 12)
    gen = TemplateGenerator(n_templates=M, n_channels=C, template_size=TS,
                            template_nonlin='sigmoid', dim_feature=5,
                            colorize_templates=True, color_nonlin='sigmoid')
    dec = TemplateBasedImageDecoder(n_templates=M, template_size=TS,
                                    output_size=OS, learn_output_scale=True,
                                    use_alpha_channel=True,
                                    background_value=True)
    gen.eval(), dec.eval()
    with torch.no_grad():
        dec.templates_alpha.uniform_(-1, 1)
        dec.bg_mixing_logit.fill_(0.3)
        dec.bg_value.fill_(-0.2)

    g = torch.Generator().manual_seed(62)
    feature = torch.randn(3, M, 5, generator=g)
    pose6 = torch.randn(3, M, 6, generator=g) * 0.3 \
        + torch.tensor([1.0, 0, 0, 0, 1.0, 0])
    presence = torch.rand(3, M, generator=g)
    target = torch.rand(3, C, *OS, generator=g)
    with torch.no_grad():
        tres = gen(feature=feature)
        dres = dec(templates=tres.templates, pose=pose6, presence=presence)
        ll = dres.pdf.log_prob(target)
        mode = dres.pdf.mode()
    save("part_decoder_color",
         feature=feature.numpy(), pose=pose6.numpy(),
         presence=presence.numpy(), target=target.numpy(),
         raw_templates=tres.raw_templates.numpy(),
         templates=tres.templates.numpy(),
         transformed_templates=dres.transformed_templates.numpy(),
         mixing_logits=dres.mixing_logits.numpy(),
         ll=ll.numpy(), mode=mode.numpy(),
         **prefixed({**{f"gen.{k}": v for k, v in flat_sd(gen).items()},
                     **{f"dec.{k}": v for k, v in flat_sd(dec).items()}}))


def gen_scae_color():
    """Full SCAE at an SVHN-ish 3x24x24 shape (color factory wiring,
    reference factory.py:79-86 dim_in includes C*Ht*Wt)."""
    from torch_scae.factory import make_scae
    torch.manual_seed(63)
    np.random.seed(63)
    model_params = dict(
        image_shape=(3, 24, 24), n_classes=10,
        n_part_caps=8, n_obj_caps=6,
        pcae_cnn_encoder_params=dict(out_channels=[32] * 4),
        pcae_encoder_params=dict(noise_scale=0.0),
        pcae_template_generator_params=dict(template_size=(6, 6)),
        ocae_decoder_capsule_params=dict(noise_type=None, noise_scale=0.0),
        scae_params=dict(reconstruct_alternatives=True),
    )
    scae = make_scae(model_params)
    scae.eval()
    g = torch.Generator().manual_seed(64)
    img = torch.rand(3, 3, 24, 24, generator=g)
    label = torch.tensor([2, 5, 8])
    with torch.no_grad():
        res = scae(img)
        loss, log = scae.loss(res, img, label)
        acc = scae.calculate_accuracy(res, label)
        part_pose = scae.part_encoder(img).pose
    save("scae_color",
         img=img.numpy(), label=label.numpy(),
         part_pose=part_pose.numpy(),
         part_presence=res.part_presence.numpy(),
         caps_presence=res.caps_presence.numpy(),
         vote=res.vote.numpy(),
         log_prob=np.asarray(res.log_prob.numpy()),
         rec_mean_ll=np.asarray(
             res.rec.pdf.log_prob(img).flatten(1).sum(-1).mean().numpy()),
         winner=res.winner.numpy(),
         soft_winner=res.soft_winner.numpy(),
         prior_cls_prob=res.prior_cls_prob.numpy(),
         posterior_cls_prob=res.posterior_cls_prob.numpy(),
         loss=np.asarray(loss.numpy()),
         accuracy=np.asarray(acc.numpy()),
         **{f"log/{k}": np.asarray(v.numpy()) for k, v in log.items()},
         **prefixed(flat_sd(scae)))


# ------------------------------------------------------------ 11. RAdam
def gen_radam():
    from torch_scae.optimizers import RAdam
    torch.manual_seed(57)
    g = torch.Generator().manual_seed(57)
    x0 = torch.randn(8, generator=g)
    target = torch.randn(8, generator=g)

    def run(use_lookahead, alpha=0.5, k=3):
        # NOTE: the reference LookAhead class cannot run under torch 2.13
        # (it skips Optimizer.__init__ -> missing step hooks), so the slow
        # -weight rule (optimizers.py:127-150) is applied manually here:
        # every k base steps, slow += alpha*(fast-slow); fast = slow.
        x = torch.nn.Parameter(x0.clone())
        opt = RAdam([x], lr=0.05, eps=1e-8)
        slow = x0.clone()
        traj = []
        for step in range(1, 16):
            if x.grad is not None:
                x.grad.zero_()
            loss = torch.sum((x - target) ** 2)
            loss.backward()
            opt.step()
            if use_lookahead and step % k == 0:
                with torch.no_grad():
                    slow.add_(0.5 * (x.detach() - slow))
                    x.copy_(slow)
            traj.append(x.detach().clone().numpy())
        return np.stack(traj)

    save("radam", x0=x0.numpy(), target=target.numpy(),
         traj=run(False), traj_lookahead=run(True))


def gen_rmsprop():
    """torch.optim.RMSprop trajectory with the harness' settings
    (base_experiment.py:48-56: alpha 0.99, momentum 0.9, eps=1e-2/B^2)."""
    g = torch.Generator().manual_seed(58)
    x0 = torch.randn(8, generator=g)
    target = torch.randn(8, generator=g)
    x = torch.nn.Parameter(x0.clone())
    opt = torch.optim.RMSprop([x], lr=0.01, alpha=0.99, momentum=0.9,
                              eps=1e-2 / 128 ** 2)
    traj = []
    for _ in range(15):
        if x.grad is not None:
            x.grad.zero_()
        torch.sum((x - target) ** 2).backward()
        opt.step()
        traj.append(x.detach().clone().numpy())
    save("rmsprop", x0=x0.numpy(), target=target.numpy(),
         traj=np.stack(traj))


def _patch_geometric_transform_for_autograd():
    """The reference's geometric_transform mutates a torch.split view
    in-place (theta *= 2*pi, cv_ops.py:45) — legal under its pinned torch
    1.4, but a RuntimeError under modern autograd when gradients flow.
    Install a math-identical out-of-place version so the reference can be
    *trained* here to produce trajectory fixtures."""
    import math as _math

    import torch_scae.cv_ops as cv_ops
    import torch_scae.part_encoder as pe
    import torch_scae.object_decoder as od

    def geometric_transform(pose_tensor, similarity=False, nonlinear=True,
                            as_matrix=False):
        (scale_x, scale_y, theta, shear,
         trans_x, trans_y) = torch.split(pose_tensor, 1, dim=-1)
        if nonlinear:
            scale_x, scale_y = (torch.sigmoid(t) + 1e-2
                                for t in (scale_x, scale_y))
            trans_x, trans_y, shear = (torch.tanh(t * 5.)
                                       for t in (trans_x, trans_y, shear))
            theta = theta * (2. * _math.pi)   # out-of-place (the only change)
        else:
            scale_x, scale_y = (abs(t) + 1e-2
                                for t in (scale_x, scale_y))
        c, s = torch.cos(theta), torch.sin(theta)
        if similarity:
            scale = scale_x
            pose = [scale * c, -scale * s, trans_x,
                    scale * s, scale * c, trans_y]
        else:
            pose = [scale_x * c + shear * scale_y * s,
                    -scale_x * s + shear * scale_y * c,
                    trans_x,
                    scale_y * s,
                    scale_y * c,
                    trans_y]
        pose = torch.cat(pose, -1)
        if as_matrix:
            shape = list(pose.shape[:-1]) + [2, 3]
            pose = pose.view(*shape)
            zeros = torch.zeros_like(pose[..., :1, 0])
            last = torch.stack([zeros, zeros, zeros + 1], -1)
            pose = torch.cat([pose, last], -2)
        return pose

    cv_ops.geometric_transform = geometric_transform
    pe.cv_ops.geometric_transform = geometric_transform
    od.cv_ops.geometric_transform = geometric_transform


def gen_train_trajectory():
    """N optimization steps of the reference under the harness' RMSprop
    settings (base_experiment.py:47-56), noise off — the optimization-
    trajectory parity fixture. Records per-step losses, the input batches,
    the init state dict and the final state dict."""
    from torch_scae.factory import make_scae
    _patch_geometric_transform_for_autograd()
    torch.manual_seed(59)
    np.random.seed(59)
    B, n_steps = 8, 6
    model_params = dict(
        image_shape=(1, 28, 28), n_classes=10,
        n_part_caps=8, n_obj_caps=6,
        pcae_cnn_encoder_params=dict(out_channels=[32] * 4),
        pcae_encoder_params=dict(noise_scale=0.0),
        ocae_decoder_capsule_params=dict(noise_type=None, noise_scale=0.0),
        scae_params=dict(reconstruct_alternatives=False),
    )
    scae = make_scae(model_params)
    scae.train()
    # deep-copy: .numpy() views alias the live params, which the optimizer
    # then mutates in place — the snapshot must be detached storage
    init_sd = {k: v.copy() for k, v in flat_sd(scae).items()}

    g = torch.Generator().manual_seed(60)
    imgs = torch.rand(n_steps, B, 1, 28, 28, generator=g)
    labels = torch.randint(0, 10, (n_steps, B), generator=g)

    opt = torch.optim.RMSprop(scae.parameters(), lr=1e-4, alpha=0.99,
                              momentum=0.9, eps=1e-2 / B ** 2)
    losses, rec_lls, caps_lls = [], [], []
    for t in range(n_steps):
        opt.zero_grad()
        res = scae(imgs[t])
        loss, log = scae.loss(res, imgs[t], labels[t])
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
        rec_lls.append(float(log["rec_ll_loss"].detach()))
        caps_lls.append(float(log["log_prob_loss"].detach()))
    save("train_trajectory",
         imgs=imgs.numpy(), labels=labels.numpy(),
         losses=np.asarray(losses), rec_ll_losses=np.asarray(rec_lls),
         log_prob_losses=np.asarray(caps_lls),
         **{f"init_sd/{k}": v for k, v in init_sd.items()},
         **{f"final_sd/{k}": v for k, v in flat_sd(scae).items()})


if __name__ == "__main__":
    gen_geometric_transform()
    gen_grid_sample()
    gen_gmm()
    gen_attention()
    gen_pooling()
    gen_set_transformer()
    gen_part_encoder()
    gen_part_decoder()
    gen_object_decoder()
    gen_scae()
    gen_part_decoder_color()
    gen_scae_color()
    gen_radam()
    gen_rmsprop()
    gen_train_trajectory()
    print("done")
