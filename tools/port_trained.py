"""End-to-end trained-checkpoint migration check (VERDICT r3 ask #5).

`utils/torch_port.py` promises that a user of the PyTorch reference can
bring their TRAINED checkpoints along; the per-module goldens only ever
exercised random inits. This tool closes the loop on a real artifact:

  1. load a trained reference ``state_dict`` (produced by
     ``tools/ab_ref_train.py`` — the unmodified torch reference at the
     flagship mnist.yaml config, trained on the real-digits split),
  2. evaluate the TORCH model on the fixed center-padded val batch
     (the same eval ab_ref_train logs: model.eval(), noise off),
  3. ``torch_port.port_scae`` the state_dict into a flax params tree,
  4. evaluate the scae_tpu model (compat flags on, deterministic) on
     the IDENTICAL numpy batch,
  5. assert agreement of every shared loss/log term + accuracy within
     golden tolerance (rtol 2e-3, the full-model loss golden's bound).

Run on CPU so torch and jax see identical f32 arithmetic and the TPU
stays free:

    env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
        python tools/port_trained.py [--ckpt logs/r4_ref_trained/last.pt]

Reference workflow being replaced: the Lightning resume/eval cells in
/root/reference/torch_scae_experiments/mnist/train.ipynb.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo/tools/refshim")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import torch  # noqa: E402
import yaml  # noqa: E402

from ref_compat import patch_reference  # noqa: E402

patch_reference()


def eval_torch(model, images, labels, batch=128):
    """Mean loss-log over the batch, torch eval mode (noise off)."""
    import torch

    model.eval()
    sums, nb = {}, 0
    with torch.no_grad():
        for lo in range(0, len(images), batch):
            img = images[lo:lo + batch]
            lbl = labels[lo:lo + batch]
            res = model(image=img)
            _, log = model.loss(res, reconstruction_target=img, label=lbl)
            acc = model.calculate_accuracy(res, lbl)
            for k, v in log.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            sums["accuracy"] = sums.get("accuracy", 0.0) + float(acc)
            nb += 1
    return {k: v / nb for k, v in sums.items()}


def eval_flax(model, params, images, labels, batch=128):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def ev(params, img, lbl):
        res = model.apply({"params": params}, img, deterministic=True)
        _, log = model.loss(res, img, lbl)
        acc = model.calculate_accuracy(res, lbl)
        return log, acc

    sums, nb = {}, 0
    for lo in range(0, len(images), batch):
        log, acc = ev(params, jnp.asarray(images[lo:lo + batch]),
                      jnp.asarray(labels[lo:lo + batch]))
        for k, v in log.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        sums["accuracy"] = sums.get("accuracy", 0.0) + float(acc)
        nb += 1
    return {k: v / nb for k, v in sums.items()}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="logs/r4_ref_trained/last.pt")
    ap.add_argument("--rtol", type=float, default=2e-3)
    ap.add_argument("--source", default="digits",
                    choices=["synthetic", "digits"])
    args = ap.parse_args()

    from ab_ref_train import load_split, pad_translate  # noqa: E402

    with open("/root/reference/torch_scae_experiments/configs/model/"
              "mnist.yaml") as f:
        cfg = yaml.safe_load(f)["model"]
    # the reference applies capsule presence-logit noise UNCONDITIONALLY
    # (object_decoder.py:198-212 — no self.training gate), so its "eval"
    # is stochastic. Noise has no trained parameters; both sides eval
    # with it off, which is what a migrating user gets from scae_tpu's
    # deterministic=True eval.
    cfg["ocae_decoder_capsule_params"] = {
        **cfg["ocae_decoder_capsule_params"],
        "noise_type": None, "noise_scale": 0.0,
    }

    from torch_scae import factory as ref_factory  # noqa: E402

    ref_model = ref_factory.make_scae(cfg)
    sd = torch.load(args.ckpt, map_location="cpu", weights_only=True)
    ref_model.load_state_dict(sd)

    # the exact eval batch ab_ref_train validates on: center-padded,
    # first <=1024 val images rounded down to whole batches
    rng = np.random.default_rng(0)
    _, (va_im, va_lb) = load_split(source=args.source)
    n_va = max((min(len(va_im), 1024) // 128) * 128, 128)
    images = pad_translate(va_im[:n_va], rng, train=False)
    labels = torch.from_numpy(va_lb[:n_va])

    want = eval_torch(ref_model, images, labels)
    print("[port_trained] torch reference eval:",
          json.dumps({k: round(v, 4) for k, v in sorted(want.items())}))

    from scae_tpu import factory as tpu_factory  # noqa: E402
    from scae_tpu.utils import torch_port  # noqa: E402

    tpu_cfg = {**cfg, "scae_params": {
        **cfg["scae_params"],
        # replicate the reference's posterior-classifier defects so the
        # numbers are comparable (factory.py compat flags, COMPONENTS.md
        # §2.4) — a user migrating a trained model wants ITS behavior
        "compat_posterior_cls_bug": True,
        "compat_posterior_gate_bug": True,
        # the reference trains its heads with CE-on-softmax
        # (stacked_capsule_auto_encoder.py:67-74,281-282); since commit
        # 44949f8 scae_tpu defaults to CE-on-logits, so the ported model
        # must opt back in to match the trained reference's loss values
        "compat_double_softmax_xe": True,
    }}
    model = tpu_factory.make_scae(tpu_cfg)
    params = torch_port.port_scae(
        {k: v.numpy() for k, v in sd.items()}, n_obj_caps=cfg["n_obj_caps"])

    got = eval_flax(model, params, images.numpy(), labels.numpy())
    print("[port_trained] scae_tpu ported eval: ",
          json.dumps({k: round(v, 4) for k, v in sorted(got.items())}))

    shared = sorted(set(want) & set(got))
    assert shared, "no shared metric keys"
    failures = []
    for k in shared:
        w, g = want[k], got[k]
        tol = args.rtol * max(abs(w), 1.0)
        ok = abs(g - w) <= tol
        print(f"[port_trained] {k:40s} torch={w:12.4f} "
              f"jax={g:12.4f} {'OK' if ok else 'MISMATCH'}")
        if not ok:
            failures.append(k)
    if failures:
        raise SystemExit(f"ported eval mismatch: {failures}")
    print(f"[port_trained] PASS: {len(shared)} metrics agree "
          f"(rtol={args.rtol}) on {n_va} val images "
          f"({os.path.basename(args.ckpt)})")


if __name__ == "__main__":
    main()
