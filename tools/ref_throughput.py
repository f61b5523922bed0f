"""Measure the torch reference's training throughput (images/sec, CPU).

Fills the BASELINE.md TODO ("reference images/sec on CPU/GPU for the
default MNIST config"): the reference publishes no throughput numbers
and this container has no CUDA, so CPU is the only reference-hardware
number available. Replicates the reference training step exactly:
flagship MNIST config (configs/model/mnist.yaml), B=128, forward +
8-term loss + backward + RMSprop update
(torch_scae_experiments/base_experiment.py:44-77,109-126).

Usage: python tools/ref_throughput.py [steps]
"""

import sys
import time

sys.path.insert(0, "/root/repo/tools/refshim")
sys.path.insert(0, "/root/reference")

import torch  # noqa: E402
import yaml  # noqa: E402

from torch_scae import cv_ops, factory  # noqa: E402

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
BATCH = 128

# torch>=2 compat: the reference's geometric_transform does
# `theta *= 2*pi` on a torch.split view (cv_ops.py:45), which modern
# torch forbids. Behavior-identical out-of-place patch so the reference
# runs at all on this container's torch (same staleness class as its 24
# failing shape-assert tests, BASELINE.md).
_orig_gt = cv_ops.geometric_transform


def _gt_compat(pose_tensor, similarity=False, nonlinear=True,
               as_matrix=False):
    import math as _math

    sx, sy, theta, shear, tx, ty = torch.split(pose_tensor, 1, dim=-1)
    if nonlinear:
        sx = torch.sigmoid(sx) + 1e-2
        sy = torch.sigmoid(sy) + 1e-2
        tx, ty, shear = (torch.tanh(t * 5.) for t in (tx, ty, shear))
        theta = theta * (2. * _math.pi)
    else:
        sx, sy = (abs(t) + 1e-2 for t in (sx, sy))
    c, s = torch.cos(theta), torch.sin(theta)
    if similarity:
        pose = [sx * c, -sx * s, tx, sx * s, sx * c, ty]
    else:
        pose = [sx * c + shear * sy * s, -sx * s + shear * sy * c, tx,
                sy * s, sy * c, ty]
    pose = torch.cat(pose, -1)
    if as_matrix:
        shape = list(pose.shape[:-1]) + [2, 3]
        pose = pose.view(*shape)
        zeros = torch.zeros_like(pose[..., :1, 0])
        last = torch.stack([zeros, zeros, zeros + 1], -1)
        pose = torch.cat([pose, last], -2)
    return pose


cv_ops.geometric_transform = _gt_compat
import torch_scae.part_encoder as _pe  # noqa: E402
import torch_scae.object_decoder as _od  # noqa: E402

for _mod in (_pe, _od):
    if hasattr(_mod, "cv_ops"):
        _mod.cv_ops.geometric_transform = _gt_compat


def main():
    with open("/root/reference/torch_scae_experiments/configs/model/"
              "mnist.yaml") as f:
        cfg = yaml.safe_load(f)["model"]
    model = factory.make_scae(cfg)  # make_scae prepares params itself
    model.train()
    # reference optimizer: RMSprop lr 3e-5, momentum .9, eps 1e-2/B^2
    # (configs/optimizer/rmsprop.yaml + base_experiment.py:47)
    opt = torch.optim.RMSprop(model.parameters(), lr=3e-5, momentum=0.9,
                              eps=(1e-2 / BATCH) ** 2)

    g = torch.Generator().manual_seed(0)
    image = torch.rand((BATCH, 1, 40, 40), generator=g)
    label = torch.randint(0, 10, (BATCH,), generator=g)

    def step():
        res = model(image=image)
        loss, _ = model.loss(res, reconstruction_target=image, label=label)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    times = []
    for _ in range(STEPS):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    best = min(times)
    med = sorted(times)[len(times) // 2]
    print(f"torch-scae reference, CPU ({torch.get_num_threads()} threads),"
          f" B={BATCH}: best {BATCH / best:.1f} img/s"
          f" ({best * 1e3:.0f} ms/step), median {BATCH / med:.1f} img/s")


if __name__ == "__main__":
    main()
