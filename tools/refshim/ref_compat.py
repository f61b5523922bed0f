"""torch>=2 compatibility patch for the reference's cv_ops.

The reference's geometric_transform does `theta *= 2*pi` on a
torch.split view (cv_ops.py:45), which modern torch forbids
(RuntimeError: inplace on a view). Behavior-identical out-of-place
rewrite, monkeypatched into every reference module that imported it.
Shared by tools/ref_throughput.py and tools/ab_ref_train.py.
"""

import math

import torch


def _gt_compat(pose_tensor, similarity=False, nonlinear=True,
               as_matrix=False):
    sx, sy, theta, shear, tx, ty = torch.split(pose_tensor, 1, dim=-1)
    if nonlinear:
        sx = torch.sigmoid(sx) + 1e-2
        sy = torch.sigmoid(sy) + 1e-2
        tx, ty, shear = (torch.tanh(t * 5.) for t in (tx, ty, shear))
        theta = theta * (2. * math.pi)
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


def patch_reference():
    from torch_scae import cv_ops
    cv_ops.geometric_transform = _gt_compat
    import torch_scae.part_encoder as _pe
    import torch_scae.object_decoder as _od
    for _mod in (_pe, _od):
        if hasattr(_mod, "cv_ops"):
            _mod.cv_ops.geometric_transform = _gt_compat
    return _gt_compat
