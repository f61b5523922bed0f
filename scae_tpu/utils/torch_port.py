"""Import trained torch-scae weights into scae_tpu parameter pytrees.

Lets a user of the PyTorch reference (bdsaglam/torch-scae) bring their
trained checkpoints along: feed a ``state_dict`` (as a mapping from the
torch parameter names to numpy arrays — no torch dependency here) and get
the matching flax params subtree.

Layout conversions:
  * Linear ``weight`` (out, in)            -> ``kernel`` (in, out)
  * Conv2d ``weight`` (out, in, kh, kw)    -> ``kernel`` (kh, kw, in, out)
  * LayerNorm ``weight``/``bias``          -> ``scale``/``bias``
  * nn.Sequential MLP indices (0, 2, ...)  -> ``linear_{j}``
  * Conv2dStack indices (0, 2, ...)        -> ``conv_{j}``
  * the reference's per-capsule nn.ModuleList MLP banks
    (object_decoder.py:86-107) -> stacked (O, in, out) kernels of
    :class:`scae_tpu.models.layers.StackedMLP`.

Reference module naming mirrors torch_scae/factory.py:152-178.
"""

import re

import numpy as np


def _t_linear(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _t_conv(w):
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _mlp(sd, prefix):
    """Sequential MLP '{prefix}.{2j}.weight/bias' -> linear_{j} subtree."""
    out = {}
    j = 0
    while f"{prefix}.{2 * j}.weight" in sd:
        layer = {"kernel": _t_linear(sd[f"{prefix}.{2 * j}.weight"])}
        if f"{prefix}.{2 * j}.bias" in sd:
            layer["bias"] = np.asarray(sd[f"{prefix}.{2 * j}.bias"])
        out[f"linear_{j}"] = layer
        j += 1
    assert j > 0, f"no MLP layers under {prefix}"
    return out


def _conv_stack(sd, prefix):
    out = {}
    j = 0
    while f"{prefix}.{2 * j}.weight" in sd:
        out[f"conv_{j}"] = {
            "kernel": _t_conv(sd[f"{prefix}.{2 * j}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.{2 * j}.bias"]),
        }
        j += 1
    assert j > 0, f"no conv layers under {prefix}"
    return out


def _stacked_mlp(sd, prefix, n_stack, use_bias=True):
    """nn.ModuleList of per-capsule MLPs -> StackedMLP (O, in, out) kernels."""
    out = {}
    j = 0
    while f"{prefix}.0.{2 * j}.weight" in sd:
        kernels = [
            _t_linear(sd[f"{prefix}.{i}.{2 * j}.weight"])
            for i in range(n_stack)
        ]
        out[f"kernel_{j}"] = np.stack(kernels, axis=0)
        if use_bias:
            out[f"bias_{j}"] = np.stack(
                [np.asarray(sd[f"{prefix}.{i}.{2 * j}.bias"])
                 for i in range(n_stack)], axis=0)
        j += 1
    assert j > 0, f"no stacked MLP layers under {prefix}"
    return out


def _lin(sd, prefix):
    return {"kernel": _t_linear(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _cat_lins(*lins):
    """Concatenate separate linear layers into one fused projection
    (output-column concat — the layout MultiHeadQKVAttention splits)."""
    return {
        "kernel": np.concatenate([l["kernel"] for l in lins], axis=1),
        "bias": np.concatenate([l["bias"] for l in lins], axis=0),
    }


def _mqkv(sd, prefix, mode="kv"):
    """Port the reference's 4 separate projections into the fused
    layout: mode='qkv' (self-attention: q==k==v inputs, one projector)
    or 'kv' (cross-attention: separate q, fused k/v). Mirrors the
    trace-driven fusion in models/set_transformer.py."""
    q = _lin(sd, f"{prefix}.q_projector")
    k = _lin(sd, f"{prefix}.k_projector")
    v = _lin(sd, f"{prefix}.v_projector")
    out = {"o_projector": _lin(sd, f"{prefix}.o_projector")}
    if mode == "qkv":
        out["qkv_projector"] = _cat_lins(q, k, v)
    else:
        out["q_projector"] = q
        out["kv_projector"] = _cat_lins(k, v)
    return out


def _mab(sd, prefix, mode="kv"):
    out = {"mqkv": _mqkv(sd, f"{prefix}.mqkv", mode),
           "fc": {"kernel": _t_linear(sd[f"{prefix}.fc.weight"]),
                  "bias": np.asarray(sd[f"{prefix}.fc.bias"])}}
    for ln in ("ln0", "ln1"):
        if f"{prefix}.{ln}.weight" in sd:
            out[ln] = {"scale": np.asarray(sd[f"{prefix}.{ln}.weight"]),
                       "bias": np.asarray(sd[f"{prefix}.{ln}.bias"])}
    return out


def port_cnn_encoder(sd, prefix="network"):
    return {"network": _conv_stack(sd, prefix)}


def port_capsule_image_encoder(sd, prefix=""):
    p = f"{prefix}." if prefix else ""
    return {
        "encoder": {"network": _conv_stack(sd, f"{p}encoder.network")},
        "att_conv": {"kernel": _t_conv(sd[f"{p}att_conv.weight"]),
                     "bias": np.asarray(sd[f"{p}att_conv.bias"])},
        "img_embedding_bias": np.asarray(sd[f"{p}img_embedding_bias"]),
    }


def port_template_generator(sd, prefix=""):
    p = f"{prefix}." if prefix else ""
    out = {"template_logits": np.asarray(sd[f"{p}template_logits"])}
    if any(k.startswith(f"{p}templates_color_mlp") for k in sd):
        out["templates_color_mlp"] = _mlp(sd, f"{p}templates_color_mlp")
    return out


def port_template_decoder(sd, prefix=""):
    p = f"{prefix}." if prefix else ""
    out = {"bg_mixing_logit": np.asarray(sd[f"{p}bg_mixing_logit"])}
    for name in ("templates_alpha", "temperature_logit", "scale", "bg_value"):
        if f"{p}{name}" in sd:
            out[name] = np.asarray(sd[f"{p}{name}"])
    return out


def port_set_transformer(sd, prefix=""):
    p = f"{prefix}." if prefix else ""
    out = {
        "fc1": {"kernel": _t_linear(sd[f"{p}fc1.weight"]),
                "bias": np.asarray(sd[f"{p}fc1.bias"])},
        "fc2": {"kernel": _t_linear(sd[f"{p}fc2.weight"]),
                "bias": np.asarray(sd[f"{p}fc2.bias"])},
        "seeds": np.asarray(sd[f"{p}seeds"]),
        "multi_head_attention": _mqkv(sd, f"{p}multi_head_attention"),
    }
    n_layers = len({m.group(1) for k in sd
                    if (m := re.match(rf"{re.escape(p)}sabs\.(\d+)\.", k))})
    for i in range(n_layers):
        layer = {"mab": _mab(sd, f"{p}sabs.{i}.mab", mode="qkv")} \
            if f"{p}sabs.{i}.mab.fc.weight" in sd else None
        if layer is None:  # ISAB (inducing-point queries: cross-attention)
            layer = {"mab0": _mab(sd, f"{p}sabs.{i}.mab0"),
                     "mab1": _mab(sd, f"{p}sabs.{i}.mab1"),
                     "I": np.asarray(sd[f"{p}sabs.{i}.I"])}
        out[f"sab_{i}"] = layer
    return out


def port_capsule_layer(sd, n_caps, prefix=""):
    p = f"{prefix}." if prefix else ""
    out = {
        "mlps": _stacked_mlp(sd, f"{p}mlps", n_caps, use_bias=True),
        "caps_mlps": _stacked_mlp(sd, f"{p}caps_mlps", n_caps,
                                  use_bias=False),
        "cpr_static": np.asarray(sd[f"{p}cpr_static"]),
    }
    for i in range(4):
        out[f"caps_bias_{i}"] = np.asarray(sd[f"{p}caps_bias_list.{i}"])
    return out


def port_capsule_object_decoder(sd, n_caps, prefix=""):
    p = f"{prefix}." if prefix else ""
    return {
        "capsule_layer": port_capsule_layer(sd, n_caps,
                                            prefix=f"{p}capsule_layer"),
        "dummy_vote": np.asarray(sd[f"{p}dummy_vote"]),
    }


def port_scae(sd, n_obj_caps):
    """Full reference SCAE state_dict -> scae_tpu params dict."""
    out = {
        "part_encoder": port_capsule_image_encoder(sd, "part_encoder"),
        "template_generator": port_template_generator(
            sd, "template_generator"),
        "part_decoder": port_template_decoder(sd, "part_decoder"),
        "obj_encoder": port_set_transformer(sd, "obj_encoder"),
        "obj_decoder": port_capsule_object_decoder(sd, n_obj_caps,
                                                   "obj_decoder"),
    }
    # classifiers are Sequential(Linear, Softmax) -> index 0
    for name in ("prior_classifier", "posterior_classifier"):
        if f"{name}.0.weight" in sd:
            out[name] = {"kernel": _t_linear(sd[f"{name}.0.weight"]),
                         "bias": np.asarray(sd[f"{name}.0.bias"])}
    return out
