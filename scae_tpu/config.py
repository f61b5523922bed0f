"""Layered config system: YAML config groups + dotted CLI overrides.

Replaces the reference's Hydra 1.0 setup (configs/config.yaml defaults
list with `optimizer` and `model` groups, CLI overrides incl. `+` for new
keys — README.md:39-46) with a dependency-light equivalent:

  * YAML files under scae_tpu/configs/: a root config with a `defaults`
    list naming group entries (model/<name>.yaml, optimizer/<name>.yaml),
    merged in order, root keys last.
  * CLI overrides `a.b.c=value` (create-if-missing, so the reference's
    `+trainer.x=y` spelling is just `trainer.x=y`).
  * The second config layer — factory.prepare_model_params' default-merge
    with assert-guarded derived keys — is unchanged (SURVEY.md §5).
"""

import copy
import json
import os
from typing import Any, Dict, List, Optional

import yaml

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def _deep_merge(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _parse_value(text: str) -> Any:
    try:
        return json.loads(text)
    except (json.JSONDecodeError, ValueError):
        if text.lower() in ("null", "none"):
            return None
        return text


def _set_dotted(cfg: Dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
        assert isinstance(node, dict), f"cannot override into scalar at {k}"
    node[keys[-1]] = value


def load_config(name: str = "config",
                overrides: Optional[List[str]] = None,
                config_dir: Optional[str] = None) -> Dict:
    """Compose <config_dir>/<name>.yaml with its defaults list + overrides.

    `defaults: [{group: entry}, ...]` pulls <config_dir>/<group>/<entry>.yaml
    under the key <group>. Overrides are `dotted.path=value` strings
    (JSON-parsed values), applied last; `group=entry` swaps a group file.
    """
    config_dir = config_dir or CONFIG_DIR
    overrides = list(overrides or [])

    root = _load_yaml(os.path.join(config_dir, f"{name}.yaml"))
    defaults = root.pop("defaults", [])

    # allow `group=entry` overrides to swap default group selections
    group_swaps = {}
    passthrough = []
    for ov in overrides:
        key, _, val = ov.partition("=")
        if "." not in key and os.path.isdir(os.path.join(config_dir, key)):
            group_swaps[key] = val
        else:
            passthrough.append(ov)

    cfg: Dict = {}
    for entry in defaults:
        assert isinstance(entry, dict) and len(entry) == 1, entry
        (group, selection), = entry.items()
        selection = group_swaps.get(group, selection)
        group_cfg = _load_yaml(
            os.path.join(config_dir, group, f"{selection}.yaml"))
        cfg = _deep_merge(cfg, {group: group_cfg})

    cfg = _deep_merge(cfg, root)

    for ov in passthrough:
        key, sep, val = ov.partition("=")
        assert sep, f"override must be key=value: {ov}"
        _set_dotted(cfg, key, _parse_value(val))
    return cfg


def _load_yaml(path: str) -> Dict:
    with open(path) as f:
        out = yaml.safe_load(f)
    return out or {}


def save_config(cfg: Dict, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(copy.deepcopy(cfg), f, sort_keys=False)
