"""YAML + CLI configuration, schema-compatible with the reference.

The reference drives each entry script with a nested YAML
(config/VOC_config_baseline.yaml: Network / EMA / Optim / Lr_Scheduler /
Dataset / Training_Setting / Seed / Loss / Ramp_Scheduler / Distributed)
plus argparse flags that shadow some keys (SURVEY.md component #20).  This
module accepts those YAML files as-is (including ``!!python/tuple`` tags,
loaded as plain tuples without arbitrary-code constructors), applies CLI
overrides with the same precedence the reference scripts use, and snapshots
the resolved config into the checkpoint directory
(ori_pseudo.py:230-236).

``Config`` is a thin typed view over the nested dict with dotted access and
defaults, so downstream code never re-implements key plumbing.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import yaml

__all__ = ["Config", "load_config", "dump_config"]


def _tuple_constructor(loader, node):
    return tuple(loader.construct_sequence(node))


class _RefLoader(yaml.SafeLoader):
    pass


# accept the reference configs' `!!python/tuple` without unsafe loading
_RefLoader.add_constructor("tag:yaml.org,2002:python/tuple", _tuple_constructor)


class Config:
    """Dotted-path access over a nested dict: cfg.get('Dataset.crop_size')."""

    def __init__(self, data: Dict[str, Any]):
        self.data = data

    def get(self, path: str, default: Any = None) -> Any:
        node: Any = self.data
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def require(self, path: str) -> Any:
        sentinel = object()
        val = self.get(path, sentinel)
        if val is sentinel:
            raise KeyError(f"missing config key: {path}")
        return val

    def set(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node = self.data
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def __getitem__(self, key: str) -> Any:
        return self.data[key]

    def __contains__(self, key: str) -> bool:
        return key in self.data


def load_config(path: str, overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Load a reference-schema YAML; ``overrides`` maps dotted keys to values
    (CLI flags taking precedence, like the reference's per-script argparse)."""
    with open(path, "r") as f:
        data = yaml.load(f.read(), Loader=_RefLoader)
    cfg = Config(data)
    for key, value in (overrides or {}).items():
        if value is not None:
            cfg.set(key, value)
    return cfg


def dump_config(cfg: Config, save_dir: str, name: str = "config.yaml") -> str:
    """Snapshot the resolved config (reference ori_pseudo.py:235-236)."""
    os.makedirs(save_dir, exist_ok=True)
    out = os.path.join(save_dir, name)
    data = _tuples_to_lists(cfg.data)
    with open(out, "w") as f:
        yaml.safe_dump(data, f, default_flow_style=False)
    return out


def _tuples_to_lists(x):
    if isinstance(x, dict):
        return {k: _tuples_to_lists(v) for k, v in x.items()}
    if isinstance(x, tuple):
        return list(x)
    return x
