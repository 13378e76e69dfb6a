"""YAML config loading with deep merge + dotted-key overrides.

Rebuild of the reference's per-trainer YAML + argparse pattern
(models/arcface/train_arcface.py:341-345, 1027-1044; train_facenet.py:35-38,
450-456) as one shared utility: ``load_config(path, overrides)`` where
overrides are ``section.key=value`` strings (CLI) or nested dicts.
"""

from __future__ import annotations

import copy
from typing import Any, Mapping, Optional, Sequence

import yaml


def deep_merge(base: dict, override: Mapping) -> dict:
    """Recursive dict merge; override wins, sub-dicts merge."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, Mapping) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _parse_value(text: str) -> Any:
    """Parse a CLI override value with YAML scalar rules."""
    return yaml.safe_load(text)


def apply_dotted_overrides(config: dict, overrides: Sequence[str]) -> dict:
    """Apply ``a.b.c=value`` override strings."""
    out = copy.deepcopy(config)
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override {item!r} must be key=value")
        key, _, raw = item.partition("=")
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"cannot override through non-dict at {p!r}")
        node[parts[-1]] = _parse_value(raw)
    return out


def load_config(
    path: Optional[str] = None,
    overrides: Optional[Sequence[str]] = None,
    defaults: Optional[dict] = None,
) -> dict:
    """Load YAML config, merge onto defaults, apply dotted overrides."""
    config = copy.deepcopy(defaults) if defaults else {}
    if path:
        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        config = deep_merge(config, loaded)
    if overrides:
        config = apply_dotted_overrides(config, overrides)
    return config


def save_config(path: str, config: dict) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)
