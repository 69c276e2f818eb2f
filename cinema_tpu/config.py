"""Minimal hierarchical config with YAML IO and dotted overrides.

Replaces the reference's Hydra/OmegaConf dependency (not available here)
while keeping the exact YAML schema of the reference configs — the
published HuggingFace config.yaml files load unchanged, which is what makes
``from_pretrained`` checkpoint rebuilding work (reference mae.py:614-642).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Sequence, Union

import yaml


class Config(dict):
    """Dict with attribute access, recursively wrapping nested dicts."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def __deepcopy__(self, memo):
        import copy

        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> Dict[str, Any]:
        return _unwrap(self)


def _wrap(value: Any) -> Any:
    # always rebuild containers: wrapping doubles as a deep copy, so
    # apply_overrides/merge never alias the source config's nested nodes
    if isinstance(value, dict):
        return Config({k: _wrap(v) for k, v in value.items()})
    if isinstance(value, list):
        return [_wrap(v) for v in value]
    return value


def _unwrap(value: Any) -> Any:
    if isinstance(value, dict):
        return {k: _unwrap(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_unwrap(v) for v in value]
    return value


def from_dict(d: Dict[str, Any]) -> Config:
    """Wrap a nested dict into a Config."""
    return _wrap(dict(d))


def load_config(path: Union[str, Path]) -> Config:
    """Load a YAML config file."""
    with open(path) as f:
        data = yaml.safe_load(f)
    return from_dict(data or {})


def save_config(config: Config, path: Union[str, Path]) -> None:
    """Write a config back to YAML (round-trips into checkpoints dirs)."""
    with open(path, "w") as f:
        yaml.safe_dump(config.to_dict(), f, sort_keys=False)


def merge(base: Config, override: Dict[str, Any]) -> Config:
    """Deep-merge override into base (override wins), returning a new Config."""
    out = from_dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge(out[k], v)
        else:
            out[k] = _wrap(v)
    return out


def apply_overrides(config: Config, overrides: Sequence[str]) -> Config:
    """Apply hydra-style dotted 'a.b.c=value' overrides (values YAML-parsed)."""
    out = from_dict(config)
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"Override '{item}' must be key=value.")
        key, raw = item.split("=", 1)
        value = yaml.safe_load(raw)
        node = out
        parts = key.split(".")
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], dict):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = _wrap(value)
    return out
