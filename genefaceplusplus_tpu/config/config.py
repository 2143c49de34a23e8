"""Hierarchical YAML config system.

Re-implements the behavioural contract of the reference config layer
(`utils/commons/hparams.py:53-191` in /root/reference):

  * YAML files may declare ``base_config: [path, ...]`` (str or list); bases are
    loaded recursively (depth-first), later files override earlier ones, and a
    cycle guard raises on self-inclusion.
  * Dotted string overrides ``"a=1,b.c=2"`` with type coercion
    (int/float/bool/None/list literals via yaml parsing).
  * A checkpoint/work dir carries its own ``config.yaml``; loading from a work
    dir restores the exact config it was trained with (the "ckpt dir carries
    its config" API contract, `hparams.py:110-127`).

Unlike the reference there is NO mutable global dict: `Config` is an immutable
mapping that models receive explicitly.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Iterator, Mapping, Optional

import yaml


def _deep_update(dst: Dict[str, Any], src: Mapping[str, Any]) -> Dict[str, Any]:
    for k, v in src.items():
        if isinstance(v, Mapping) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v if not isinstance(v, Mapping) else dict(v)
    return dst


def load_config(config_fname: str, _visited: Optional[set] = None) -> Dict[str, Any]:
    """Load a YAML config, recursively resolving ``base_config`` inheritance."""
    config_fname = os.path.abspath(config_fname)
    _visited = set() if _visited is None else _visited
    if config_fname in _visited:
        raise ValueError(f"base_config cycle detected at {config_fname}")
    _visited.add(config_fname)

    with open(config_fname, "r") as f:
        own: Dict[str, Any] = yaml.safe_load(f) or {}

    merged: Dict[str, Any] = {}
    bases = own.pop("base_config", [])
    if isinstance(bases, str):
        bases = [bases]
    for base in bases:
        if base.startswith("."):
            base = os.path.join(os.path.dirname(config_fname), base)
        elif not os.path.isabs(base):
            # relative to repo root (cwd) first, then to this file's dir
            if not os.path.exists(base):
                cand = os.path.join(os.path.dirname(config_fname), base)
                base = cand if os.path.exists(cand) else base
        _deep_update(merged, load_config(base, _visited))
    _deep_update(merged, own)
    return merged


_COERCE_TRUE = {"true", "True"}
_COERCE_FALSE = {"false", "False"}


def _coerce(v: str) -> Any:
    v = v.strip()
    if v in _COERCE_TRUE:
        return True
    if v in _COERCE_FALSE:
        return False
    if v in ("None", "null", ""):
        return None
    try:
        return yaml.safe_load(v)
    except yaml.YAMLError:
        return v


def apply_overrides(cfg: Dict[str, Any], overrides: str) -> Dict[str, Any]:
    """Apply ``"a=1,b.c=2,lst=[1,2]"``-style dotted overrides in place."""
    if not overrides:
        return cfg
    # split on commas that are not inside brackets
    parts = re.split(r",(?![^\[\(]*[\]\)])", overrides)
    for part in parts:
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"malformed override (expected k=v): {part!r}")
        key, val = part.split("=", 1)
        key = key.strip()
        if not key:
            raise ValueError(f"malformed override (empty key): {part!r}")
        node = cfg
        subkeys = key.split(".")
        for sk in subkeys[:-1]:
            node = node.setdefault(sk, {})
        new = _coerce(val)
        old = node.get(subkeys[-1])
        if isinstance(old, str) and not isinstance(new, (str, dict, list, tuple)):
            new = val.strip()  # keep string-typed keys string ("video_id=123")
        # type coercion against the existing value (reference hparams.py:
        # 130-162 casts to the old value's type and fails loudly on junk)
        if old is not None and not isinstance(old, (str, dict, list, tuple)) \
                and isinstance(new, str):
            try:
                new = type(old)(new) if not isinstance(old, bool) \
                    else {"true": True, "false": False}[new.lower()]
            except (ValueError, KeyError) as exc:
                raise ValueError(
                    f"override {part!r}: cannot cast {val!r} to "
                    f"{type(old).__name__} (current value {old!r})"
                ) from exc
        node[subkeys[-1]] = new
    return cfg


class Config(Mapping[str, Any]):
    """Immutable mapping over a resolved config dict with attr access."""

    __slots__ = ("_d",)

    def __init__(self, d: Mapping[str, Any]):
        object.__setattr__(self, "_d", dict(d))

    # Mapping interface
    def __getitem__(self, k: str) -> Any:
        return self._d[k]

    def __iter__(self) -> Iterator[str]:
        return iter(self._d)

    def __len__(self) -> int:
        return len(self._d)

    def get(self, k: str, default: Any = None) -> Any:
        return self._d.get(k, default)

    def __getattr__(self, k: str) -> Any:
        try:
            return self._d[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __repr__(self) -> str:
        return f"Config({self._d!r})"

    def to_dict(self) -> Dict[str, Any]:
        return dict(self._d)

    def replace(self, **kw: Any) -> "Config":
        d = dict(self._d)
        d.update(kw)
        return Config(d)


def save_config(cfg: Mapping[str, Any], work_dir: str) -> str:
    """Persist config.yaml into a work/checkpoint dir (self-describing ckpts)."""
    os.makedirs(work_dir, exist_ok=True)
    path = os.path.join(work_dir, "config.yaml")
    d = cfg.to_dict() if isinstance(cfg, Config) else dict(cfg)
    with open(path, "w") as f:
        yaml.safe_dump(d, f, sort_keys=True)
    return path


def set_hparams(
    config: str = "",
    exp_name: str = "",
    hparams_str: str = "",
    work_dir: Optional[str] = None,
    reset: bool = False,
) -> Config:
    """Resolve the final config, mirroring the reference CLI semantics.

    Priority (low->high): saved work-dir config.yaml (unless ``reset``) <
    passed YAML < dotted ``hparams_str`` overrides.
    """
    cfg: Dict[str, Any] = {}
    saved = os.path.join(work_dir, "config.yaml") if work_dir else None
    if saved and os.path.exists(saved) and not reset:
        _deep_update(cfg, load_config(saved))
    if config:
        if os.path.isdir(config):
            config = os.path.join(config, "config.yaml")
        _deep_update(cfg, load_config(config))
    if exp_name:
        cfg["exp_name"] = exp_name
    apply_overrides(cfg, hparams_str)
    if work_dir:
        cfg.setdefault("work_dir", work_dir)
    return Config(cfg)
