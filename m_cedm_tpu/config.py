"""Hydra-compatible configuration system (self-contained, no hydra dependency).

The reference drives everything through Hydra 1.1 (`run.py:30`,
`configs/config_*.yaml`): top-level configs compose five groups
(model / datamodule / trainer / callbacks / diff_sampler) via a `defaults:`
list, CLI dot-overrides mutate any node, and `_target_:` keys name the class
to build. This module reimplements exactly that surface on plain PyYAML so
existing reference-style configs and command lines keep working:

    python run.py --config-name=config_adm_edm_mcedm_res32.yaml \
        trainer.max_epochs=1 datamodule.batch_size=16 system=swe_per

Supported:
  - `defaults:` composition (group: name entries; `override hydra/...` and
    `_self_` entries are accepted and ignored)
  - dot-path CLI overrides with YAML-typed values (and `key=null`)
  - `+key=value` to add new keys
  - `${interp}` resolution against top-level keys and `${now:...}` timestamps
  - `_target_`-based instantiation through an explicit registry
"""
from __future__ import annotations

import datetime
import os
import re
from typing import Any, Callable, Dict, List, Optional

import yaml


class DotDict(dict):
    """dict with attribute access, applied recursively on load."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__

    def get(self, key, default=None):
        return dict.get(self, key, default)


def to_dotdict(obj: Any) -> Any:
    if isinstance(obj, dict):
        return DotDict({k: to_dotdict(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [to_dotdict(v) for v in obj]
    return obj


def to_plain(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: to_plain(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [to_plain(v) for v in obj]
    return obj


def _load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _deep_merge(base: dict, extra: dict) -> dict:
    out = dict(base)
    for k, v in extra.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


_INTERP_RE = re.compile(r"\$\{([^}]+)\}")


def _resolve_interp(value: Any, root: dict) -> Any:
    if isinstance(value, str):
        def repl(m):
            expr = m.group(1)
            if expr.startswith("now:"):
                return datetime.datetime.now().strftime(expr[4:])
            node: Any = root
            for part in expr.split("."):
                if isinstance(node, dict) and part in node:
                    node = node[part]
                else:
                    return m.group(0)  # leave unresolved (e.g. hydra.job.num)
            return str(node)

        full = _INTERP_RE.fullmatch(value)
        if full and not full.group(1).startswith("now:"):
            # whole-string interpolation keeps the referenced value's type
            expr = full.group(1)
            node: Any = root
            for part in expr.split("."):
                if isinstance(node, dict) and part in node:
                    node = node[part]
                else:
                    return value
            return node
        return _INTERP_RE.sub(repl, value)
    if isinstance(value, dict):
        return {k: _resolve_interp(v, root) for k, v in value.items()}
    if isinstance(value, list):
        return [_resolve_interp(v, root) for v in value]
    return value


def _parse_override_value(raw: str) -> Any:
    if raw == "null":
        return None
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def apply_override(cfg: dict, dotted_key: str, raw_value: str) -> None:
    additive = dotted_key.startswith("+")
    key = dotted_key[1:] if additive else dotted_key
    parts = key.split(".")
    node = cfg
    for p in parts[:-1]:
        if p not in node or not isinstance(node[p], dict):
            if additive:
                node[p] = DotDict()
            else:
                raise KeyError(f"override path {key!r}: missing group {p!r}")
        node = node[p]
    leaf = parts[-1]
    if not additive and leaf not in node:
        raise KeyError(
            f"override key {key!r} not found (use +{key}=... to add new keys)")
    node[leaf] = _parse_override_value(raw_value)


def compose(config_dir: str, config_name: str,
            overrides: Optional[List[str]] = None,
            return_hydra: bool = False) -> DotDict:
    """Compose a top-level config exactly like `hydra.main` would.

    return_hydra=True additionally returns the config's `hydra:` block
    (run/sweep dirs, sweeper settings — reference
    configs/config_adm_edm_mcedm_res32.yaml:20-33) with its interpolations
    resolved against the composed job config; hydra itself consumes this
    node rather than exposing it in the job config, and so do the drivers
    here (run.py/eval_model.py/sweep.py)."""
    if not config_name.endswith(".yaml"):
        config_name += ".yaml"
    top = _load_yaml(os.path.join(config_dir, config_name))

    merged: dict = {}
    defaults = top.pop("defaults", [])
    group_overrides = {}
    cli = list(overrides or [])

    # group selection overrides (e.g. `diff_sampler=edm_sampler_inv`) are
    # applied during composition, like hydra does
    remaining_cli = []
    for ov in cli:
        if "=" in ov:
            k, v = ov.split("=", 1)
            if ("." not in k and not k.startswith("+")
                    and os.path.isdir(os.path.join(config_dir, k))):
                group_overrides[k] = v
                continue
        remaining_cli.append(ov)

    for entry in defaults:
        if entry == "_self_":
            merged = _deep_merge(merged, top)
            continue
        if not isinstance(entry, dict):
            continue
        (group, name), = entry.items()
        if group.startswith("override"):
            continue  # hydra plugin overrides (sweeper/logging): not applicable
        name = group_overrides.get(group, name)
        if name is None:
            continue
        if not str(name).endswith(".yaml"):
            name = f"{name}.yaml"
        group_cfg = _load_yaml(os.path.join(config_dir, group, str(name)))
        merged = _deep_merge(merged, {group: group_cfg})
    if "_self_" not in defaults:
        merged = _deep_merge(merged, top)

    hydra_block = merged.pop("hydra", None) or {}
    cfg = to_dotdict(merged)
    for ov in remaining_cli:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must look like key=value")
        k, v = ov.split("=", 1)
        apply_override(cfg, k, v)

    plain = to_plain(cfg)
    cfg = to_dotdict(_resolve_interp(plain, plain))
    if return_hydra:
        # hydra-internal refs (${hydra.job.num}) stay unresolved; the sweep
        # driver substitutes the trial number itself
        return cfg, to_dotdict(_resolve_interp(to_plain(hydra_block), plain))
    return cfg


# --------------------------------------------------------------------------
# _target_ instantiation
# --------------------------------------------------------------------------

_REGISTRY: Dict[str, Callable] = {}


def register(*targets: str):
    """Register a builder under one or more `_target_` names. The reference's
    torch class paths (e.g. `models.mcedm.PlMcedm`) are registered as aliases
    so unmodified reference configs also resolve."""

    def deco(fn):
        for t in targets:
            _REGISTRY[t] = fn
        return fn

    return deco


def instantiate(cfg: dict, **kwargs):
    cfg = dict(cfg)
    target = cfg.pop("_target_", None)
    if target is None:
        raise ValueError("config node has no _target_")
    if target not in _REGISTRY:
        # fall back to importing a dotted path from this package
        module_path, _, attr = target.rpartition(".")
        try:
            import importlib

            mod = importlib.import_module(module_path)
            fn = getattr(mod, attr)
        except (ImportError, AttributeError) as e:
            raise KeyError(
                f"_target_ {target!r} is not registered and not importable"
            ) from e
    else:
        fn = _REGISTRY[target]
    params = {**cfg, **kwargs}
    return fn(**params)


def resolve_target(target: str) -> Callable:
    return _REGISTRY[target]
