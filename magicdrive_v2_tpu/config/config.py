"""Config system.

Keeps the reference's three-tier schema (SURVEY.md §5; reference
magicdrivedit/utils/config_utils.py:12-173) without mmengine/hydra:

1. Python experiment config files (module-level variables become config keys).
2. YAML dataset configs with OmegaConf-style ``${...path}`` relative interpolation,
   merged under ``cfg.dataset`` (see yaml_compose.py).
3. CLI dot-overrides ``--cfg-options a.b.c=value``.
"""
from __future__ import annotations

import argparse
import ast
import copy
import os
import runpy
from typing import Any, Dict, List, Optional, Sequence


class Config(dict):
    """A dict with attribute access, recursively wrapping nested dicts."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for src in list(args) + [kwargs]:
            for k, v in dict(src).items():
                self[k] = v

    @staticmethod
    def _wrap(value):
        if isinstance(value, Config):
            return value
        if isinstance(value, dict):
            return Config(value)
        if isinstance(value, (list, tuple)):
            return type(value)(Config._wrap(v) for v in value)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, Config._wrap(value))

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __deepcopy__(self, memo):
        out = Config()
        for k, v in self.items():
            out[copy.deepcopy(k, memo)] = copy.deepcopy(v, memo)
        return out

    def get_path(self, dotted: str, default=None):
        node: Any = self
        for part in dotted.split("."):
            if isinstance(node, dict) and part in node:
                node = node[part]
            elif isinstance(node, (list, tuple)) and part.lstrip("-").isdigit():
                node = node[int(part)]
            else:
                return default
        return node

    def set_path(self, dotted: str, value):
        parts = dotted.split(".")
        node: Any = self
        for part in parts[:-1]:
            if isinstance(node, (list, tuple)) and part.lstrip("-").isdigit():
                node = node[int(part)]
                continue
            if part not in node or not isinstance(node[part], (dict, list)):
                node[part] = Config()
            node = node[part]
        last = parts[-1]
        if isinstance(node, list) and last.lstrip("-").isdigit():
            node[int(last)] = Config._wrap(value)
        else:
            node[last] = Config._wrap(value)

    def merge(self, other: Dict, overwrite: bool = True):
        for k, v in other.items():
            if k in self and isinstance(self[k], Config) and isinstance(v, dict):
                self[k].merge(v, overwrite=overwrite)
            elif overwrite or k not in self:
                self[k] = v
        return self

    @classmethod
    def fromfile(cls, path: str) -> "Config":
        """Load a python/yaml config. Python configs support mmengine-style
        ``_base_`` inheritance (reference configs use it throughout): base
        file(s) load first and the child's values deep-merge over them (nested
        dicts merge key-wise; everything else replaces)."""
        path = os.path.abspath(path)
        if path.endswith((".yaml", ".yml")):
            from .yaml_compose import load_yaml_config
            return cls(load_yaml_config(path))
        ns = runpy.run_path(path)
        cfg = cls()
        bases = ns.get("_base_")
        if bases:
            if isinstance(bases, str):
                bases = [bases]
            for b in bases:
                cfg.merge(cls.fromfile(os.path.join(os.path.dirname(path), b)))
        child = cls()
        for k, v in ns.items():
            if k.startswith("_") or callable(v) or isinstance(v, type(os)):
                continue
            child[k] = v
        cfg.merge(child)
        cfg["config_path"] = path
        return cfg

    def dump(self) -> str:
        import json

        def default(o):
            try:
                return o.tolist()
            except AttributeError:
                return repr(o)

        return json.dumps(self, indent=2, default=default)


def literal(value: str):
    """Parse a CLI override value: python literal if possible, else raw string."""
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def merge_dot_options(cfg: Config, options: Sequence[str]) -> Config:
    """Apply ``a.b.c=value`` overrides (reference `--cfg-options` DictAction,
    magicdrivedit/utils/config_utils.py:21-56)."""
    for opt in options or []:
        if "=" not in opt:
            raise ValueError(f"Bad --cfg-options entry {opt!r}: expected key=value")
        key, _, raw = opt.partition("=")
        cfg.set_path(key.strip(), literal(raw.strip()))
    return cfg


def parse_configs(argv: Optional[List[str]] = None, training: bool = False) -> Config:
    """CLI entry: positional config path + common flags + dot overrides
    (reference magicdrivedit/utils/config_utils.py:64-141)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="experiment config file (.py)")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--ckpt-path", "--ckpt_path", dest="ckpt_path", default=None)
    parser.add_argument("--outputs", default=None)
    parser.add_argument("--data-path", dest="data_path", default=None)
    parser.add_argument("--resume", default=None)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--cfg-options", nargs="+", default=[])
    args = parser.parse_args(argv)

    cfg = Config.fromfile(args.config)
    for key in ("seed", "ckpt_path", "outputs", "data_path", "resume"):
        val = getattr(args, key)
        if val is not None:
            cfg[key] = val
    if args.debug:
        cfg["debug"] = True
    merge_dot_options(cfg, args.cfg_options)
    return cfg


def merge_dataset_cfg(cfg: Config, data_cfg_name: str, overrides: Sequence = (),
                      num_frames=None, img_size=None, search_dirs: Sequence[str] = ()):
    """Compose a dataset yaml into cfg.dataset with ``(key, value)`` override tuples
    (reference magicdrivedit/utils/config_utils.py:146-173)."""
    from .yaml_compose import load_yaml_config

    candidates = [data_cfg_name]
    for d in list(search_dirs) + ["configs/dataset", os.path.join(os.path.dirname(__file__), "../../configs/dataset")]:
        candidates.append(os.path.join(d, data_cfg_name + ".yaml"))
        candidates.append(os.path.join(d, data_cfg_name))
    path = next((c for c in candidates if os.path.isfile(c)), None)
    if path is None:
        raise FileNotFoundError(f"dataset config {data_cfg_name!r} not found in {search_dirs}")

    ds = Config(load_yaml_config(path))
    root = Config({"dataset": ds})
    for item in overrides or ():
        key, value = item
        key = key.lstrip("+")
        root.set_path(key, value)
    if num_frames is not None:
        root.set_path("dataset.num_frames", num_frames)
    if img_size is not None:
        root.set_path("dataset.image_size", list(img_size))
    cfg["dataset"] = root["dataset"]
    return cfg
