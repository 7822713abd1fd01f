"""Lightweight module registry.

Plays the role of the reference's mmengine registries (reference:
magicdrivedit/registry.py:7-46) without the mmengine dependency: experiment configs name
components by `type=` and `build_module` instantiates them.
"""
from __future__ import annotations

import importlib
from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._modules: Dict[str, Callable] = {}

    def register_module(self, name: Optional[str] = None, module: Optional[Callable] = None):
        if module is not None:  # direct call
            self._modules[name or module.__name__] = module
            return module

        def _register(cls):
            self._modules[name or cls.__name__] = cls
            return cls

        return _register

    def get(self, name: str) -> Callable:
        if name in self._modules:
            return self._modules[name]
        raise KeyError(f"{name!r} is not registered in registry {self.name!r}. "
                       f"Known: {sorted(self._modules)}")

    def __contains__(self, name: str) -> bool:
        return name in self._modules

    def keys(self):
        return self._modules.keys()


MODELS = Registry("models")
SCHEDULERS = Registry("schedulers")
DATASETS = Registry("datasets")


def load_module(path: str) -> Any:
    """Import `pkg.mod.Cls` from a dotted class path (reference:
    magicdrivedit/models/magicdrive/utils.py load_module)."""
    module_name, cls_name = path.rsplit(".", 1)
    mod = importlib.import_module(module_name)
    return getattr(mod, cls_name)


def build_module(cfg: Any, registry: Registry, **extra):
    """Instantiate `cfg['type']` from `registry` with the remaining keys as kwargs.

    Mirrors the reference's build_module (magicdrivedit/registry.py:26-46): accepts a dict
    (or attr-dict) with a `type` key, or passes through non-dict objects unchanged.
    """
    if cfg is None:
        return None
    if not isinstance(cfg, dict):
        return cfg
    cfg = dict(cfg)
    kind = cfg.pop("type")
    cls = registry.get(kind) if kind in registry else load_module(kind)
    return cls(**cfg, **extra)
