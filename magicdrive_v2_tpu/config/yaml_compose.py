"""YAML loading with OmegaConf-style interpolation.

The reference composes dataset configs with hydra/OmegaConf (SURVEY.md §5). We support the
subset its yamls actually use:

- relative interpolation ``${...image_size}``: N leading dots = climb N-1 levels from the
  *containing node*, then follow the (dot/index) path;
- absolute interpolation ``${a.b.c}`` from the document root;
- indexing into lists with ``.N`` or ``[N]`` (e.g. ``${...augment2d.resize[0]}``).
"""
from __future__ import annotations

import re
from typing import Any, List, Tuple

import yaml

_INTERP = re.compile(r"^\$\{([^}]*)\}$")


def load_yaml_config(path: str) -> dict:
    with open(path) as f:
        doc = yaml.safe_load(f)
    return resolve_interpolations(doc)


def _parse_ref(ref: str) -> Tuple[int, List[Any]]:
    """Return (n_leading_dots, path_parts)."""
    ups = 0
    while ups < len(ref) and ref[ups] == ".":
        ups += 1
    body = ref[ups:]
    parts: List[Any] = []
    for tok in re.split(r"\.", body):
        if not tok:
            continue
        m = re.match(r"([^\[\]]*)((\[\d+\])*)$", tok)
        name, idxs = m.group(1), m.group(2)
        if name:
            parts.append(name)
        for i in re.findall(r"\[(\d+)\]", idxs or ""):
            parts.append(int(i))
    return ups, parts


def _lookup(root: Any, node_path: List[Any], ref: str) -> Tuple[Any, List[Any]]:
    """Resolve `ref` relative to the node at `node_path`; return (value, value_path)."""
    ups, parts = _parse_ref(ref)
    if ups == 0:
        base_path: List[Any] = []
    else:
        # OmegaConf: "${.x}" = containing node; each extra dot climbs one level.
        base_path = node_path[: max(0, len(node_path) - (ups - 1))]
    path = base_path + parts
    node = root
    norm_path = []
    for p in path:
        if isinstance(node, list) and isinstance(p, str) and p.lstrip("-").isdigit():
            p = int(p)  # dotted list index, e.g. ${...dataset_cache_file.0}
        node = node[p]
        norm_path.append(p)
    return node, norm_path


def resolve_interpolations(doc: Any) -> Any:
    def resolve(node: Any, path: List[Any]) -> Any:
        if isinstance(node, dict):
            return {k: resolve(v, path + [k]) for k, v in node.items()}
        if isinstance(node, list):
            return [resolve(v, path + [i]) for i, v in enumerate(node)]
        if isinstance(node, str):
            m = _INTERP.match(node)
            if m:
                target, target_path = _lookup(doc, path[:-1], m.group(1))
                return resolve(target, target_path)
        return node

    return resolve(doc, [])
