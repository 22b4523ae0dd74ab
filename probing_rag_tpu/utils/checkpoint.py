"""Pytree checkpointing: flat npz + path manifest.

Replaces the reference's per-file ``torch.save(state_dict)`` with magic-number
filename registry (train.py:344-345, utils.py:303-326 — SURVEY.md §5.4): one
artifact holds the full stacked prober pytree plus a JSON manifest describing
the (layer, position) site order, so loading needs no hardcoded path map.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

# npz (the .npy format) only encodes builtin numpy dtypes; ml_dtypes leaves
# (bfloat16 LM weights, int4 quantized weights) silently degrade to raw void
# fields ("|V1"/"|V2") that load as garbage. Exotic leaves are stored as a
# same-width unsigned view plus a dtype tag in the manifest, and re-viewed on
# load — byte-exact round trip, no storage overhead.
_VIEW_FOR_ITEMSIZE = {1: np.uint8, 2: np.uint16, 4: np.uint32}


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_pytree(path: Path, tree, meta: Optional[Dict[str, Any]] = None) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten(tree)
    exotic: Dict[str, str] = {}
    stored = {}
    for key, arr in flat.items():
        if arr.dtype.kind == "V":  # ml_dtypes all present as numpy kind 'V'
            exotic[key] = arr.dtype.name
            arr = arr.view(_VIEW_FOR_ITEMSIZE[arr.dtype.itemsize])
        stored[key] = arr
    np.savez(path.with_suffix(".npz"), **stored)
    treedef = jax.tree_util.tree_structure(tree)
    manifest = {
        "meta": meta or {},
        "treedef": str(treedef),
        "keys": sorted(flat),
        "exotic_dtypes": exotic,
    }
    path.with_suffix(".json").write_text(json.dumps(manifest, indent=2))


def load_pytree(path: Path, like=None) -> Tuple[Any, Dict[str, Any]]:
    """Load a checkpoint. With ``like`` (a template pytree), the result has
    exactly the template's structure; otherwise a nested dict is rebuilt from
    the flattened key paths."""
    path = Path(path)
    arrays = dict(np.load(path.with_suffix(".npz")))
    manifest = json.loads(path.with_suffix(".json").read_text())
    if manifest.get("exotic_dtypes"):
        import ml_dtypes  # ships with jax

        for key, dtype_name in manifest["exotic_dtypes"].items():
            arrays[key] = arrays[key].view(getattr(ml_dtypes, dtype_name))
    if like is not None:
        flat_template = _flatten(like)
        if set(flat_template) != set(arrays):
            raise ValueError(
                f"checkpoint keys mismatch: {set(flat_template) ^ set(arrays)}"
            )
        leaves = [arrays[k] for k in sorted(flat_template)]
        template_paths = sorted(flat_template)
        path_to_leaf = dict(zip(template_paths, leaves))
        rebuilt = jax.tree_util.tree_map_with_path(
            lambda p, _: path_to_leaf[
                "/".join(str(getattr(x, "key", getattr(x, "idx", x))) for x in p)
            ],
            like,
        )
        return rebuilt, manifest["meta"]

    nested: Dict[str, Any] = {}
    for key, value in arrays.items():
        parts = key.split("/")
        node = nested
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return nested, manifest["meta"]
