"""Parameter checkpointing.

The reference saves raw ``state_dict`` pickles that can only be reloaded by
re-declaring the model class (its plotter copies every net definition,
Data_process/plot.py:135-252).  Here a checkpoint is a self-describing npz:
flattened parameter leaves + the treedef + the model spec, so
``load_params`` works without re-declaring anything.
"""

from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
import numpy as np


def save_params(path: str, params: Any, meta: dict | None = None) -> str:
    """Save a parameter pytree (+ optional JSON-able metadata)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["treedef"] = np.frombuffer(
        json.dumps(_treedef_to_spec(params)).encode(), dtype=np.uint8
    )
    if meta is not None:
        payload["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **payload)
    return path if path.endswith(".npz") else path + ".npz"


def save_train_state(path: str, carry: Any) -> str:
    """Serialise a full trainer carry (params + optimizer state + best
    tracking) for resumable training — flax msgpack, structure restored
    against a template carry on load."""
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(carry))
    return path


def load_train_state(path: str, template: Any) -> Any:
    """Restore a trainer carry saved by :func:`save_train_state`.

    ``template``: a freshly-constructed carry with the same structure (e.g.
    ``fit(..., epochs=0).carry`` or the carry of a 1-epoch warm run).
    """
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_params(path: str) -> Tuple[Any, dict]:
    """Load a parameter pytree and its metadata."""
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        spec = json.loads(bytes(z["treedef"]).decode())
        meta = json.loads(bytes(z["meta"]).decode()) if "meta" in z else {}
        leaves = [z[f"leaf_{i}"] for i in range(_count_leaves(spec))]
    params = _unflatten_spec(spec, iter(leaves))
    return params, meta


# -- a minimal JSON-able pytree structure encoding (dict/list/tuple/leaf) ----
def _treedef_to_spec(tree):
    if isinstance(tree, dict):
        # jax flattens dicts in SORTED key order — the spec must match, or
        # leaves are reassigned to the wrong slots on load
        keys = sorted(tree.keys())
        return {"t": "dict", "k": keys,
                "c": [_treedef_to_spec(tree[k]) for k in keys]}
    if isinstance(tree, (list, tuple)):
        return {"t": "list" if isinstance(tree, list) else "tuple",
                "c": [_treedef_to_spec(x) for x in tree]}
    if tree is None:
        # jax treats None as an empty pytree (0 leaves), not a leaf
        return {"t": "none"}
    return {"t": "leaf"}


def _count_leaves(spec) -> int:
    if spec["t"] == "leaf":
        return 1
    if spec["t"] == "none":
        return 0
    return sum(_count_leaves(c) for c in spec["c"])


def _unflatten_spec(spec, it):
    if spec["t"] == "leaf":
        return next(it)
    if spec["t"] == "none":
        return None
    children = [_unflatten_spec(c, it) for c in spec["c"]]
    if spec["t"] == "dict":
        return dict(zip(spec["k"], children))
    if spec["t"] == "tuple":
        return tuple(children)
    return children
