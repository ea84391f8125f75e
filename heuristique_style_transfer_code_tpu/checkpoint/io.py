"""Native checkpoint IO: flat-key .npz pytrees + hyperparameter JSON sidecar.

Mirrors the reference's artifact conventions
(functions/functions_RESNET50_Truncate.py:129-141): a weights file plus
``<name>_hyperparameters.json`` next to it.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np

_SEP = "/"


def _flatten(tree: Any, prefix: str = "", coerce=np.asarray) -> Dict[str, Any]:
    """Flat dotted-key dict with None/empty-container markers. ``coerce``
    maps real leaves (default np.asarray — which GATHERS a sharded
    jax.Array; sharded_io passes identity to keep shards on device)."""
    flat: Dict[str, Any] = {}
    if isinstance(tree, dict):
        if not tree:  # marker: empty containers must survive the round-trip
            flat[prefix[: -len(_SEP)] + ".__empty_dict__"] = np.zeros(0)
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}{_SEP}", coerce))
    elif isinstance(tree, (list, tuple)):
        if not tree:  # e.g. 'convs': [] from a 1-layer discriminator plan
            flat[prefix[: -len(_SEP)] + ".__empty_list__"] = np.zeros(0)
        for i, v in enumerate(tree):
            flat.update(_flatten(v, f"{prefix}{i}{_SEP}", coerce))
    elif tree is None:
        flat[prefix[: -len(_SEP)] + ".__none__"] = np.zeros(0)
    else:
        flat[prefix[: -len(_SEP)]] = coerce(tree)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        if key.endswith(".__none__"):
            parts = key[: -len(".__none__")].split(_SEP)
            val = None
        elif key.endswith(".__empty_dict__"):
            parts = key[: -len(".__empty_dict__")].split(_SEP)
            val = {}
        elif key.endswith(".__empty_list__"):
            parts = key[: -len(".__empty_list__")].split(_SEP)
            val = []
        else:
            parts = key.split(_SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        out = {k: listify(v) for k, v in node.items()}
        if out and all(k.isdigit() for k in out):
            return [out[str(i)] for i in range(len(out))]
        return out

    return listify(root)


def save_pytree_npz(tree: Any, path: str) -> None:
    """Atomic write: serialise to a temp file in the same directory, then
    rename — a crashed run can never leave a torn checkpoint (the resume
    files best_model_results.json etc. point only at complete ones)."""
    import tempfile

    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    flat = {k: np.asarray(v) for k, v in _flatten(tree).items()}
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_pytree_npz(path: str, as_jax: bool = True) -> Any:
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    tree = _unflatten(flat)
    if as_jax:
        import jax.numpy as jnp

        tree = jax.tree_util.tree_map(lambda x: jnp.asarray(x) if x is not None else None, tree)
    return tree


def save_model_and_hyperparameters(tree: Any, hyperparameters: dict, save_dir: str, filename: str):
    """Reference-compatible artifact pair: <name>.npz + <name>_hyperparameters.json."""
    os.makedirs(save_dir, exist_ok=True)
    model_path = os.path.join(save_dir, f"{filename}.npz")
    save_pytree_npz(tree, model_path)
    with open(os.path.join(save_dir, f"{filename}_hyperparameters.json"), "w") as f:
        json.dump(hyperparameters, f, indent=4)
    return model_path


def load_hyperparameters(config_path: str) -> dict:
    with open(config_path, "r") as f:
        return json.load(f)


# ------------------------------------------------------------- orbax backend


def save_pytree_orbax(tree: Any, path: str) -> None:
    """Orbax StandardCheckpointer save (atomic, async-capable) — the
    production checkpoint backend for large runs; npz remains the default
    for its zero-dependency portability."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_pytree_orbax(path: str, like: Any = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), target=like)
    return ckptr.restore(os.path.abspath(path))
