"""Param-pytree checkpointing as flat .npz archives.

Layout parity with the reference's per-module files
(``<ckpdir>/<name>/<module_id>.cpt``, src/trainer.py:58-71): each module's
param tree is one ``<module_id>.npz`` whose keys are ``/``-joined tree paths.
Cross-trainer parameter relays (asr_1 -> asr_2 -> asr_3 in the Seed pipeline)
ride these files exactly like the reference's torch.save state_dicts.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_pytree(path: str, tree: Dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(tree)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_pytree(path: str) -> Dict:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten(flat)


def exists(path: str) -> bool:
    return os.path.isfile(path)


def save_pytree_orbax(path: str, tree: Dict) -> None:
    """Orbax-backed checkpoint (directory at ``path``): sharded-array and
    multi-host safe, for large multi-chip runs where one flat .npz on a
    single host is the wrong tool. Selected via the Solver's
    ``checkpoint_backend: orbax`` config knob; npz stays the default for
    reference-layout parity (one file per module, relay-compatible)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_pytree_orbax(path: str) -> Dict:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def orbax_exists(path: str) -> bool:
    return os.path.isdir(path)


ORBAX_SUFFIX = ".orbax"


def save_auto(path: str, tree: Dict) -> None:
    """Dispatch on the path suffix: ``.orbax`` directory or flat ``.npz``."""
    if path.endswith(ORBAX_SUFFIX):
        save_pytree_orbax(path, tree)
    else:
        save_pytree(path, tree)


def load_auto(path: str) -> Dict:
    if path.endswith(ORBAX_SUFFIX):
        return load_pytree_orbax(path)
    return load_pytree(path)


def exists_auto(path: str) -> bool:
    if path.endswith(ORBAX_SUFFIX):
        return orbax_exists(path)
    return exists(path)


def save_opt_state(path: str, opt_state: Any) -> None:
    """Persist an optimizer-state pytree (optax NamedTuples) as flat leaves.

    The reference silently reinitializes optimizer accumulators on resume
    (src/trainer.py:150-168); saving them avoids that quality regression on
    long Adadelta/Adam runs.  Leaves are stored in ``jax.tree`` flatten order;
    the treedef is reconstructed from a freshly initialized state at load.
    """
    import jax

    leaves = jax.tree.leaves(opt_state)
    flat = {f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_opt_state(path: str, like: Any) -> Any:
    """Restore an optimizer state saved by ``save_opt_state``.

    ``like`` is a freshly initialized state providing the treedef. If the
    leaf count mismatches (optimizer config changed), returns ``like``.
    """
    import jax

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    leaves = [flat[k] for k in sorted(flat)]
    treedef = jax.tree.structure(like)
    if treedef.num_leaves != len(leaves):
        return like
    import jax.numpy as jnp

    ref_leaves = jax.tree.leaves(like)
    cast = [jnp.asarray(l, dtype=r.dtype) for l, r in zip(leaves, ref_leaves)]
    return jax.tree.unflatten(treedef, cast)
