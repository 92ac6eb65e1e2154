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


# -- snapshot history + checkpoint averaging ---------------------------
#
# The reference keeps only <module_id>.cpt (latest) and <module_id>_best.cpt
# (src/trainer.py:448-451, 522-527).  ``keep_snapshots: K`` additionally
# retains the K most recent step-stamped copies (``asr.snap-000001000.npz``),
# which enables checkpoint averaging — the standard end-to-end-ASR trick of
# decoding from the elementwise mean of the last K checkpoints to smooth SGD
# noise (Vaswani et al. 2017 §6.1 average-last-5; routine in ESPnet recipes).


def snapshot_path(ckpdir: str, module_id: str, step: int, ext: str = ".npz") -> str:
    """Step-stamped checkpoint path; zero-padded so lexical sort == step sort."""
    return os.path.join(ckpdir, f"{module_id}.snap-{step:09d}{ext}")


def list_snapshots(ckpdir: str, module_id: str) -> list:
    """All snapshots of a module, as (step, path) sorted ascending by step."""
    import glob
    import re

    pat = os.path.join(glob.escape(ckpdir), f"{module_id}.snap-*")
    out = []
    for p in glob.glob(pat):
        m = re.fullmatch(rf"{re.escape(module_id)}\.snap-(\d+)(\.npz|{re.escape(ORBAX_SUFFIX)})",
                         os.path.basename(p))
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out)


def prune_snapshots(ckpdir: str, module_id: str, keep: int) -> list:
    """Delete all but the ``keep`` most recent snapshots; returns removed paths."""
    import shutil

    removed = []
    for _, p in list_snapshots(ckpdir, module_id)[: -keep or None]:
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        else:
            os.remove(p)
        removed.append(p)
    return removed


def average_pytrees(paths) -> Dict:
    """Elementwise mean of checkpoints (npz or orbax, by suffix).

    Accumulates in float64 and casts back to each leaf's original dtype.
    Every checkpoint must have the identical key set and shapes (they come
    from one training run); a mismatch raises ValueError naming the leaf.
    """
    paths = list(paths)
    if not paths:
        raise ValueError("average_pytrees: no checkpoints given")
    acc: Dict[str, np.ndarray] = {}
    dtypes: Dict[str, Any] = {}
    ref_keys = None
    for p in paths:
        flat = _flatten(load_auto(p))
        if ref_keys is None:
            ref_keys = set(flat)
        elif set(flat) != ref_keys:
            diff = sorted(set(flat) ^ ref_keys)
            raise ValueError(f"average_pytrees: {p} key set differs from "
                             f"{paths[0]} (e.g. {diff[:3]})")
        for k, v in flat.items():
            v = np.asarray(v)
            if k not in acc:
                acc[k] = np.zeros(v.shape, np.float64)
                dtypes[k] = v.dtype
            elif acc[k].shape != v.shape:
                raise ValueError(f"average_pytrees: leaf {k!r} shape "
                                 f"{v.shape} in {p} != {acc[k].shape}")
            acc[k] += v.astype(np.float64)
    n = len(paths)
    return _unflatten({k: (a / n).astype(dtypes[k]) for k, a in acc.items()})


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
