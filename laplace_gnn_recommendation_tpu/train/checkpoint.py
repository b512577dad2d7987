"""Checkpoint / resume.

The reference saves bare ``state_dict`` files with no optimizer state and no
resume path (``run_pipeline.py:104-127``; consumer picks the highest version
by filename parse, ``run_submission.py:14-21``). Here checkpoints carry
params + batch-norm state + optimizer state + epoch, written with orbax when
available (sharded-array aware) and an npz flat-pytree fallback otherwise;
``load_latest`` reproduces the version-number selection semantics.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_into(tree, flat: dict):
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(tree)
    new_leaves = []
    for path, leaf in leaves_with_path:
        key = "/".join(str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key}")
        new_leaves.append(jax.numpy.asarray(flat[key]))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_checkpoint(path: str, state: Any) -> None:
    """Write one checkpoint file (npz of the flattened pytree)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **_flatten(state))


def load_checkpoint(path: str, template: Any) -> Any:
    """Load into the structure of ``template``."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten_into(template, flat)


def save_checkpoint_orbax(path: str, state: Any) -> None:
    """Sharded-array-aware checkpoint via orbax (survives row-sharded tables
    bigger than one host; directory-based). The npz path stays the default
    for single-host runs — orbax checkpoints are directories, selected
    explicitly by the caller."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def orbax_available() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except ImportError:  # pragma: no cover
        return False


def save_state(path_base: str, state: Any, sharded: bool = False) -> str:
    """Write one checkpoint at ``path_base`` (no extension).

    ``sharded=True`` (pipelines pass it when the mesh's model axis is >1)
    writes an orbax directory — each host persists only its shards, so
    row-sharded tables bigger than one host's memory checkpoint fine. The
    single-host default stays the flat npz. Returns the written path.
    """
    if sharded and orbax_available():
        path = path_base + ".orbax"
        save_checkpoint_orbax(path, state)
    else:
        path = path_base + ".npz"
        save_checkpoint(path, state)
    return path


def load_latest(directory: str, template: Any, prefix: str = "model_") -> Tuple[Any, Optional[int]]:
    """Pick the checkpoint with the highest version number in its filename —
    reference ``run_submission.py:14-21``. ``model_final`` sorts above any
    numbered epoch (it is the inflection-point best). Understands both the
    npz files and the orbax directories ``save_state`` writes."""
    if not os.path.isdir(directory):
        return template, None
    best_path, best_ver = None, -1
    for name in os.listdir(directory):
        m = re.match(rf"{re.escape(prefix)}(final|\d+)\.(npz|orbax)$", name)
        if not m:
            continue
        ver = 1 << 30 if m.group(1) == "final" else int(m.group(1))
        if ver > best_ver:
            best_ver, best_path = ver, os.path.join(directory, name)
    if best_path is None:
        return template, None
    if best_path.endswith(".orbax"):
        return load_checkpoint_orbax(best_path, template), best_ver
    return load_checkpoint(best_path, template), best_ver
