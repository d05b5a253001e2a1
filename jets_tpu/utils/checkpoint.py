"""Checkpoint / resume — solver-state and model-vector persistence.

The reference has no in-repo checkpointing (SURVEY §5); its only germ is the
CRC32C content hash. The TPU framework makes checkpointing first-class:
Krylov solver states (:class:`~jets_tpu.solvers.krylov.LSQRState` etc.) are
plain pytrees, so saving/restoring is pytree serialization plus an integrity
hash. A restored state passes straight back into the solver's ``state=``
argument to resume.

Format: a single ``.npz`` holding the leaves (host numpy), a json-encoded
treedef, and the CRC32C content hash for validation on load.
"""
from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hashing import tree_hash

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str, tree: Any, *, meta: dict | None = None) -> int:
    """Serialize a pytree (solver state, model vector, ...) to ``path``.

    Returns the CRC32C content hash stored alongside the data.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    h = tree_hash(tree)
    payload = {
        f"leaf_{i}": np.asarray(jax.device_get(leaf)) for i, leaf in enumerate(leaves)
    }
    payload["__treedef__"] = np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8
    )
    payload["__meta__"] = np.frombuffer(
        json.dumps({"crc32c": h, **(meta or {})}).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)
    return h


def load_checkpoint(path: str, like: Any) -> Tuple[Any, dict]:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``like`` provides the pytree structure (e.g. a state from a dry run of
    the solver with ``maxiter=0``-style shapes, or the previous state
    object). Returns ``(tree, meta)``; raises if the stored content hash
    does not match the restored data (corruption / dtype drift).
    """
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        n = sum(1 for k in z.files if k.startswith("leaf_"))
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    _, treedef = jax.tree_util.tree_flatten(like)
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    h = tree_hash(tree)
    if h != meta["crc32c"]:
        raise ValueError(
            f"checkpoint {path}: content hash mismatch "
            f"(stored {meta['crc32c']}, restored {h})"
        )
    return tree, meta
