"""Checkpoint / resume for long progressive or multi-host renders.

The reference keeps its accumulation state (`mix_buffer_`,
`cur_sample_idx_`) only in device memory and loses it on any restart
(SURVEY.md §5).  Here every piece of state is an explicit pytree —
accumulator, RNG counters (plain ints, the RNG is stateless), optimizer
state — so checkpointing is plain array serialization, and a resumed
render continues bit-identically."""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save(path: str, tree, metadata: dict | None = None) -> None:
    """Serialize a pytree of arrays (+ JSON-able metadata) to an .npz."""
    flat, treedef = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(flat)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(
            {"n": len(flat), "meta": metadata or {}}
        ).encode(),
        dtype=np.uint8,
    )
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def restore(path: str, like_tree):
    """Restore a pytree saved with :func:`save`; `like_tree` provides the
    structure. Returns (tree, metadata)."""
    data = np.load(path, allow_pickle=False)
    header = json.loads(bytes(data["__treedef__"].tobytes()).decode())
    flat, treedef = jax.tree_util.tree_flatten(like_tree)
    if header["n"] != len(flat):
        raise ValueError(
            f"checkpoint has {header['n']} leaves, expected {len(flat)}"
        )
    leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, leaves), header["meta"]
