"""Checkpointing.

The reference saves params-only via `torch.save(state_dict)` with no
optimizer state and no resume-at-step (SURVEY.md §6). Here the FULL
train state pytree (G+D params, both optimizer states, step counter,
RNG key, variant state like k_t/λ) round-trips, so `--resume` continues
exactly.

Two backends:
- npz  (default): flat key->array archive, stdlib-only, portable.
- orbax: async-capable production checkpointing (utils/orbax_ckpt.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def _flatten(state) -> Dict[str, np.ndarray]:
    leaves, treedef = jax.tree.flatten(state)
    flat = {f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}
    return flat


def save_state(path: str, state: Any) -> str:
    """Save a state pytree to an .npz archive. The pytree STRUCTURE is
    not stored — restore requires a template with identical structure
    (the Trainer's freshly-initialized state)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **_flatten(state))
    return path


def restore_state(path: str, template: Any) -> Any:
    """Restore into the structure of `template`."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    leaves, treedef = jax.tree.flatten(template)
    with np.load(path) as d:
        if len(d.files) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(d.files)} leaves, template has "
                f"{len(leaves)} — variant/config mismatch")
        loaded = [d[f"leaf_{i:05d}"] for i in range(len(leaves))]
    restored = [
        np.asarray(x).astype(np.asarray(l).dtype).reshape(np.shape(l))
        for x, l in zip(loaded, leaves)
    ]
    return jax.tree.unflatten(treedef, restored)
