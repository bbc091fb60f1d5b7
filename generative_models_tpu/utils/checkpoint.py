"""Checkpointing.

The reference saves params-only via `torch.save(state_dict)` with no
optimizer state and no resume-at-step (SURVEY.md §6). Here the FULL
train state pytree (G+D params, both optimizer states, step counter,
RNG key, variant state like k_t/λ) round-trips, so `--resume` continues
exactly.

Two backends, selected by `Config.ckpt_backend` / `--ckpt-backend`:
- npz  (default): flat key->array archive, stdlib-only, portable.
- orbax: async-capable production checkpointing (utils/orbax_ckpt.py).

The npz archive stores per-leaf key-path/shape/dtype metadata and
restore raises on any mismatch, naming the offending leaf — a
checkpoint from a different config/dtype must never silently
reshape/recast into the template (ADVICE r1, low).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

_META_KEY = "__meta__"


def _is_typed_key(x) -> bool:
    """New-style jax PRNG key arrays (carry their impl in the dtype —
    used when Config.prng_impl != 'threefry'). np.savez can't store
    extended dtypes, so they round-trip through key_data/wrap_key_data."""
    return (hasattr(x, "dtype")
            and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key))


def _paths_and_leaves(state):
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(state)
    paths = [jax.tree_util.keystr(p) for p, _ in leaves_with_paths]
    leaves = [x for _, x in leaves_with_paths]
    return paths, leaves, treedef


def save_state(path: str, state: Any) -> str:
    """Save a state pytree to an .npz archive. The pytree STRUCTURE is
    not stored — restore requires a template with identical structure
    (the Trainer's freshly-initialized state); per-leaf shape/dtype ARE
    stored and verified on restore."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    paths, leaves, _ = _paths_and_leaves(state)
    leaves = [jax.random.key_data(x) if _is_typed_key(x) else x
              for x in leaves]
    flat = {f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = json.dumps([
        {"path": p, "shape": list(np.shape(a)), "dtype": str(a.dtype)}
        for p, a in zip(paths, flat.values())
    ])
    np.savez(path, **flat, **{_META_KEY: np.array(meta)})
    return path


def restore_state(path: str, template: Any) -> Any:
    """Restore into the structure of `template`, verifying every leaf's
    shape and dtype against the archive's stored metadata."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    t_paths, t_leaves, treedef = _paths_and_leaves(template)
    with np.load(path) as d:
        n_leaves = len([k for k in d.files if k != _META_KEY])
        if n_leaves != len(t_leaves):
            raise ValueError(
                f"checkpoint has {n_leaves} leaves, template has "
                f"{len(t_leaves)} — variant/config mismatch")
        loaded = [d[f"leaf_{i:05d}"] for i in range(len(t_leaves))]
        meta = (json.loads(str(d[_META_KEY])) if _META_KEY in d.files
                else None)

    for i, (tp, tl, x) in enumerate(zip(t_paths, t_leaves, loaded)):
        if _is_typed_key(tl):
            t_arr = np.asarray(jax.random.key_data(tl))
            if x.shape == t_arr.shape and x.dtype == t_arr.dtype:
                loaded[i] = jax.random.wrap_key_data(
                    jax.numpy.asarray(x), impl=jax.random.key_impl(tl))
        else:
            t_arr = np.asarray(tl)
        saved_path = meta[i]["path"] if meta else tp
        if x.shape != t_arr.shape or x.dtype != t_arr.dtype:
            raise ValueError(
                f"checkpoint leaf {i} ({saved_path!r}: shape {x.shape}, "
                f"dtype {x.dtype}) does not match template leaf "
                f"{tp!r} (shape {t_arr.shape}, dtype {t_arr.dtype}) — "
                f"refusing to silently reshape/recast")
        if meta and meta[i]["path"] != tp:
            raise ValueError(
                f"checkpoint leaf {i} was saved at tree path "
                f"{saved_path!r} but the template expects {tp!r} — "
                f"variant/config mismatch")
    return jax.tree.unflatten(treedef, loaded)


def save(path: str, state: Any, backend: str = "npz") -> str:
    """Backend-dispatching save (Config.ckpt_backend)."""
    if backend == "npz":
        return save_state(path, state)
    if backend == "orbax":
        from generative_models_tpu.utils import orbax_ckpt
        return orbax_ckpt.save_state(path, state)
    raise ValueError(f"unknown ckpt backend {backend!r}")


def restore(path: str, template: Any, backend: str = "npz") -> Any:
    if backend == "npz":
        return restore_state(path, template)
    if backend == "orbax":
        from generative_models_tpu.utils import orbax_ckpt
        return orbax_ckpt.restore_state(path, template)
    raise ValueError(f"unknown ckpt backend {backend!r}")


def exists(path: str, backend: str = "npz") -> bool:
    """True if a checkpoint is present at `path` for `backend`."""
    if backend == "npz":
        return os.path.exists(
            path if path.endswith(".npz") else path + ".npz")
    return os.path.isdir(os.path.abspath(path))
