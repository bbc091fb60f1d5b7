"""Orbax checkpoint backend — production path (async-capable,
multi-host-ready), complementing the stdlib npz backend in
utils/checkpoint.py. Both round-trip the FULL train state (params, both
optimizer states, step, RNG, variant state), unlike the reference's
params-only torch.save (SURVEY.md §6)."""

from __future__ import annotations

import os
from typing import Any

import jax


def save_state(path: str, state: Any) -> str:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def restore_state(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x),
                                           jax.numpy.asarray(x).dtype),
            template)
        return ckptr.restore(path, abstract)
