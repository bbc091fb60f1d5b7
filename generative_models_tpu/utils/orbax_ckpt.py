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

    def as_abstract(x):
        # orbax deserialization requires a concrete sharding per leaf;
        # take it from the template's live arrays (replicated/DP layouts
        # restore onto the same mesh they were initialized on).
        a = jax.numpy.asarray(x)
        return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding)

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, jax.tree.map(as_abstract, template))
