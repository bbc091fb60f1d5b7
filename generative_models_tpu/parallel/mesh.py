"""Device mesh construction.

The reference is single-process single-device with no communication
backend at all (SURVEY.md §3.2 callout). The TPU-native scaling story
is data parallelism over ICI: a 1-D `jax.sharding.Mesh` over the chips,
batch sharded on the `data` axis, params replicated, gradient
all-reduce riding XLA's TPU collectives. Tensor parallelism over a 2-D
(data, model) mesh lives in parallel/tp.py; pipeline parallelism over
the transformer prior's block stack (a 2-D (data, pipe) mesh) in
parallel/pp.py; SP/EP stay out of scope (no sequence long enough to
shard, no experts — docs/design.md §7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

DATA_AXIS = "data"

# shard_map compat shim shared by dp/tp/pp: the jax>=0.7 public API
# takes check_vma=, the jax.experimental fallback takes check_rep= —
# passing the wrong kwarg is a TypeError, so the branch must bind it,
# not the call sites.
try:
    from jax import shard_map as _shard_map_raw  # jax >= 0.7

    def shard_map_nocheck(f, mesh, in_specs, out_specs):
        return _shard_map_raw(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_raw

    def shard_map_nocheck(f, mesh, in_specs, out_specs):
        return _shard_map_raw(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)


def make_mesh_2axis(dp: int, n: int, second_axis: str,
                    devices: Optional[Sequence] = None) -> jax.sharding.Mesh:
    """2-D mesh ``dp * n`` devices as axes ("data", second_axis) —
    shared by parallel/tp.py ("model") and parallel/pp.py ("pipe")."""
    devs = list(devices if devices is not None else jax.devices())
    need = dp * n
    if need > len(devs):
        raise ValueError(f"dp*{second_axis}={need} but only "
                         f"{len(devs)} devices")
    return jax.sharding.Mesh(np.array(devs[:need]).reshape(dp, n),
                             (DATA_AXIS, second_axis))


def make_mesh(dp: Optional[int] = None,
              devices: Optional[Sequence] = None) -> jax.sharding.Mesh:
    """1-D data-parallel mesh over `dp` devices (default: all)."""
    devs = list(devices if devices is not None else jax.devices())
    if dp is not None:
        if dp > len(devs):
            raise ValueError(f"dp={dp} but only {len(devs)} devices")
        devs = devs[:dp]
    return jax.sharding.Mesh(np.array(devs), (DATA_AXIS,))
