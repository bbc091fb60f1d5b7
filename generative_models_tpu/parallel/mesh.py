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


def make_mesh(dp: Optional[int] = None,
              devices: Optional[Sequence] = None) -> jax.sharding.Mesh:
    """1-D data-parallel mesh over `dp` devices (default: all)."""
    devs = list(devices if devices is not None else jax.devices())
    if dp is not None:
        if dp > len(devs):
            raise ValueError(f"dp={dp} but only {len(devs)} devices")
        devs = devs[:dp]
    return jax.sharding.Mesh(np.array(devs), (DATA_AXIS,))
