"""Data parallelism over the ICI mesh.

Two interchangeable implementations (tested equivalent in
tests/test_parallel.py):

- ``jit`` path (default): the many-steps function runs under plain jit;
  gathered batches get a `with_sharding_constraint` along the batch
  axis, params stay replicated, and XLA inserts the gradient
  all-reduce over ICI itself. Zero code change to the step.
- ``shard_map`` path: explicit SPMD — each device gathers its own batch
  rows and computes local grads; `jax.lax.pmean` reduces them. This is
  the explicit-collective twin (the NCCL-equivalent spelled by hand),
  kept because BASELINE.json names shard_map and because it is the
  shape multi-host DCN scaling would take.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from generative_models_tpu.parallel.mesh import DATA_AXIS


def batch_constrainer(mesh: jax.sharding.Mesh):
    """Returns fn(batches) sharding dim 1 (the batch dim of the
    [nb, B, ...] layout) over the mesh's data axis."""
    def constrain(batches):
        def one(a):
            spec = [None] * a.ndim
            if a.ndim >= 2:
                spec[1] = DATA_AXIS
            return jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, P(*spec)))
        return jax.tree.map(one, batches)
    return constrain


def replicated(mesh: jax.sharding.Mesh):
    return NamedSharding(mesh, P())
