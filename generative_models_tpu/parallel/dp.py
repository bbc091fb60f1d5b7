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
import numpy as np
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


from generative_models_tpu.parallel.mesh import shard_map_nocheck


def _shard_map(f, mesh, in_specs, out_specs, check_vma=False):
    """Version-correct no-check shard_map (parallel/mesh.py shim): the
    jax>=0.7 public API takes check_vma=, the experimental fallback
    takes check_rep= — the shim binds the right kwarg per branch, so
    this module (and ops/pallas_dp.py, which imports this name) cannot
    crash on the fallback path. The check_vma arg is accepted for
    call-site compatibility; both branches disable the check."""
    del check_vma
    return shard_map_nocheck(f, mesh, in_specs=in_specs,
                             out_specs=out_specs)


def make_gather_local(cfg, nb: int, steps_per_epoch: int, n_dev: int):
    """Per-device minibatch gather for the explicit-SPMD paths (this
    module's XLA step and ops/pallas_dp.py's fused-kernel DP): each
    device takes only ITS rows of every minibatch — the rank-offset
    slice of the epoch permutation. Call inside shard_map."""
    from generative_models_tpu.train import step as step_lib

    local_b = cfg.batch_size // n_dev
    rows_per_step = nb * cfg.batch_size
    rows_per_epoch = steps_per_epoch * rows_per_step

    def gather_local(images, labels, perm_stack, rel_offset):
        rank = jax.lax.axis_index(DATA_AXIS)
        e = rel_offset // rows_per_epoch
        r = rel_offset % rows_per_epoch
        perm = jax.lax.dynamic_slice(
            perm_stack, (e, 0), (1, perm_stack.shape[1]))[0]
        # rows of minibatch j for this device:
        #   perm[r + j*B_global + rank*local_b + (0..local_b)]
        base = r + rank * local_b
        idx = (base + jnp.arange(nb)[:, None] * cfg.batch_size
               + jnp.arange(local_b)[None, :])
        rows = jnp.take(perm, idx.reshape(-1), axis=0)
        return {
            "image": step_lib.decode_images(
                jnp.take(images, rows, axis=0)).reshape(
                nb, local_b, images.shape[-1]),
            "label": jnp.take(labels, rows, axis=0).reshape(nb, local_b),
        }

    return gather_local


def build_shard_map_many_steps(spec, cfg, steps_per_epoch: int,
                               mesh: jax.sharding.Mesh):
    """Explicit-SPMD twin of train.step.build_many_steps.

    Everything (state, dataset, permutation stack) is replicated into
    the shard_map; each device gathers only ITS rows of every minibatch
    (rank-offset slice of the epoch permutation), computes local grads,
    and `lax.pmean` reduces them over ICI before the (identical)
    optimizer update on every device. cfg.batch_size is the GLOBAL
    batch; it must divide by the mesh size.

    Returns a jitted fn(state, images, labels, perm_stack, rel_offsets)
    — same contract as the jit path (see build_many_steps).
    """
    from generative_models_tpu.train import step as step_lib

    n_dev = int(np.prod(mesh.devices.shape))
    if cfg.batch_size % n_dev != 0:
        raise ValueError(
            f"global batch {cfg.batch_size} not divisible by mesh size {n_dev}")
    nb = step_lib.batches_per_step(spec, cfg)
    train_step = step_lib.build_step(spec, cfg, axis_name=DATA_AXIS)
    gather_local = make_gather_local(cfg, nb, steps_per_epoch, n_dev)

    def many_steps(state, images, labels, perm_stack, rel_offsets):
        def body(state, rel_offset):
            return train_step(state, gather_local(images, labels,
                                                  perm_stack, rel_offset))
        return jax.lax.scan(body, state, rel_offsets)

    smapped = _shard_map(
        many_steps, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped,
                   donate_argnums=(0,) if cfg.donate_buffers else ())
