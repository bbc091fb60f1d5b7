"""HBM-resident data pipeline primitives.

The reference pays one host->device copy per minibatch (SURVEY.md §4.1
hot-loop note). Here the whole split is a device array for the run's
lifetime and a minibatch is an in-trace gather:

- :func:`make_perm` draws a full-epoch permutation on device,
- :func:`gather_batch` slices a window of it (``lax.dynamic_slice`` —
  static size, so it stays jit-friendly) and gathers rows with
  ``jnp.take``.

The trainer's hot path fuses this with the train step itself
(`train/step.py` gathers from a multi-epoch permutation *stack* so a
whole `scan_steps` chunk crosses epoch boundaries inside one jitted
scan); these standalone primitives are the single-batch form used by
tests and ad-hoc evaluation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class DeviceData:
    """One split, resident on device: images [N, D] f32, labels [N] i32."""

    images: jnp.ndarray
    labels: jnp.ndarray

    @property
    def n(self) -> int:
        return self.images.shape[0]


def make_perm(rng: jax.Array, n: int) -> jax.Array:
    """A full-epoch row permutation, drawn on device."""
    return jax.random.permutation(rng, n)


def gather_batch(data: DeviceData, perm: jax.Array, start: int,
                 batch_size: int) -> Dict[str, jnp.ndarray]:
    """Rows ``perm[start : start+batch_size]`` as a batch dict.

    `start` may be a traced scalar (dynamic_slice); `batch_size` must be
    static.
    """
    idx = jax.lax.dynamic_slice_in_dim(perm, start, batch_size)
    return {"image": jnp.take(data.images, idx, axis=0),
            "label": jnp.take(data.labels, idx, axis=0)}
