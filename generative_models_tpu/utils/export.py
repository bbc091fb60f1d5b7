"""Serving export: serialize a trained sampler as a self-contained
StableHLO artifact (`jax.export`).

The reference's deployment story is "load the notebook and call
generate_images" (SURVEY.md §4.5). The TPU-native story is ahead-of-
time compilation: the generator/decoder parameters are baked into one
serialized, version-stable StableHLO function `seed -> images [n, 784]`
that any JAX process (CPU or TPU, no framework import, no Python model
code) can deserialize and call. This is the same mechanism used to
hand models to serving systems; the artifact is hermetic — losing the
training code does not lose the model.

    blob = export_sampler(spec, cfg, params, n=64)
    open("sampler.shlo", "wb").write(blob)
    # elsewhere, framework-free:
    from jax import export
    images = export.deserialize(open("sampler.shlo", "rb").read()).call(seed)
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from jax import export as jax_export

from generative_models_tpu.config import Config

PLATFORMS = ("cpu", "tpu")


def export_sampler(spec, cfg: Config, params: Any, n: int) -> bytes:
    """Serialize `seed -> [n, image_dim] images in [0,1]` with the
    trained params baked in as constants. Threefry keys inside, so the
    artifact's output is bit-stable across releases for a given seed."""
    params = jax.device_get(params)  # bake concrete host values

    def sample(seed):
        # typed key with the impl pinned: the artifact must stay
        # bit-stable per seed and platform-portable even if the
        # process-global PRNG impl is rbg (platform-dependent bits)
        key = jax.random.key(seed, impl="threefry2x32")
        return spec.sample(params, key, n, cfg)

    from generative_models_tpu import ops
    prev_backend = ops.get_backend()
    ops.set_backend("xla")  # pallas_call can't lower for the cpu
    #                         platform of a multi-platform export
    try:
        exp = jax_export.export(jax.jit(sample), platforms=PLATFORMS)(
            jax.ShapeDtypeStruct((), jnp.int32))
    finally:
        ops.set_backend(prev_backend)
    return exp.serialize()


def save_sampler(path: str, spec, cfg: Config, params: Any, n: int) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(export_sampler(spec, cfg, params, n))
    return path


def load_sampler(path: str):
    """Returns fn(seed: int) -> images, framework-free."""
    with open(path, "rb") as f:
        exp = jax_export.deserialize(f.read())
    return lambda seed: exp.call(jnp.int32(seed))
