"""Activation registry shared by the XLA and Pallas linear paths.

Every entry must be expressible inside a Pallas kernel body (pure
jnp/lax elementwise ops on the VPU) as well as in plain XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ACTIVATIONS = {
    "none": lambda x, slope: x,
    "relu": lambda x, slope: jnp.maximum(x, 0.0),
    "leaky_relu": lambda x, slope: jnp.where(x >= 0, x, slope * x),
    "sigmoid": lambda x, slope: jax.nn.sigmoid(x),
    "tanh": lambda x, slope: jnp.tanh(x),
    "softplus": lambda x, slope: jax.nn.softplus(x),
    "elu": lambda x, slope: jax.nn.elu(x),
    "silu": lambda x, slope: x * jax.nn.sigmoid(x),
    # tanh-approx GELU (the GPT-2 form) — pure elementwise, kernel-safe
    "gelu": lambda x, slope: jax.nn.gelu(x, approximate=True),
}


def apply_act(x, act: str, slope: float = 0.2):
    try:
        fn = ACTIVATIONS[act]
    except KeyError:
        raise ValueError(f"unknown activation {act!r}; known: {sorted(ACTIVATIONS)}")
    return fn(x, slope)
