"""Single fused linear layer as a Pallas kernel — the 1-layer case of
the whole-MLP kernel (ops/pallas_mlp.py), kept as its own entry point
for `ops.fused_linear`'s backend dispatch and for microbenchmarks."""

from __future__ import annotations

import jax.numpy as jnp

from generative_models_tpu.ops.pallas_mlp import mlp_apply_pallas


def linear_pallas(x, w, b, act: str = "none", slope: float = 0.2,
                  compute_dtype=None):
    return mlp_apply_pallas([{"w": w, "b": b}], x, hidden_act=act,
                            out_act=act, slope=slope,
                            compute_dtype=compute_dtype)
