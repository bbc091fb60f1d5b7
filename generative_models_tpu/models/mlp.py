"""Pure-pytree MLP building blocks.

Parameters are plain nested dicts (pytrees); applies are pure functions.
This keeps the stack transparent (the tutorial-zoo character of the
reference), trivially shardable, and differentiable to second order for
the gradient-penalty variants.

Initialization matches `torch.nn.Linear`'s default exactly so loss
trajectories are comparable to the PyTorch reference under the same seed
discipline (SURVEY.md §9.3): both W and b ~ U(-1/sqrt(fan_in),
+1/sqrt(fan_in)). (torch uses kaiming_uniform_(a=sqrt(5)) for W, which
reduces to that same bound.)
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from generative_models_tpu.ops import fused_linear


def linear_init(rng, in_dim: int, out_dim: int, dtype=jnp.float32):
    """One linear layer, torch-default init. W stored [in, out]."""
    bound = 1.0 / (in_dim ** 0.5)
    wk, bk = jax.random.split(rng)
    return {
        "w": jax.random.uniform(wk, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(bk, (out_dim,), dtype, -bound, bound),
    }


def mlp_init(rng, dims: Sequence[int], dtype=jnp.float32) -> List[dict]:
    """Stack of linears: dims = [in, h1, ..., out]."""
    keys = jax.random.split(rng, len(dims) - 1)
    return [
        linear_init(k, dims[i], dims[i + 1], dtype)
        for i, k in enumerate(keys)
    ]


def mlp_apply_xla(layers: List[dict], x, hidden_act: str = "relu",
                  out_act: str = "none", slope: float = 0.2,
                  compute_dtype=None):
    """Per-layer XLA path (the Pallas kernel's correctness twin)."""
    n = len(layers)
    for i, layer in enumerate(layers):
        act = out_act if i == n - 1 else hidden_act
        x = fused_linear(x, layer["w"], layer["b"], act=act, slope=slope,
                         compute_dtype=compute_dtype)
    return x


def mlp_apply(layers: List[dict], x, hidden_act: str = "relu",
              out_act: str = "none", slope: float = 0.2,
              compute_dtype=None):
    """Forward through the stack. On the 'pallas' backend the WHOLE
    stack runs as one fused VMEM-resident TPU kernel
    (ops/pallas_mlp.py); otherwise per-layer fused linear+activation
    (XLA fuses the epilogues)."""
    from generative_models_tpu.ops import get_backend
    if get_backend() == "pallas":
        from generative_models_tpu.ops.pallas_mlp import mlp_apply_pallas
        return mlp_apply_pallas(layers, x, hidden_act, out_act, slope,
                                compute_dtype)
    return mlp_apply_xla(layers, x, hidden_act, out_act, slope,
                         compute_dtype)
