"""Fused linear (+bias +activation) — the MLP zoo's single hot op.

The reference's compute path is `torch.nn.Linear` + separate activation
modules dispatched eagerly per op. Here the op is a single fused
y = act(x @ W + b) with two implementations:

- :func:`linear_xla`    — plain jnp; XLA fuses bias+activation into the
                          matmul epilogue on its own. Always available,
                          differentiable to any order (needed for the
                          WGAN-GP / DRAGAN grad-of-grad path).
- pallas kernel         — `ops/pallas_linear.py`, used on TPU when the
                          backend is set to "pallas". Forward+VJP as
                          hand-written MXU kernels.

`set_backend` flips the module-level dispatch; it is read at trace time,
so flipping it requires re-jitting (the Trainer does this once at build).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.ops.activations import apply_act

_BACKEND = "xla"  # "xla" | "pallas"


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"backend must be 'xla' or 'pallas', got {name!r}")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def default_platform() -> str:
    """Platform jitted code will actually run on: honours
    jax.config.jax_default_device (set e.g. by the test harness to pin
    CPU under the always-registered TPU tunnel), else the default
    backend."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def pallas_backend_available() -> bool:
    """True if the Pallas kernel path is importable and the target
    platform is TPU."""
    if default_platform() != "tpu":
        return False
    try:
        from generative_models_tpu.ops import pallas_linear  # noqa: F401
        return True
    except ImportError:
        return False


def linear_xla(x, w, b, act: str = "none", slope: float = 0.2,
               compute_dtype=None):
    """y = act(x @ w + b); XLA reference implementation.

    Accumulation is always f32 (`preferred_element_type`) so bf16
    activations still hit the MXU with a f32 accumulator.
    """
    if compute_dtype is not None and x.dtype != compute_dtype:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    y = y + b.astype(y.dtype)
    return apply_act(y, act, slope)


def fused_linear(x, w, b, act: str = "none", slope: float = 0.2,
                 compute_dtype=None):
    """Backend-dispatched fused linear. See module docstring."""
    if _BACKEND == "pallas":
        from generative_models_tpu.ops.pallas_linear import linear_pallas
        return linear_pallas(x, w, b, act=act, slope=slope,
                             compute_dtype=compute_dtype)
    return linear_xla(x, w, b, act=act, slope=slope,
                      compute_dtype=compute_dtype)
