"""Gradient-penalty primitives (WGAN-GP / DRAGAN double-backward path).

Reference idiom (SURVEY.md §4.2): torch `autograd.grad(d_hat.sum(),
x_hat, create_graph=True)` then backward through the result. The JAX
form: because the critic is per-sample, the gradient of
sum(D(x_hat)) w.r.t. x_hat IS the batch of per-sample input gradients
— one VJP, no vmap-of-grad needed. Differentiating the penalty w.r.t.
critic params then composes as grad-of-grad inside the same jitted
step (one fused XLA region; BASELINE.json's "double-backward
custom-call" realized the XLA-native way).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def input_gradients(d_apply, d_params, x):
    """Per-sample gradients dD/dx, shape = x.shape.

    d_apply: (params, x[B, D]) -> scores [B].
    """
    return jax.grad(lambda xh: jnp.sum(d_apply(d_params, xh)))(x)


def gradient_penalty(d_apply, d_params, x_hat, lam: float,
                     eps: float = 1e-12):
    """lam * E[(||dD/dx_hat||_2 - 1)^2]. Returns (penalty, mean_norm).

    The eps inside the sqrt keeps the norm differentiable at 0 (torch's
    .norm() subgradient there is 0; XLA would produce NaN without it).
    """
    g = input_gradients(d_apply, d_params, x_hat)
    norms = jnp.sqrt(jnp.sum(g * g, axis=-1) + eps)
    return lam * jnp.mean((norms - 1.0) ** 2), jnp.mean(norms)


def interpolate(rng, real, fake):
    """WGAN-GP x_hat = eps*real + (1-eps)*fake, eps ~ U(0,1) per sample."""
    eps = jax.random.uniform(rng, (real.shape[0], 1))
    return eps * real + (1.0 - eps) * fake


def perturb_real(rng, real, scale: float):
    """DRAGAN x_hat = x + scale * std(x) * U(0,1) elementwise (Kodali
    2017; noise scale TO-VERIFY vs reference)."""
    std = jnp.std(real)
    u = jax.random.uniform(rng, real.shape)
    return real + scale * std * u
