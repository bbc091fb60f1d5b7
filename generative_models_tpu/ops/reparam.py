"""VAE sampling path: reparameterization + closed-form Gaussian KL.

BASELINE.json names "the VAE reparameterization and KL path is a fused
sampling kernel" as a north-star component; the Pallas kernel
(`ops/pallas_reparam.py`) fuses eps-generation (in-kernel TPU PRNG),
z = mu + sigma * eps, and the per-element KL partials in one VMEM pass.
This module is the XLA twin + dispatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.ops import linear as _linear


def reparameterize_xla(mu, logvar, rng):
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    return mu + jnp.exp(0.5 * logvar) * eps


def kl_gaussian_xla(mu, logvar):
    """KL(N(mu, sigma^2) || N(0, I)) summed over latent dims:
    -1/2 sum(1 + logvar - mu^2 - exp(logvar)). Shape [B]."""
    return -0.5 * jnp.sum(1.0 + logvar - mu ** 2 - jnp.exp(logvar), axis=-1)


def reparam_and_kl(mu, logvar, rng):
    """(z [B,L], kl [B]) — fused on TPU via Pallas when the backend is
    'pallas', XLA twin otherwise."""
    if _linear.get_backend() == "pallas":
        try:
            from generative_models_tpu.ops.pallas_reparam import (
                reparam_and_kl_pallas,
            )
            return reparam_and_kl_pallas(mu, logvar, rng)
        except ImportError:
            pass
    return reparameterize_xla(mu, logvar, rng), kl_gaussian_xla(mu, logvar)
