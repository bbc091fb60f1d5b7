"""Shared numerics for the loss heads.

The reference applies `sigmoid` in the D head and `BCELoss` on
probabilities; we keep D as a logit head and use the logit-stable BCE,
which is the same function computed stably:
    BCE(sigmoid(l), t) = softplus(l) - t*l = max(l,0) - t*l + log1p(exp(-|l|))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_logits(logits, targets):
    """Elementwise binary cross-entropy on logits (stable)."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def bce_logits_mean(logits, targets):
    return jnp.mean(bce_logits(logits, targets))


def compute_noise(rng, n: int, z_dim: int):
    """z ~ N(0, I) — the reference's `compute_noise` (torch.randn).
    TO-VERIFY distribution vs reference file."""
    return jax.random.normal(rng, (n, z_dim))


def ones_like_logits(logits):
    return jnp.ones_like(logits)


def zeros_like_logits(logits):
    return jnp.zeros_like(logits)


# --- global-batch statistics under data parallelism -------------------
# Losses that couple samples through batch statistics (RaGAN's E[C],
# FisherGAN's omega, BIR-VAE's batch norm) must compute those statistics
# over the GLOBAL batch. Under shard_map each device sees only its
# shard, so the shard statistic is pmean'd over the mesh axis; under the
# jit path (axis_name=None) the batch is already global and these are
# plain means. Equal shard sizes make pmean-of-means the exact global
# mean.

def global_mean(x, axis_name=None):
    """Scalar mean of x over ALL samples of the global batch."""
    m = jnp.mean(x)
    if axis_name is not None:
        m = jax.lax.pmean(m, axis_name)
    return m


def global_moments_axis0(x, axis_name=None, eps: float = 0.0):
    """(mean, var) of x per feature (axis 0 = batch), over the global
    batch. Var uses E[x^2] - E[x]^2 so it needs only two pmeans."""
    m = jnp.mean(x, axis=0, keepdims=True)
    m2 = jnp.mean(x * x, axis=0, keepdims=True)
    if axis_name is not None:
        m = jax.lax.pmean(m, axis_name)
        m2 = jax.lax.pmean(m2, axis_name)
    return m, jnp.maximum(m2 - m * m, eps)
