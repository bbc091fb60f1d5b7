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
