"""CGAN — conditional GAN (Mirza & Osindero 2014).

Reference presence uncertain (`src/c_gan.py`, SURVEY.md §3.2 row 14,
R-low) but REQUIRED by BASELINE.json's config list. One-hot label y is
concatenated to both G's input (z ⊕ y) and D's input (x ⊕ y); losses
are NSGAN-style. Enables class-conditional sampling
(`sample_class(g_params, rng, n, y, cfg)`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.losses.base import AdversarialSpec
from generative_models_tpu.losses.common import bce_logits_mean, compute_noise
from generative_models_tpu.models import nets


def _d_loss(d_params, g_params, batch, rng, vstate, cfg):
    x, y = batch["image"], batch["label"]
    z = compute_noise(rng, x.shape[0], cfg.z_dim)
    fake = nets.cond_generator_apply(g_params, z, y, cfg)
    l_real = nets.cond_discriminator_apply(d_params, x, y, cfg)
    l_fake = nets.cond_discriminator_apply(d_params, fake, y, cfg)
    loss = bce_logits_mean(l_real, jnp.ones_like(l_real)) + \
        bce_logits_mean(l_fake, jnp.zeros_like(l_fake))
    return loss, {"d_loss": loss, "d_real": jnp.mean(l_real),
                  "d_fake": jnp.mean(l_fake)}


def _g_loss(g_params, d_params, batch, rng, vstate, cfg):
    y = batch["label"]
    z = compute_noise(rng, y.shape[0], cfg.z_dim)
    fake = nets.cond_generator_apply(g_params, z, y, cfg)
    l_fake = nets.cond_discriminator_apply(d_params, fake, y, cfg)
    loss = bce_logits_mean(l_fake, jnp.ones_like(l_fake))
    return loss, {"g_loss": loss}


def _sample(g_params, rng, n, cfg):
    """Unconditional-looking sampling: cycle through the classes so the
    grid shows one column per digit."""
    z_rng, _ = jax.random.split(rng)
    z = compute_noise(z_rng, n, cfg.z_dim)
    y = jnp.arange(n) % cfg.num_classes
    return nets.cond_generator_apply(g_params, z, y, cfg)


def sample_class(g_params, rng, n, label, cfg):
    z = compute_noise(rng, n, cfg.z_dim)
    y = jnp.full((n,), label, dtype=jnp.int32)
    return nets.cond_generator_apply(g_params, z, y, cfg)


CGAN = AdversarialSpec(
    name="cgan",
    init_g=nets.cond_generator_init,
    init_d=nets.cond_discriminator_init,
    d_loss=_d_loss,
    g_loss=_g_loss,
    sample=_sample,
)
