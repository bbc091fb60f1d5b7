"""MM-GAN and NS-GAN — the original minimax objective and its
non-saturating heuristic (Goodfellow et al. 2014).

Reference: `src/mm_gan.py`, `src/ns_gan.py` (SURVEY.md §3.2 rows 3-4;
mount empty, math paper-pinned).

Shared D objective (both variants):
    max_D  E_x[log D(x)] + E_z[log(1 - D(G(z)))]
    => L_D = BCE(D(x), 1) + BCE(D(G(z)), 0)          (on logits, stable)

MM-GAN G (saturating):   min_G E_z[log(1 - D(G(z)))]  = -softplus(l_fake)
NS-GAN G (heuristic):    max_G E_z[log D(G(z))]       => BCE(l_fake, 1)
"""

from __future__ import annotations

import jax.numpy as jnp

from generative_models_tpu.losses.base import AdversarialSpec
from generative_models_tpu.losses.common import bce_logits_mean, compute_noise
from generative_models_tpu.models import nets


def _d_loss(d_params, g_params, batch, rng, vstate, cfg):
    x = batch["image"]
    z = compute_noise(rng, x.shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    l_real = nets.discriminator_apply(d_params, x, cfg)
    l_fake = nets.discriminator_apply(d_params, fake, cfg)
    loss = bce_logits_mean(l_real, jnp.ones_like(l_real)) + \
        bce_logits_mean(l_fake, jnp.zeros_like(l_fake))
    return loss, {"d_loss": loss,
                  "d_real": jnp.mean(jnp.asarray(l_real)),
                  "d_fake": jnp.mean(jnp.asarray(l_fake))}


def _g_loss_ns(g_params, d_params, batch, rng, vstate, cfg):
    z = compute_noise(rng, batch["image"].shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    l_fake = nets.discriminator_apply(d_params, fake, cfg)
    loss = bce_logits_mean(l_fake, jnp.ones_like(l_fake))
    return loss, {"g_loss": loss}


def _g_loss_mm(g_params, d_params, batch, rng, vstate, cfg):
    z = compute_noise(rng, batch["image"].shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    l_fake = nets.discriminator_apply(d_params, fake, cfg)
    # log(1 - sigmoid(l)) = -softplus(l) = -BCE(l, 0)
    loss = -bce_logits_mean(l_fake, jnp.zeros_like(l_fake))
    return loss, {"g_loss": loss}


def _sample(g_params, rng, n, cfg):
    z = compute_noise(rng, n, cfg.z_dim)
    return nets.generator_apply(g_params, z, cfg)


NSGAN = AdversarialSpec(
    name="nsgan",
    init_g=nets.generator_init,
    init_d=nets.discriminator_init,
    d_loss=_d_loss,
    g_loss=_g_loss_ns,
    sample=_sample,
)

MMGAN = AdversarialSpec(
    name="mmgan",
    init_g=nets.generator_init,
    init_d=nets.discriminator_init,
    d_loss=_d_loss,
    g_loss=_g_loss_mm,
    sample=_sample,
)
