"""LSGAN — least-squares GAN (Mao et al. 2017).

Reference: `src/ls_gan.py` (SURVEY.md §3.2 row 5; mount empty, math
paper-pinned). Labels (a, b, c) = (0, 1, 1):

    L_D = 1/2 E_x[(D(x) - 1)^2] + 1/2 E_z[D(G(z))^2]
    L_G = 1/2 E_z[(D(G(z)) - 1)^2]

D head is linear (no sigmoid) — the raw critic output is used directly.
"""

from __future__ import annotations

import jax.numpy as jnp

from generative_models_tpu.losses.base import AdversarialSpec
from generative_models_tpu.losses.common import compute_noise
from generative_models_tpu.models import nets


def _d_loss(d_params, g_params, batch, rng, vstate, cfg):
    x = batch["image"]
    z = compute_noise(rng, x.shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    d_real = nets.discriminator_apply(d_params, x, cfg)
    d_fake = nets.discriminator_apply(d_params, fake, cfg)
    loss = 0.5 * jnp.mean((d_real - 1.0) ** 2) + 0.5 * jnp.mean(d_fake ** 2)
    return loss, {"d_loss": loss, "d_real": jnp.mean(d_real),
                  "d_fake": jnp.mean(d_fake)}


def _g_loss(g_params, d_params, batch, rng, vstate, cfg):
    z = compute_noise(rng, batch["image"].shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    d_fake = nets.discriminator_apply(d_params, fake, cfg)
    loss = 0.5 * jnp.mean((d_fake - 1.0) ** 2)
    return loss, {"g_loss": loss}


def _sample(g_params, rng, n, cfg):
    return nets.generator_apply(g_params, compute_noise(rng, n, cfg.z_dim),
                                cfg)


LSGAN = AdversarialSpec(
    name="lsgan",
    init_g=nets.generator_init,
    init_d=nets.discriminator_init,
    d_loss=_d_loss,
    g_loss=_g_loss,
    sample=_sample,
)
