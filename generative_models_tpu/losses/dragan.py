"""DRAGAN — Deep Regret Analytic GAN (Kodali et al. 2017).

Reference: `src/dra_gan.py` (SURVEY.md §3.2 row 8; mount empty, math
paper-pinned). NSGAN losses plus a gradient penalty around PERTURBED
REAL data only:

    x_hat = x + 0.5 * std(x) * U(0,1)     (noise scale TO-VERIFY)
    L_D += lam * E[(||grad_{x_hat} D(x_hat)|| - 1)^2],  lam = 10

d_steps = 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.losses.base import AdversarialSpec
from generative_models_tpu.losses.common import bce_logits_mean, compute_noise
from generative_models_tpu.models import nets
from generative_models_tpu.ops.penalty import gradient_penalty, perturb_real


def _d_loss(d_params, g_params, batch, rng, vstate, cfg):
    x = batch["image"]
    z_rng, p_rng = jax.random.split(rng)
    z = compute_noise(z_rng, x.shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    l_real = nets.discriminator_apply(d_params, x, cfg)
    l_fake = nets.discriminator_apply(d_params, fake, cfg)
    bce = bce_logits_mean(l_real, jnp.ones_like(l_real)) + \
        bce_logits_mean(l_fake, jnp.zeros_like(l_fake))
    x_hat = perturb_real(p_rng, x, cfg.dragan_noise_scale)
    gp, grad_norm = gradient_penalty(
        lambda p, xx: nets.discriminator_apply(p, xx, cfg),
        d_params, x_hat, cfg.gp_lambda)
    loss = bce + gp
    return loss, {"d_loss": loss, "gp": gp, "grad_norm": grad_norm}


def _g_loss(g_params, d_params, batch, rng, vstate, cfg):
    z = compute_noise(rng, batch["image"].shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    l_fake = nets.discriminator_apply(d_params, fake, cfg)
    loss = bce_logits_mean(l_fake, jnp.ones_like(l_fake))
    return loss, {"g_loss": loss}


def _sample(g_params, rng, n, cfg):
    return nets.generator_apply(g_params, compute_noise(rng, n, cfg.z_dim),
                                cfg)


DRAGAN = AdversarialSpec(
    name="dragan",
    init_g=nets.generator_init,
    init_d=nets.discriminator_init,
    d_loss=_d_loss,
    g_loss=_g_loss,
    sample=_sample,
    needs_second_order=True,
)
