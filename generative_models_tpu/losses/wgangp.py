"""WGAN-GP — Wasserstein GAN with gradient penalty (Gulrajani et al.
2017).

Reference: `src/w_gp_gan.py` (SURVEY.md §3.2 row 7, §4.2; mount empty,
math paper-pinned). No weight clipping; instead

    L_D = E[D(G(z))] - E[D(x)] + lam * E[(||grad_{x_hat} D(x_hat)|| - 1)^2]
    x_hat = eps*x + (1-eps)*G(z),  eps ~ U(0,1) per sample,  lam = 10

The penalty's grad-of-grad runs inside the same jitted step
(ops/penalty.py). Adam(1e-4, betas=(0.5, 0.9)), d_steps=5 per paper
(config registry).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.losses.base import AdversarialSpec
from generative_models_tpu.losses.common import compute_noise
from generative_models_tpu.models import nets
from generative_models_tpu.ops.penalty import gradient_penalty, interpolate


def _d_apply(params, x, cfg):
    return nets.discriminator_apply(params, x, cfg)


def _d_loss(d_params, g_params, batch, rng, vstate, cfg):
    x = batch["image"]
    z_rng, eps_rng = jax.random.split(rng)
    z = compute_noise(z_rng, x.shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    d_real = _d_apply(d_params, x, cfg)
    d_fake = _d_apply(d_params, fake, cfg)
    x_hat = interpolate(eps_rng, x, jax.lax.stop_gradient(fake))
    gp, grad_norm = gradient_penalty(
        lambda p, xx: _d_apply(p, xx, cfg), d_params, x_hat, cfg.gp_lambda)
    w = jnp.mean(d_fake) - jnp.mean(d_real)
    loss = w + gp
    return loss, {"d_loss": loss, "w_estimate": -w, "gp": gp,
                  "grad_norm": grad_norm}


def _g_loss(g_params, d_params, batch, rng, vstate, cfg):
    z = compute_noise(rng, batch["image"].shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    loss = -jnp.mean(_d_apply(d_params, fake, cfg))
    return loss, {"g_loss": loss}


def _sample(g_params, rng, n, cfg):
    return nets.generator_apply(g_params, compute_noise(rng, n, cfg.z_dim),
                                cfg)


WGANGP = AdversarialSpec(
    name="wgangp",
    init_g=nets.generator_init,
    init_d=nets.discriminator_init,
    d_loss=_d_loss,
    g_loss=_g_loss,
    sample=_sample,
    needs_second_order=True,
)
