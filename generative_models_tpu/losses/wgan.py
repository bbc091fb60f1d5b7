"""WGAN — Wasserstein GAN with weight clipping (Arjovsky et al. 2017).

Reference: `src/w_gan.py` (SURVEY.md §3.2 row 6; mount empty, math
paper-pinned). Critic (linear head, no sigmoid):

    L_D = E_z[D(G(z))] - E_x[D(x)]        (minimize)
    L_G = -E_z[D(G(z))]                    (minimize)

After EVERY critic update, all critic params are clipped to
[-c, c] with c = 0.01 — implemented as the spec's `d_post` hook, which
the trainer applies inside the jitted D scan body. d_steps = 5 and
RMSprop(5e-5) per the paper (config registry; TO-VERIFY vs reference).
"""

from __future__ import annotations

import jax
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
    loss = jnp.mean(d_fake) - jnp.mean(d_real)
    # negative critic loss estimates the Wasserstein distance
    return loss, {"d_loss": loss, "w_estimate": -loss}


def _g_loss(g_params, d_params, batch, rng, vstate, cfg):
    z = compute_noise(rng, batch["image"].shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    loss = -jnp.mean(nets.discriminator_apply(d_params, fake, cfg))
    return loss, {"g_loss": loss}


def _clip(d_params, cfg):
    c = cfg.wgan_clip
    return jax.tree.map(lambda p: jnp.clip(p, -c, c), d_params)


def _sample(g_params, rng, n, cfg):
    return nets.generator_apply(g_params, compute_noise(rng, n, cfg.z_dim),
                                cfg)


WGAN = AdversarialSpec(
    name="wgan",
    init_g=nets.generator_init,
    init_d=nets.discriminator_init,
    d_loss=_d_loss,
    g_loss=_g_loss,
    d_post=_clip,
    sample=_sample,
)
