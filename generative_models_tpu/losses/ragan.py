"""RaGAN — Relativistic average GAN (Jolicoeur-Martineau 2018), RaSGAN
form.

Reference: `src/ra_gan.py` (SURVEY.md §3.2 row 10; mount empty, math
paper-pinned). With critic logits C(.):

    D~(x)    = C(x)    - E_fake[C(G(z))]
    D~(G(z)) = C(G(z)) - E_real[C(x)]

    L_D = BCE(D~(x), 1)    + BCE(D~(G(z)), 0)
    L_G = BCE(D~(G(z)), 1) + BCE(D~(x), 0)

Note L_G touches REAL data — the G step consumes a real batch too
(the trainer hands G the last critic batch, reference semantics).
"""

from __future__ import annotations

import jax.numpy as jnp

from generative_models_tpu.losses.base import AdversarialSpec
from generative_models_tpu.losses.common import (
    bce_logits_mean,
    compute_noise,
    global_mean,
)
from generative_models_tpu.models import nets


def _rel_logits(d_params, g_params, batch, rng, cfg, axis_name=None):
    x = batch["image"]
    z = compute_noise(rng, x.shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    c_real = nets.discriminator_apply(d_params, x, cfg)
    c_fake = nets.discriminator_apply(d_params, fake, cfg)
    # E_fake[C] / E_real[C] are GLOBAL-batch means (pmean'd over the DP
    # mesh axis under shard_map): the relativistic average must not
    # silently become a per-shard average.
    d_real = c_real - global_mean(c_fake, axis_name)
    d_fake = c_fake - global_mean(c_real, axis_name)
    return d_real, d_fake


def _d_loss(d_params, g_params, batch, rng, vstate, cfg, axis_name=None):
    d_real, d_fake = _rel_logits(d_params, g_params, batch, rng, cfg,
                                 axis_name)
    loss = bce_logits_mean(d_real, jnp.ones_like(d_real)) + \
        bce_logits_mean(d_fake, jnp.zeros_like(d_fake))
    return loss, {"d_loss": loss}


def _g_loss(g_params, d_params, batch, rng, vstate, cfg, axis_name=None):
    d_real, d_fake = _rel_logits(d_params, g_params, batch, rng, cfg,
                                 axis_name)
    loss = bce_logits_mean(d_fake, jnp.ones_like(d_fake)) + \
        bce_logits_mean(d_real, jnp.zeros_like(d_real))
    return loss, {"g_loss": loss}


def _sample(g_params, rng, n, cfg):
    return nets.generator_apply(g_params, compute_noise(rng, n, cfg.z_dim),
                                cfg)


RAGAN = AdversarialSpec(
    name="ragan",
    init_g=nets.generator_init,
    init_d=nets.discriminator_init,
    d_loss=_d_loss,
    g_loss=_g_loss,
    sample=_sample,
    batch_coupled=True,
)
