"""BEGAN — Boundary Equilibrium GAN (Berthelot et al. 2017).

Reference: `src/be_gan.py` (SURVEY.md §3.2 row 9, §4.4; mount empty,
math paper-pinned). The discriminator is an AUTOENCODER; the
per-sample "energy" is the L1 reconstruction error
    L(v) = |v - AE(v)|  (mean over pixels).

    L_D = L(x) - k_t * L(G(z))
    L_G = L(G(z))
    k_{t+1} = clip(k_t + lambda_k * (gamma * L(x) - L(G(z))), 0, 1)
    M = L(x) + |gamma * L(x) - L(G(z))|      (convergence measure)

k_t is non-gradient state: the reference carries it as a Python float
across steps; here it lives in the jitted carry (`vstate`), updated by
`step_state_update` after each G step using that step's energies.
"""

from __future__ import annotations

import jax.numpy as jnp

from generative_models_tpu.losses.base import AdversarialSpec
from generative_models_tpu.losses.common import compute_noise
from generative_models_tpu.models import nets


def _energy(d_params, v, cfg):
    """Per-sample L1 autoencoder reconstruction error, pixel-mean."""
    recon = nets.began_d_apply(d_params, v, cfg)
    return jnp.mean(jnp.abs(v - recon), axis=-1)


def _d_loss(d_params, g_params, batch, rng, vstate, cfg):
    x = batch["image"]
    z = compute_noise(rng, x.shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    l_real = jnp.mean(_energy(d_params, x, cfg))
    l_fake = jnp.mean(_energy(d_params, fake, cfg))
    loss = l_real - vstate["k"] * l_fake
    return loss, {"d_loss": loss, "began_l_real": l_real,
                  "began_l_fake_d": l_fake}


def _g_loss(g_params, d_params, batch, rng, vstate, cfg):
    z = compute_noise(rng, batch["image"].shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    loss = jnp.mean(_energy(d_params, fake, cfg))
    return loss, {"g_loss": loss, "began_l_fake_g": loss}


def _step_state_update(vstate, d_metrics, g_metrics, cfg):
    l_real = d_metrics["began_l_real"]
    l_fake = g_metrics["began_l_fake_g"]
    balance = cfg.began_gamma * l_real - l_fake
    k = jnp.clip(vstate["k"] + cfg.began_lambda_k * balance, 0.0, 1.0)
    m = l_real + jnp.abs(balance)
    return {"k": k, "m": m}


def _init_vstate(cfg):
    return {"k": jnp.asarray(cfg.began_k0, jnp.float32),
            "m": jnp.asarray(0.0, jnp.float32)}


def _sample(g_params, rng, n, cfg):
    return nets.generator_apply(g_params, compute_noise(rng, n, cfg.z_dim),
                                cfg)


BEGAN = AdversarialSpec(
    name="began",
    init_g=nets.generator_init,
    init_d=nets.began_d_init,
    d_loss=_d_loss,
    g_loss=_g_loss,
    step_state_update=_step_state_update,
    init_vstate=_init_vstate,
    sample=_sample,
)
