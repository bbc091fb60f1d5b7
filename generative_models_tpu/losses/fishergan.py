"""Fisher GAN (Mroueh & Sercu 2017).

Reference: `src/fisher_gan.py` (SURVEY.md §3.2 row 13; mount empty,
math paper-pinned). IPM objective with a variance constraint enforced
by an augmented Lagrangian:

    E(f)    = E_x[f(x)] - E_z[f(G(z))]
    Omega   = 1/2 E_x[f(x)^2] + 1/2 E_z[f(G(z))^2]       (target: 1)
    L(f, lam) = E(f) + lam*(1 - Omega) - rho/2*(1 - Omega)^2

Critic: gradient ASCENT on L (so d_loss = -L, with lam held constant).
Multiplier: gradient DESCENT, a NON-GRADIENT state update inside the
step (the reference does it manually after backward):
    lam <- lam - rho * dL/dlam = lam - rho * (1 - Omega)
Generator: minimizes the IPM -> g_loss = -E_z[f(G(z))].
rho ~ 1e-6 (TO-VERIFY).
"""

from __future__ import annotations

import jax.numpy as jnp

from generative_models_tpu.losses.base import AdversarialSpec
from generative_models_tpu.losses.common import compute_noise, global_mean
from generative_models_tpu.models import nets


def _d_loss(d_params, g_params, batch, rng, vstate, cfg, axis_name=None):
    x = batch["image"]
    z = compute_noise(rng, x.shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    f_real = nets.discriminator_apply(d_params, x, cfg)
    f_fake = nets.discriminator_apply(d_params, fake, cfg)
    # the omega constraint couples samples nonlinearly: its expectations
    # must be over the GLOBAL batch (pmean'd under shard_map)
    ipm = global_mean(f_real, axis_name) - global_mean(f_fake, axis_name)
    omega = 0.5 * global_mean(f_real ** 2, axis_name) + \
        0.5 * global_mean(f_fake ** 2, axis_name)
    constraint = 1.0 - omega
    lam = vstate["lam"]
    lagrangian = ipm + lam * constraint - 0.5 * cfg.fisher_rho * constraint ** 2
    loss = -lagrangian
    return loss, {"d_loss": loss, "ipm": ipm, "omega": omega,
                  "constraint": constraint}


def _d_state_update(vstate, d_metrics, cfg):
    # descent step on the multiplier, using THIS critic step's
    # constraint value (reference updates lam after every D backward)
    lam = vstate["lam"] - cfg.fisher_rho * d_metrics["constraint"]
    return {"lam": lam}


def _g_loss(g_params, d_params, batch, rng, vstate, cfg, axis_name=None):
    z = compute_noise(rng, batch["image"].shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    # linear in per-sample terms (grad-pmean alone would be correct);
    # global_mean keeps the reported metric identical across shards
    loss = -global_mean(nets.discriminator_apply(d_params, fake, cfg),
                        axis_name)
    return loss, {"g_loss": loss}


def _init_vstate(cfg):
    return {"lam": jnp.asarray(0.0, jnp.float32)}


def _sample(g_params, rng, n, cfg):
    return nets.generator_apply(g_params, compute_noise(rng, n, cfg.z_dim),
                                cfg)


FISHERGAN = AdversarialSpec(
    name="fishergan",
    init_g=nets.generator_init,
    init_d=nets.discriminator_init,
    d_loss=_d_loss,
    g_loss=_g_loss,
    d_state_update=_d_state_update,
    init_vstate=_init_vstate,
    sample=_sample,
    batch_coupled=True,
)
