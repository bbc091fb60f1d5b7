"""f-GAN — variational f-divergence minimization (Nowozin et al. 2016).

Reference: `src/f_gan.py` (SURVEY.md §3.2 row 12; mount empty, math
paper-pinned from the paper's Tables 2 and 6). The variational bound

    F(G, V) = E_x[ g_f(V(x)) ] - E_z[ f*( g_f(V(G(z))) ) ]

is maximized over the critic V (so L_D = -F) and minimized over G.
Each divergence is an (output activation g_f, Fenchel conjugate f*)
pair; the reference dispatches over a dict of lambdas — here it is a
first-class registry (BASELINE.json: "f-GAN pluggable divergence
family"), selectable via cfg.fgan_divergence or `with_divergence()`.

G objective: the paper minimizes F, i.e. L_G = -E_z[f*(g_f(V(G(z))))]
(the "saturating" form, the default). Nowozin §3.2's non-saturating
alternative L_G = -E_z[g_f(V(G(z)))] — maximize the critic's real-ness
output directly, the same trick NSGAN applies to MMGAN — is selected
with cfg.fgan_g_loss="nonsaturating"; it keeps G gradients alive where
a bounded conjugate saturates (measured per-divergence comparison in
benchmarks/fgan_divergences_conv.json).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from generative_models_tpu.losses.base import AdversarialSpec
from generative_models_tpu.losses.common import compute_noise
from generative_models_tpu.models import nets


@dataclasses.dataclass(frozen=True)
class Divergence:
    """g_f maps raw critic output v to the domain of f*;
    conjugate is f*(t). Fenchel-Young: f(u) >= u*t - f*(t)."""
    name: str
    g_f: Callable
    conjugate: Callable


DIVERGENCES: Dict[str, Divergence] = {d.name: d for d in [
    Divergence("total_variation",
               g_f=lambda v: 0.5 * jnp.tanh(v),
               conjugate=lambda t: t),
    Divergence("kl",
               g_f=lambda v: v,
               conjugate=lambda t: jnp.exp(t - 1.0)),
    Divergence("reverse_kl",
               g_f=lambda v: -jnp.exp(-v),
               conjugate=lambda t: -1.0 - jnp.log(-t)),
    Divergence("pearson",
               g_f=lambda v: v,
               conjugate=lambda t: 0.25 * t * t + t),
    Divergence("squared_hellinger",
               g_f=lambda v: 1.0 - jnp.exp(-v),
               conjugate=lambda t: t / (1.0 - t)),
    Divergence("jensen_shannon",
               g_f=lambda v: jnp.log(2.0) - jax.nn.softplus(-v),
               conjugate=lambda t: -jnp.log(2.0 - jnp.exp(t))),
    Divergence("gan",
               g_f=lambda v: -jax.nn.softplus(-v),
               conjugate=lambda t: -jnp.log(1.0 - jnp.exp(t))),
]}


def get_divergence(name: str) -> Divergence:
    try:
        return DIVERGENCES[name]
    except KeyError:
        raise ValueError(
            f"unknown f-divergence {name!r}; known: {sorted(DIVERGENCES)}")


def _d_loss(d_params, g_params, batch, rng, vstate, cfg):
    div = get_divergence(cfg.fgan_divergence)
    x = batch["image"]
    z = compute_noise(rng, x.shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    t_real = div.g_f(nets.discriminator_apply(d_params, x, cfg))
    t_fake = div.g_f(nets.discriminator_apply(d_params, fake, cfg))
    bound = jnp.mean(t_real) - jnp.mean(div.conjugate(t_fake))
    loss = -bound
    return loss, {"d_loss": loss, "f_bound": bound}


def _g_loss(g_params, d_params, batch, rng, vstate, cfg):
    div = get_divergence(cfg.fgan_divergence)
    z = compute_noise(rng, batch["image"].shape[0], cfg.z_dim)
    fake = nets.generator_apply(g_params, z, cfg)
    t_fake = div.g_f(nets.discriminator_apply(d_params, fake, cfg))
    if cfg.fgan_g_loss == "nonsaturating":
        loss = -jnp.mean(t_fake)          # Nowozin §3.2 alternative
    else:
        loss = -jnp.mean(div.conjugate(t_fake))  # paper objective
    return loss, {"g_loss": loss}


def _sample(g_params, rng, n, cfg):
    return nets.generator_apply(g_params, compute_noise(rng, n, cfg.z_dim),
                                cfg)


FGAN = AdversarialSpec(
    name="fgan",
    init_g=nets.generator_init,
    init_d=nets.discriminator_init,
    d_loss=_d_loss,
    g_loss=_g_loss,
    sample=_sample,
)
