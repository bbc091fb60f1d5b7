"""VAE (Kingma & Welling 2013).

Reference: `src/vae.py` (SURVEY.md §3.2 row 1, §4.3; mount empty, math
paper-pinned). Gaussian encoder q(z|x) = N(mu(x), sigma^2(x)),
reparameterization z = mu + sigma ⊙ eps, Bernoulli decoder.

    loss = BCE(recon, x, reduction over pixels: sum)
         + KL(q || N(0, I))        (closed form)
averaged over the batch. Single optimizer, no G/D alternation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.losses.base import SingleModelSpec
from generative_models_tpu.models import nets
from generative_models_tpu.ops.reparam import reparam_and_kl


def init_params(rng, cfg):
    e_rng, d_rng = jax.random.split(rng)
    return {"encoder": nets.encoder_init(e_rng, cfg),
            "decoder": nets.decoder_init(d_rng, cfg)}


def _bce_sum_logits(logits, x):
    """Per-sample sum over pixels of BCE(sigmoid(logits), x), stable."""
    per_px = jnp.maximum(logits, 0.0) - logits * x + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.sum(per_px, axis=-1)


def loss(params, batch, rng, cfg):
    x = batch["image"]
    mu, logvar = nets.encoder_apply(params["encoder"], x, cfg)
    z, kl = reparam_and_kl(mu, logvar, rng)
    if cfg.vae_recon == "bce":
        logits = nets.decoder_apply(params["decoder"], z, cfg, logits=True)
        recon = _bce_sum_logits(logits, x)
    else:
        out = nets.decoder_apply(params["decoder"], z, cfg)
        recon = jnp.sum((out - x) ** 2, axis=-1)
    recon_mean = jnp.mean(recon)
    kl_mean = jnp.mean(kl)
    total = recon_mean + kl_mean
    return total, {"loss": total, "recon_loss": recon_mean,
                   "kl_loss": kl_mean}


def sample(params, rng, n, cfg):
    z = jax.random.normal(rng, (n, cfg.latent_dim))
    return nets.decoder_apply(params["decoder"], z, cfg)


def reconstruct(params, x, rng, cfg):
    """Encode -> sample z -> decode (the notebooks' reconstruction viz)."""
    mu, logvar = nets.encoder_apply(params["encoder"], x, cfg)
    z, _ = reparam_and_kl(mu, logvar, rng)
    return nets.decoder_apply(params["decoder"], z, cfg)


VAE = SingleModelSpec(
    name="vae",
    init_params=init_params,
    loss=loss,
    sample=sample,
)
