"""BIR-VAE — Bounded-Information-Rate VAE (Braithwaite & Kleijn 2018).

Reference: `src/bir_vae.py` (SURVEY.md §3.2 row 2; mount empty, math
paper-pinned). Differences from the vanilla VAE:

- the encoder outputs a MEAN only; the channel noise has FIXED variance
  sigma^2 chosen from a target information rate I (bits):
      per-dim rate  i = I / latent_dim  bits
      sigma^2 = 2^(-2 i) = 4^(-I/latent_dim)
  (unit-power signal + AWGN channel capacity 1/2 log2(1 + S/N), here
  pinned via the power constraint below),
- latents are batch-normalized to zero-mean unit-power per dim so the
  rate bound holds (no learned BN params),
- NO KL term: maximize reconstruction likelihood through the fixed
  channel. The implicit marginal q(z) approaches N(0, I), so sampling
  uses the unit Gaussian prior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.losses.base import SingleModelSpec
from generative_models_tpu.losses.common import global_moments_axis0
from generative_models_tpu.models import nets
from generative_models_tpu.models.mlp import linear_init, mlp_apply, mlp_init


def init_params(rng, cfg):
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "enc_trunk": mlp_init(r1, [cfg.image_dim, cfg.vae_hidden_dim]),
        "enc_mu": linear_init(r2, cfg.vae_hidden_dim, cfg.latent_dim),
        "decoder": nets.decoder_init(r3, cfg),
    }


def encode(params, x, cfg):
    h = mlp_apply(params["enc_trunk"], x, hidden_act="relu", out_act="relu")
    return mlp_apply([params["enc_mu"]], h, out_act="none")


def noise_sigma(cfg) -> float:
    return float(4.0 ** (-cfg.birvae_bits / cfg.latent_dim)) ** 0.5


def loss(params, batch, rng, cfg, axis_name=None):
    x = batch["image"]
    mu = encode(params, x, cfg)
    # batch normalization to unit power (no learned scale/shift); the
    # moments are GLOBAL-batch statistics (pmean'd over the DP mesh
    # axis under shard_map) so the rate bound holds at the global batch
    mean, var = global_moments_axis0(mu, axis_name)
    mu_hat = (mu - mean) * jax.lax.rsqrt(var + 1e-5)
    z = mu_hat + noise_sigma(cfg) * jax.random.normal(rng, mu_hat.shape)
    if cfg.vae_recon == "bce":
        logits = nets.decoder_apply(params["decoder"], z, cfg, logits=True)
        per_px = jnp.maximum(logits, 0.0) - logits * x + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        recon = jnp.sum(per_px, axis=-1)
    else:
        out = nets.decoder_apply(params["decoder"], z, cfg)
        recon = jnp.sum((out - x) ** 2, axis=-1)
    total = jnp.mean(recon)
    return total, {"loss": total, "recon_loss": total,
                   "latent_power": jnp.mean(mu_hat ** 2)}


def sample(params, rng, n, cfg):
    z = jax.random.normal(rng, (n, cfg.latent_dim))
    return nets.decoder_apply(params["decoder"], z, cfg)


BIRVAE = SingleModelSpec(
    name="birvae",
    init_params=init_params,
    loss=loss,
    sample=sample,
    batch_coupled=True,
)
