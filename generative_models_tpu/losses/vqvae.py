"""VQ-VAE (van den Oord, Vinyals & Kavukcuoglu 2017 "Neural Discrete
Representation Learning").

A 17th variant BEYOND the reference zoo (the reference implements VAEs
and GANs only — SURVEY.md §3.2; mount empty, math paper-pinned), and
the zoo's discrete-latent family opener: the encoder maps each image to
a grid of L token vectors (models/vq_net.py), each snapped to its
nearest row of a learned K x D codebook (ops/vq.py — the nearest-code
search is one MXU matmul), and the decoder reconstructs from the
quantized grid.

Loss (Oord Eq. 3), per sample then batch-averaged:

    L = BCE(decode(z_q), x)                (recon; Bernoulli decoder,
                                            summed over pixels — the
                                            VAE family's convention)
      + || sg(z_e) - z_q ||^2              (codebook term: pulls codes
                                            toward encoder outputs)
      + beta * || z_e - sg(z_q) ||^2       (commitment, beta = vq_beta;
                                            Oord §3.2 uses 0.25)

with the vq terms summed over the L x D latent grid (the same
sum-per-sample reduction the recon term uses). Gradients reach the
encoder through the straight-through estimator (forward z_q, backward
identity). This trains codebook rows by GRADIENT (the paper's main
form); the EMA-codebook variant in Oord's appendix is a non-gradient
state update and is out of scope here (documented, not silent).

`sample()` decodes UNIFORM random codes: that is the honest stage-1
sampler — VQ-VAE alone models p(x|tokens), not p(tokens). The
generative completion is the `vqprior` variant (losses/vqprior.py):
an autoregressive prior over the token grid, decoded through this
model. Diagnostics: `perplexity` in the metrics tracks codebook usage
(K = uniform, 1 = collapse).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.losses.base import SingleModelSpec
from generative_models_tpu.losses.common import bce_logits
from generative_models_tpu.models import vq_net
from generative_models_tpu.ops import vq


def init_params(rng, cfg):
    re, rd, rc = jax.random.split(rng, 3)
    d = cfg.vq_code_dim
    return {
        "encoder": vq_net.encoder_init(re, cfg),
        "decoder": vq_net.decoder_init(rd, cfg),
        # N(0, 1/sqrt(D)): rows have ~unit norm, matching the O(1)
        # scale of the encoder's torch-default-init outputs so the
        # initial assignment spreads over the book instead of
        # collapsing onto whichever row happens to be longest
        "codebook": jax.random.normal(
            rc, (cfg.vq_codebook_size, d), jnp.float32) / jnp.sqrt(
                jnp.float32(d)),
    }


def _terms(params, x, cfg):
    """Shared forward: (recon_mean, codebook_mean, commit_mean, idx).
    Also used by losses/vqprior.py's joint branch so the two heads
    cannot drift."""
    z = vq_net.encoder_apply(params["encoder"], x, cfg)      # [B, L, D]
    idx, z_q = vq.quantize(z, params["codebook"])
    z_st = vq.straight_through(z, z_q)
    logits = vq_net.decoder_apply(params["decoder"], z_st, cfg,
                                  logits=True)
    recon = jnp.mean(jnp.sum(bce_logits(logits, x), axis=-1))
    codebook = jnp.mean(jnp.sum(
        (jax.lax.stop_gradient(z) - z_q) ** 2, axis=(1, 2)))
    commit = jnp.mean(jnp.sum(
        (z - jax.lax.stop_gradient(z_q)) ** 2, axis=(1, 2)))
    return recon, codebook, commit, idx


def loss(params, batch, rng, cfg):
    recon, codebook, commit, idx = _terms(params, batch["image"], cfg)
    total = recon + codebook + cfg.vq_beta * commit
    return total, {"loss": total, "recon_loss": recon,
                   "vq_loss": codebook, "commit_loss": commit,
                   "perplexity": vq.perplexity(idx, cfg.vq_codebook_size)}


def encode_tokens(params, x, cfg):
    """Token indices [B, L] for images x [B, 784] — the stage-2
    interface (losses/vqprior.py trains on these)."""
    z = vq_net.encoder_apply(params["encoder"], x, cfg)
    idx, _ = vq.quantize(z, params["codebook"])
    return idx


def decode_tokens(params, idx, cfg):
    """Images [B, 784] in [0, 1] from token indices [B, L]."""
    z_q = vq.lookup(idx, params["codebook"])
    return vq_net.decoder_apply(params["decoder"], z_q, cfg)


def sample(params, rng, n, cfg):
    """Stage-1 diagnostic sampler: decode UNIFORM random token grids
    (see module docstring — the learned prior lives in `vqprior`)."""
    idx = jax.random.randint(
        rng, (n, vq_net.num_tokens(cfg)), 0, cfg.vq_codebook_size)
    return decode_tokens(params, idx, cfg)


def reconstruct(params, x, rng, cfg):
    """Encode -> quantize -> decode (the notebooks' reconstruction
    viz; deterministic — rng accepted for interface parity)."""
    return decode_tokens(params, encode_tokens(params, x, cfg), cfg)


VQVAE = SingleModelSpec(
    name="vqvae",
    init_params=init_params,
    loss=loss,
    sample=sample,
)
