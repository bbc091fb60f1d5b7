"""Encoder/decoder stacks for the VQ-VAE family (Oord et al. 2017),
dispatched on `Config.arch` exactly like models/nets.py.

Beyond-reference capability (the reference zoo has no discrete-latent
models — SURVEY.md §3.2). Both stacks map images to a TOKEN GRID of
`num_tokens(cfg)` positions, each a `vq_code_dim`-dimensional vector to
be quantized against the codebook (ops/vq.py):

- "mlp": image_dim -> vae_hidden_dim -> L*D, reshaped [B, L, D] with
  L = cfg.vq_tokens — the zoo-scale stack, reusing the VAE family's
  hidden width. Decoder mirrors it (L*D -> vae_hidden_dim -> 784).
- "conv": the DCGAN critic trunk (two stride-2 4x4 convs, 28 -> 7,
  models/conv.py) followed by a 1x1 conv to D channels — a 7x7 = 49
  token grid, the latent layout Oord 2017 §4.1 uses (spatial tokens,
  channels as code dims; NHWC keeps the code dim on the MXU's
  contracting axis). Decoder: 1x1 conv D -> 2C, then the DCGAN
  generator's two stride-2 transposed convs (7 -> 28) with GroupNorm.

Init is the repo's torch-default uniform convention throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.config import Config
from generative_models_tpu.models.conv import (
    _img,
    conv_apply,
    conv_init,
    convt_apply,
    gn_apply,
    gn_init,
)
from generative_models_tpu.models.mlp import mlp_apply, mlp_init


def num_tokens(cfg: Config) -> int:
    """Token-grid size L: the conv stack's 7x7 spatial grid, or the
    configured count for the MLP stack."""
    return 49 if cfg.arch == "conv" else cfg.vq_tokens


def _cdt(cfg: Config):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else None


# --------------------------------------------------------------------
# Encoder: images [B, 784] -> pre-quantization codes [B, L, D]
# --------------------------------------------------------------------

def encoder_init(rng, cfg: Config):
    d = cfg.vq_code_dim
    if cfg.arch == "conv":
        c = cfg.conv_channels
        r1, r2, r3 = jax.random.split(rng, 3)
        return {"c1": conv_init(r1, 4, 4, 1, c),
                "c2": conv_init(r2, 4, 4, c, 2 * c),
                "head": conv_init(r3, 1, 1, 2 * c, d)}
    return {"trunk": mlp_init(
        rng, [cfg.image_dim, cfg.vae_hidden_dim, num_tokens(cfg) * d])}


def encoder_apply(params, x, cfg: Config):
    d = cfg.vq_code_dim
    if cfg.arch == "conv":
        cdt = _cdt(cfg)
        h = conv_apply(params["c1"], _img(x), stride=2,
                       act=cfg.d_hidden_act, slope=cfg.leaky_slope,
                       compute_dtype=cdt)                      # 14, C
        h = conv_apply(params["c2"], h, stride=2,
                       act=cfg.d_hidden_act, slope=cfg.leaky_slope,
                       compute_dtype=cdt)                      # 7, 2C
        h = conv_apply(params["head"], h, stride=1, act="none",
                       compute_dtype=cdt)                      # 7, D
        return h.astype(jnp.float32).reshape(x.shape[0], 49, d)
    h = mlp_apply(params["trunk"], x, hidden_act="relu", out_act="none",
                  compute_dtype=_cdt(cfg))
    return h.astype(jnp.float32).reshape(x.shape[0], num_tokens(cfg), d)


# --------------------------------------------------------------------
# Decoder: quantized codes [B, L, D] -> image logits [B, 784]
# --------------------------------------------------------------------

def decoder_init(rng, cfg: Config):
    d = cfg.vq_code_dim
    if cfg.arch == "conv":
        c = cfg.conv_channels
        r1, r2, r3 = jax.random.split(rng, 3)
        return {"in": conv_init(r1, 1, 1, d, 2 * c),
                "gn0": gn_init(2 * c),
                "up1": conv_init(r2, 4, 4, 2 * c, c),
                "gn1": gn_init(c),
                "up2": conv_init(r3, 4, 4, c, 1)}
    return {"trunk": mlp_init(
        rng, [num_tokens(cfg) * d, cfg.vae_hidden_dim, cfg.image_dim])}


def decoder_apply(params, z_q, cfg: Config, logits: bool = False):
    """Bernoulli decoder over pixels (the VAE family's convention);
    `logits=True` returns pre-sigmoid logits for stable BCE."""
    b = z_q.shape[0]
    out_act = "none" if logits else "sigmoid"
    if cfg.arch == "conv":
        cdt = _cdt(cfg)
        h = z_q.reshape(b, 7, 7, cfg.vq_code_dim)
        h = conv_apply(params["in"], h, stride=1, act="none",
                       compute_dtype=cdt).astype(jnp.float32)
        h = jax.nn.relu(gn_apply(params["gn0"], h))
        h = convt_apply(params["up1"], h, stride=2, compute_dtype=cdt)
        h = jax.nn.relu(gn_apply(params["gn1"], h.astype(jnp.float32)))
        h = convt_apply(params["up2"], h, stride=2, act=out_act,
                        compute_dtype=cdt)
        return h.astype(jnp.float32).reshape(b, cfg.image_dim)
    out = mlp_apply(params["trunk"], z_q.reshape(b, -1), hidden_act="relu",
                    out_act=out_act, compute_dtype=_cdt(cfg))
    return out.astype(jnp.float32)
