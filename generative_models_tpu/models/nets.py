"""The shared network stacks every variant draws from.

Reference idiom (SURVEY.md §3.2, common scaffolding): each variant file
re-declares an MLP `Generator` (z_dim -> hidden -> 784, sigmoid) and an
MLP `Discriminator` (784 -> hidden -> 1), plus variant-specific heads
(VAE encoder/decoder, BEGAN autoencoder-D, InfoGAN Q-head, CGAN label
concat). Here they are declared once; every loss head composes these.

All applies return logits where a probability head exists in the
reference — losses use logit-stable forms (sigmoid_binary_cross_entropy)
that are mathematically identical to the reference's sigmoid+BCE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.config import Config
from generative_models_tpu.models.mlp import linear_init, mlp_init, mlp_apply


def _cdt(cfg: Config):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else None


def _conv(cfg: Config) -> bool:
    """Every init/apply below dispatches on `Config.arch`: "mlp" is the
    reference-parity stack; "conv" swaps in the DCGAN-style stacks
    (models/conv.py) behind the SAME flat-tensor signatures, so the
    whole loss-head zoo runs on either architecture unchanged."""
    return cfg.arch == "conv"


# --------------------------------------------------------------------
# Generator: z [B, z_dim] -> images [B, 784] in [0, 1] (sigmoid head)
# --------------------------------------------------------------------

def generator_init(rng, cfg: Config, in_dim=None):
    if _conv(cfg):
        from generative_models_tpu.models import conv
        return conv.generator_init(rng, cfg, in_dim)
    in_dim = cfg.z_dim if in_dim is None else in_dim
    return mlp_init(rng, [in_dim, cfg.hidden_dim, cfg.image_dim])


def generator_apply(params, z, cfg: Config):
    if _conv(cfg):
        from generative_models_tpu.models import conv
        return conv.generator_apply(params, z, cfg)
    x = mlp_apply(params, z, hidden_act=cfg.g_hidden_act, out_act="sigmoid",
                  slope=cfg.leaky_slope, compute_dtype=_cdt(cfg))
    return x.astype(jnp.float32)


# --------------------------------------------------------------------
# Discriminator / critic: images [B, 784] -> logits [B]
# --------------------------------------------------------------------

def discriminator_init(rng, cfg: Config, in_dim=None):
    if _conv(cfg):
        from generative_models_tpu.models import conv
        return conv.discriminator_init(rng, cfg)
    in_dim = cfg.image_dim if in_dim is None else in_dim
    return mlp_init(rng, [in_dim, cfg.hidden_dim, 1])


def discriminator_apply(params, x, cfg: Config):
    if _conv(cfg):
        from generative_models_tpu.models import conv
        return conv.discriminator_apply(params, x, cfg)
    out = mlp_apply(params, x, hidden_act=cfg.d_hidden_act, out_act="none",
                    slope=cfg.leaky_slope, compute_dtype=_cdt(cfg))
    return out.astype(jnp.float32)[..., 0]


# --------------------------------------------------------------------
# Conditional variants (CGAN): concat one-hot label to the input
# --------------------------------------------------------------------

def onehot(labels, num_classes: int):
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def cond_generator_init(rng, cfg: Config):
    return generator_init(rng, cfg, in_dim=cfg.z_dim + cfg.num_classes)


def cond_generator_apply(params, z, labels, cfg: Config):
    zy = jnp.concatenate([z, onehot(labels, cfg.num_classes)], axis=-1)
    return generator_apply(params, zy, cfg)


def cond_discriminator_init(rng, cfg: Config):
    if _conv(cfg):
        from generative_models_tpu.models import conv
        return conv.cond_discriminator_init(rng, cfg)
    return discriminator_init(rng, cfg, in_dim=cfg.image_dim + cfg.num_classes)


def cond_discriminator_apply(params, x, labels, cfg: Config):
    if _conv(cfg):
        from generative_models_tpu.models import conv
        return conv.cond_discriminator_apply(params, x, labels, cfg)
    xy = jnp.concatenate([x, onehot(labels, cfg.num_classes)], axis=-1)
    return discriminator_apply(params, xy, cfg)


# --------------------------------------------------------------------
# VAE encoder / decoder (Kingma & Welling 2013 MNIST MLP setup)
# --------------------------------------------------------------------

def encoder_init(rng, cfg: Config):
    if _conv(cfg):
        from generative_models_tpu.models import conv
        return conv.encoder_init(rng, cfg)
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "trunk": mlp_init(r1, [cfg.image_dim, cfg.vae_hidden_dim]),
        "mu": linear_init(r2, cfg.vae_hidden_dim, cfg.latent_dim),
        "logvar": linear_init(r3, cfg.vae_hidden_dim, cfg.latent_dim),
    }


def encoder_apply(params, x, cfg: Config):
    if _conv(cfg):
        from generative_models_tpu.models import conv
        return conv.encoder_apply(params, x, cfg)
    h = mlp_apply(params["trunk"], x, hidden_act="relu", out_act="relu",
                  compute_dtype=_cdt(cfg))
    mu = mlp_apply([params["mu"]], h, out_act="none", compute_dtype=_cdt(cfg))
    logvar = mlp_apply([params["logvar"]], h, out_act="none",
                       compute_dtype=_cdt(cfg))
    return mu.astype(jnp.float32), logvar.astype(jnp.float32)


def decoder_init(rng, cfg: Config):
    if _conv(cfg):
        from generative_models_tpu.models import conv
        return conv.decoder_init(rng, cfg)
    return mlp_init(rng, [cfg.latent_dim, cfg.vae_hidden_dim, cfg.image_dim])


def decoder_apply(params, z, cfg: Config, logits: bool = False):
    """Bernoulli decoder. `logits=True` returns pre-sigmoid logits for
    numerically-stable BCE."""
    if _conv(cfg):
        from generative_models_tpu.models import conv
        return conv.decoder_apply(params, z, cfg, logits=logits)
    out_act = "none" if logits else "sigmoid"
    x = mlp_apply(params, z, hidden_act="relu", out_act=out_act,
                  compute_dtype=_cdt(cfg))
    return x.astype(jnp.float32)


# --------------------------------------------------------------------
# BEGAN autoencoder discriminator: 784 -> h -> 784 (Berthelot 2017,
# adapted to the reference's MLP-on-MNIST scale; SURVEY.md §3.2 row 9)
# --------------------------------------------------------------------

def began_d_init(rng, cfg: Config):
    if _conv(cfg):
        from generative_models_tpu.models import conv
        return conv.began_d_init(rng, cfg)
    return mlp_init(rng, [cfg.image_dim, cfg.began_ae_hidden, cfg.image_dim])


def began_d_apply(params, x, cfg: Config):
    """Returns the autoencoder reconstruction of x (in [0,1])."""
    if _conv(cfg):
        from generative_models_tpu.models import conv
        return conv.began_d_apply(params, x, cfg)
    out = mlp_apply(params, x, hidden_act=cfg.d_hidden_act, out_act="sigmoid",
                    slope=cfg.leaky_slope, compute_dtype=_cdt(cfg))
    return out.astype(jnp.float32)


# --------------------------------------------------------------------
# InfoGAN discriminator: shared trunk, D head (logit) + Q head
# (categorical logits + continuous mu/logvar) — Chen et al. 2016
# --------------------------------------------------------------------

def infogan_d_init(rng, cfg: Config):
    if _conv(cfg):
        from generative_models_tpu.models import conv
        return conv.infogan_d_init(rng, cfg)
    r1, r2, r3 = jax.random.split(rng, 3)
    q_out = cfg.info_cat_dim + 2 * cfg.info_cont_dim
    return {
        "trunk": mlp_init(r1, [cfg.image_dim, cfg.hidden_dim]),
        "d_head": linear_init(r2, cfg.hidden_dim, 1),
        "q_head": linear_init(r3, cfg.hidden_dim, q_out),
    }


def infogan_d_apply(params, x, cfg: Config):
    """Returns (d_logit [B], q_cat_logits [B, cat], q_mu [B, cont],
    q_logvar [B, cont])."""
    if _conv(cfg):
        from generative_models_tpu.models import conv
        return conv.infogan_d_apply(params, x, cfg)
    h = mlp_apply(params["trunk"], x, hidden_act=cfg.d_hidden_act,
                  out_act=cfg.d_hidden_act, slope=cfg.leaky_slope,
                  compute_dtype=_cdt(cfg))
    d = mlp_apply([params["d_head"]], h, out_act="none",
                  compute_dtype=_cdt(cfg)).astype(jnp.float32)[..., 0]
    q = mlp_apply([params["q_head"]], h, out_act="none",
                  compute_dtype=_cdt(cfg)).astype(jnp.float32)
    cat = cfg.info_cat_dim
    cont = cfg.info_cont_dim
    q_cat = q[..., :cat]
    q_mu = q[..., cat:cat + cont]
    q_logvar = q[..., cat + cont:]
    return d, q_cat, q_mu, q_logvar


def infogan_g_init(rng, cfg: Config):
    in_dim = cfg.z_dim + cfg.info_cat_dim + cfg.info_cont_dim
    return generator_init(rng, cfg, in_dim=in_dim)


def infogan_g_apply(params, z, c_cat_onehot, c_cont, cfg: Config):
    zc = jnp.concatenate([z, c_cat_onehot, c_cont], axis=-1)
    return generator_apply(params, zc, cfg)
