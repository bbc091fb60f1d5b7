"""Convolutional (DCGAN-style) network stacks — `Config.arch="conv"`.

The reference is MLP-only (SURVEY.md §3.2 common scaffolding: every
variant re-declares the same `z -> hidden -> 784` / `784 -> hidden -> 1`
MLPs; mount empty, layout recalled). This module is a capability the
reference does NOT have: a second shared architecture the whole loss-head
zoo runs on unchanged, selected by one config knob. Shapes mirror the
MLP stack exactly at the interface — generators/decoders take flat
latent vectors and return flat 784-pixel images in [0,1], critics take
flat 784 inputs — so every loss head, the gradient-penalty ops, the
sampler/export path, and both DP implementations compose without edits.

Design (Radford et al. 2016 "DCGAN", adapted to 28x28 single-channel):

- NHWC layout throughout — the TPU-native convolution layout (channels
  minor, feeding the MXU's contracting dimension).
- Generator/decoder: dense `z -> 7*7*2C`, then two stride-2 4x4
  transposed convs (7->14->28), GroupNorm+ReLU between upsamples,
  sigmoid head. GroupNorm (Wu & He 2018) replaces DCGAN's BatchNorm
  deliberately: it is per-sample (no cross-batch coupling), which keeps
  every variant's shard_map DP semantics identical to single-device
  (losses/base.py `batch_coupled` contract) and adds no running-stat
  state to the TrainState.
- Critic/encoder trunk: two stride-2 4x4 convs (28->14->7), LeakyReLU,
  no normalization — the WGAN-GP paper's recommendation for critics
  (per-sample penalty conflicts with batch norm), applied uniformly.
- Init: U(+-1/sqrt(kh*kw*cin)) uniformly for all kernels — the torch
  Conv2d default bound. NOTE: torch's ConvTranspose2d default uses
  fan_in = cout*kh*kw (weight [cin,cout,kh,kw], size(1)=cout); we
  deliberately keep the input-fan form for every kernel so one rule
  covers the stack. The torch replica in benchmarks is a SPEED
  baseline (init scale does not affect steps/sec), not a trajectory
  oracle — trajectory parity is pinned on the MLP stack only.
- Everything is plain `lax.conv_general_dilated` / `lax.conv_transpose`
  + elementwise ops: differentiable to second order, so WGAN-GP/DRAGAN
  grad-of-grad works on the conv critic unchanged. XLA lowers these
  convs straight onto the MXU; there is no Pallas twin for the conv
  path (the backend knob applies to the MLP stack only).

Tensor parallelism: `parallel/tp.py`'s Megatron rules target 2-D linear
weights; conv kernels do not shard under them. The Trainer refuses
tp>1 with arch="conv" explicitly rather than silently replicating.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from generative_models_tpu.models.mlp import linear_init
from generative_models_tpu.ops import fused_linear
from generative_models_tpu.ops.activations import apply_act

_DN = ("NHWC", "HWIO", "NHWC")  # TPU-native conv dimension numbers
_GN_EPS = 1e-5
_GN_GROUPS = 8


# --------------------------------------------------------------------
# Layer primitives
# --------------------------------------------------------------------

def conv_init(rng, kh: int, kw: int, cin: int, cout: int,
              dtype=jnp.float32):
    """One conv (or transposed-conv) kernel, torch-default init.
    W stored [kh, kw, cin, cout] (HWIO)."""
    bound = 1.0 / float(kh * kw * cin) ** 0.5
    wk, bk = jax.random.split(rng)
    return {
        "w": jax.random.uniform(wk, (kh, kw, cin, cout), dtype, -bound, bound),
        "b": jax.random.uniform(bk, (cout,), dtype, -bound, bound),
    }


def conv_apply(layer, x, stride: int, act: str = "none",
               slope: float = 0.2, compute_dtype=None):
    """y = act(conv2d(x, W, stride, SAME) + b), f32 accumulation."""
    w = layer["w"]
    if compute_dtype is not None:
        # cast BOTH unconditionally: the input may already arrive in
        # compute_dtype from a previous layer while the kernel is f32,
        # and lax.conv requires matching dtypes
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # f32 path: expose the f32 accumulator explicitly. bf16 path: leave
    # the output bf16 — the MXU accumulates f32 in hardware regardless,
    # and an explicit f32 output would make the conv's TRANSPOSE (the
    # grad) mix an f32 cotangent with the bf16 kernel, which lax.conv
    # rejects (dot_general's transpose handles that mix; conv's does
    # not — found under jax.grad, regression-tested).
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=_DN, preferred_element_type=pet)
    y = y.astype(x.dtype) + layer["b"].astype(x.dtype)
    return apply_act(y, act, slope)


def convt_apply(layer, x, stride: int, act: str = "none",
                slope: float = 0.2, compute_dtype=None):
    """y = act(conv_transpose2d(x, W, stride, SAME) + b). Doubles H, W
    at stride 2 with a 4x4 kernel (the DCGAN upsample block)."""
    w = layer["w"]
    if compute_dtype is not None:
        # unconditional cast — see conv_apply
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    pet = jnp.float32 if x.dtype == jnp.float32 else None  # see conv_apply
    y = lax.conv_transpose(
        x, w, strides=(stride, stride), padding="SAME",
        dimension_numbers=_DN, preferred_element_type=pet)
    y = y.astype(x.dtype) + layer["b"].astype(x.dtype)
    return apply_act(y, act, slope)


def gn_init(channels: int, dtype=jnp.float32):
    return {"scale": jnp.ones((channels,), dtype),
            "bias": jnp.zeros((channels,), dtype)}


def gn_apply(params, x, groups: int = _GN_GROUPS):
    """GroupNorm over (H, W, C/groups) per sample — stateless and
    batch-decoupled (each sample normalized independently, so shard_map
    DP semantics match single-device exactly)."""
    b, h, w, c = x.shape
    g = min(groups, c)
    while c % g:  # channels must divide; fall back toward LayerNorm-ish
        g -= 1
    xg = x.reshape(b, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + _GN_EPS)
    x = xg.reshape(b, h, w, c)
    return x * params["scale"] + params["bias"]


def _img(x, channels: int = 1):
    """[B, 784*channels] flat -> [B, 28, 28, channels] NHWC."""
    return x.reshape(x.shape[0], 28, 28, channels)


def _flat(x):
    return x.reshape(x.shape[0], -1)


# --------------------------------------------------------------------
# Generator / decoder: latent [B, in_dim] -> images [B, 784] in [0, 1]
# --------------------------------------------------------------------

def generator_init(rng, cfg, in_dim=None, norm: bool = True):
    """`norm=False` omits the GroupNorms — used for the BEGAN AE-critic
    decoder to match the paper's norm-free autoencoder (Berthelot 2017
    uses plain ELU convs). Measured: BEGAN-conv collapses at this
    budget with OR without decoder norm at every γ/lr tried (8
    settings); what fixes it is holding the critic's Lipschitz
    constant in a band — `--spectral-projection --sn-target 2.0`
    trains it to IS 4.78 / FID 15.1 at 20k (docs/gallery.md
    analysis). Norm-free is kept for paper fidelity."""
    in_dim = cfg.z_dim if in_dim is None else in_dim
    c = cfg.conv_channels
    r = jax.random.split(rng, 4)
    params = {
        "fc": linear_init(r[0], in_dim, 7 * 7 * 2 * c),
        "up1": conv_init(r[1], 4, 4, 2 * c, c),
        "up2": conv_init(r[2], 4, 4, c, 1),
    }
    if norm:
        params["gn0"] = gn_init(2 * c)
        params["gn1"] = gn_init(c)
    return params


def generator_apply(params, z, cfg, out_act: str = "sigmoid"):
    cdt = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
    c = cfg.conv_channels
    h = fused_linear(z, params["fc"]["w"], params["fc"]["b"], act="none",
                     compute_dtype=cdt)
    h = h.reshape(h.shape[0], 7, 7, 2 * c)
    h = apply_act(gn_apply(params["gn0"], h) if "gn0" in params else h,
                  "relu")
    h = convt_apply(params["up1"], h, stride=2, compute_dtype=cdt)
    h = apply_act(gn_apply(params["gn1"], h) if "gn1" in params else h,
                  "relu")
    h = convt_apply(params["up2"], h, stride=2, act=out_act,
                    compute_dtype=cdt)
    return _flat(h).astype(jnp.float32)


# --------------------------------------------------------------------
# Critic trunk + discriminator: images [B, 784] -> logits [B]
# --------------------------------------------------------------------

def trunk_init(rng, cfg, in_ch: int = 1):
    """Two stride-2 convs: [B,28,28,in_ch] -> [B,7,7,2C] -> flat."""
    c = cfg.conv_channels
    r1, r2 = jax.random.split(rng)
    return {"c1": conv_init(r1, 4, 4, in_ch, c),
            "c2": conv_init(r2, 4, 4, c, 2 * c)}


def trunk_apply(params, x4d, cfg):
    cdt = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
    h = conv_apply(params["c1"], x4d, stride=2, act=cfg.d_hidden_act,
                   slope=cfg.leaky_slope, compute_dtype=cdt)
    h = conv_apply(params["c2"], h, stride=2, act=cfg.d_hidden_act,
                   slope=cfg.leaky_slope, compute_dtype=cdt)
    return _flat(h)  # [B, 7*7*2C]


def trunk_out_dim(cfg) -> int:
    return 7 * 7 * 2 * cfg.conv_channels


def discriminator_init(rng, cfg, in_ch: int = 1):
    r1, r2 = jax.random.split(rng)
    return {"trunk": trunk_init(r1, cfg, in_ch),
            "fc": linear_init(r2, trunk_out_dim(cfg), 1)}


def discriminator_apply(params, x, cfg, in_ch: int = 1):
    cdt = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
    h = trunk_apply(params["trunk"], _img(x, in_ch), cfg)
    out = fused_linear(h, params["fc"]["w"], params["fc"]["b"], act="none",
                       compute_dtype=cdt)
    return out.astype(jnp.float32)[..., 0]


# --------------------------------------------------------------------
# Conditional (CGAN): labels as broadcast one-hot channels on D's input
# (the conv analogue of the reference's flat concat), concat-to-z on G
# --------------------------------------------------------------------

def cond_discriminator_init(rng, cfg):
    return discriminator_init(rng, cfg, in_ch=1 + cfg.num_classes)


def cond_discriminator_apply(params, x, labels, cfg):
    cdt = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
    b = x.shape[0]
    y = jax.nn.one_hot(labels, cfg.num_classes, dtype=jnp.float32)
    y_maps = jnp.broadcast_to(y[:, None, None, :],
                              (b, 28, 28, cfg.num_classes))
    xy = jnp.concatenate([_img(x), y_maps], axis=-1)
    h = trunk_apply(params["trunk"], xy, cfg)
    out = fused_linear(h, params["fc"]["w"], params["fc"]["b"], act="none",
                       compute_dtype=cdt)
    return out.astype(jnp.float32)[..., 0]


# --------------------------------------------------------------------
# VAE encoder: conv trunk -> dense -> (mu, logvar)
# --------------------------------------------------------------------

def encoder_init(rng, cfg):
    r = jax.random.split(rng, 4)
    return {
        "trunk": trunk_init(r[0], cfg),
        "fc": linear_init(r[1], trunk_out_dim(cfg), cfg.vae_hidden_dim),
        "mu": linear_init(r[2], cfg.vae_hidden_dim, cfg.latent_dim),
        "logvar": linear_init(r[3], cfg.vae_hidden_dim, cfg.latent_dim),
    }


def encoder_apply(params, x, cfg):
    cdt = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
    h = trunk_apply(params["trunk"], _img(x), cfg)
    h = fused_linear(h, params["fc"]["w"], params["fc"]["b"], act="relu",
                     compute_dtype=cdt)
    mu = fused_linear(h, params["mu"]["w"], params["mu"]["b"], act="none",
                      compute_dtype=cdt)
    logvar = fused_linear(h, params["logvar"]["w"], params["logvar"]["b"],
                          act="none", compute_dtype=cdt)
    return mu.astype(jnp.float32), logvar.astype(jnp.float32)


def decoder_init(rng, cfg):
    return generator_init(rng, cfg, in_dim=cfg.latent_dim)


def decoder_apply(params, z, cfg, logits: bool = False):
    return generator_apply(params, z, cfg,
                           out_act="none" if logits else "sigmoid")


# --------------------------------------------------------------------
# BEGAN autoencoder critic: conv encoder -> bottleneck -> conv decoder
# --------------------------------------------------------------------

def began_d_init(rng, cfg):
    r = jax.random.split(rng, 3)
    return {
        "enc_trunk": trunk_init(r[0], cfg),
        "enc_fc": linear_init(r[1], trunk_out_dim(cfg), cfg.began_ae_hidden),
        # norm-free decoder: paper-faithful (see generator_init's note)
        "dec": generator_init(r[2], cfg, in_dim=cfg.began_ae_hidden,
                              norm=False),
    }


def began_d_apply(params, x, cfg):
    cdt = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
    h = trunk_apply(params["enc_trunk"], _img(x), cfg)
    h = fused_linear(h, params["enc_fc"]["w"], params["enc_fc"]["b"],
                     act=cfg.d_hidden_act, compute_dtype=cdt)
    return generator_apply(params["dec"], h, cfg)


# --------------------------------------------------------------------
# InfoGAN: shared conv trunk + dense feature layer, D head + Q head
# --------------------------------------------------------------------

def infogan_d_init(rng, cfg):
    r = jax.random.split(rng, 4)
    q_out = cfg.info_cat_dim + 2 * cfg.info_cont_dim
    return {
        "trunk": trunk_init(r[0], cfg),
        "fc": linear_init(r[1], trunk_out_dim(cfg), cfg.hidden_dim),
        "d_head": linear_init(r[2], cfg.hidden_dim, 1),
        "q_head": linear_init(r[3], cfg.hidden_dim, q_out),
    }


def infogan_d_apply(params, x, cfg):
    cdt = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
    h = trunk_apply(params["trunk"], _img(x), cfg)
    h = fused_linear(h, params["fc"]["w"], params["fc"]["b"],
                     act=cfg.d_hidden_act, slope=cfg.leaky_slope,
                     compute_dtype=cdt)
    d = fused_linear(h, params["d_head"]["w"], params["d_head"]["b"],
                     act="none", compute_dtype=cdt)
    q = fused_linear(h, params["q_head"]["w"], params["q_head"]["b"],
                     act="none", compute_dtype=cdt).astype(jnp.float32)
    cat, cont = cfg.info_cat_dim, cfg.info_cont_dim
    return (d.astype(jnp.float32)[..., 0], q[..., :cat],
            q[..., cat:cat + cont], q[..., cat + cont:])
