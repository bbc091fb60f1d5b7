"""Time-conditioned noise-prediction networks for the DDPM family.

The reference zoo has NO diffusion models (SURVEY.md §3.2 — its scope is
VAEs + GANs); this is a beyond-reference capability. Math is
paper-pinned: Ho, Jain & Abbeel 2020 "Denoising Diffusion Probabilistic
Models" (the eps-prediction network and sinusoidal timestep embedding,
§3.3/appendix B).

Two stacks behind one (params, x_flat, t, cfg) -> eps_flat signature,
dispatched on `Config.arch` exactly like models/nets.py:

- "mlp": the zoo-scale stack — two hidden layers of `hidden_dim` with
  the projected timestep embedding ADDED before each activation (the
  standard conditioning-as-bias form), PLUS a direct linear skip from
  the input to the output. The skip is load-bearing, not decoration:
  the eps target is image_dim-dimensional white noise, so a plain
  bottleneck MLP (hidden < image_dim) caps the explainable variance at
  ~hidden/image_dim (measured: loss plateaus at ~1 with hidden 32) —
  while at large t the optimal predictor is nearly a scalar multiple
  of x_t itself, which the full-rank skip expresses exactly.
- "conv": a compact UNet (28 -> 14 -> 7 -> 14 -> 28) built from the
  DCGAN stack's own primitives (models/conv.py conv/convt/GroupNorm):
  3x3 residual-free blocks conv -> GN -> +time -> SiLU, stride-2 4x4
  down/upsamples, skip connections by channel concat. NHWC throughout
  (TPU-native; channels feed the MXU contraction).

Init follows the repo's torch-default uniform convention (models/mlp.py)
with ONE deliberate exception: the OUTPUT layer is zero-initialized
(Ho 2020's released code does the same), so the untrained net predicts
eps = 0 and the simple loss starts at E||eps||^2 = 1 exactly — a
stability property the unit tests pin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.config import Config
from generative_models_tpu.models.conv import (
    _flat,
    _img,
    conv_apply,
    conv_init,
    convt_apply,
    gn_apply,
    gn_init,
)
from generative_models_tpu.models.mlp import linear_init
from generative_models_tpu.ops import fused_linear
from generative_models_tpu.ops.activations import apply_act


def _zero_linear(in_dim: int, out_dim: int):
    return {"w": jnp.zeros((in_dim, out_dim), jnp.float32),
            "b": jnp.zeros((out_dim,), jnp.float32)}


def _zero_conv(kh: int, kw: int, cin: int, cout: int):
    return {"w": jnp.zeros((kh, kw, cin, cout), jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32)}


def timestep_embedding(t, dim: int):
    """Sinusoidal embedding of integer timesteps t [B] -> [B, dim]
    (Transformer/Ho 2020 form: geometric frequencies over half the
    width, sin || cos)."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
        / max(half - 1, 1))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:  # odd widths pad one zero column (keeps dim exact)
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _time_mlp_init(rng, cfg: Config):
    r1, r2, r3 = jax.random.split(rng, 3)
    td = cfg.ddpm_time_dim
    p = {"l": [linear_init(r1, td, td), linear_init(r2, td, td)]}
    if cfg.ddpm_cond:
        # num_classes real labels + one learned NULL token (index
        # num_classes) for classifier-free label dropout (Ho & Salimans
        # 2021); torch nn.Embedding default init N(0, 1)
        p["label"] = jax.random.normal(
            r3, (cfg.num_classes + 1, td), jnp.float32)
    return p


def _time_mlp_apply(params, t, cfg: Config, y=None):
    cd = _cdt(cfg)
    emb = timestep_embedding(t, cfg.ddpm_time_dim)
    if cfg.ddpm_cond:
        if y is None:  # unconditional use of a conditional net
            y = jnp.full(t.shape, cfg.num_classes, jnp.int32)
        emb = emb + params["label"][y]
    lay = params["l"]
    emb = fused_linear(emb, lay[0]["w"], lay[0]["b"], act="silu",
                       compute_dtype=cd)
    return fused_linear(emb, lay[1]["w"], lay[1]["b"], act="none",
                        compute_dtype=cd)


# --------------------------------------------------------------------
# MLP stack
# --------------------------------------------------------------------

def mlp_init(rng, cfg: Config):
    rt, r1, rt1, r2, rt2 = jax.random.split(rng, 5)
    h, td = cfg.hidden_dim, cfg.ddpm_time_dim
    return {
        "time": _time_mlp_init(rt, cfg),
        "in": linear_init(r1, cfg.image_dim, h),
        "t1": linear_init(rt1, td, h),
        "mid": linear_init(r2, h, h),
        "t2": linear_init(rt2, td, h),
        "out": _zero_linear(h, cfg.image_dim),
        # zero-init like "out" so the untrained net still predicts 0;
        # its gradient (x^T delta) is nonzero from step one.
        "skip": _zero_linear(cfg.image_dim, cfg.image_dim),
    }


def mlp_apply(params, x, t, cfg: Config, y=None):
    cd = _cdt(cfg)
    emb = _time_mlp_apply(params["time"], t, cfg, y)
    h = fused_linear(x, params["in"]["w"], params["in"]["b"], act="none",
                     compute_dtype=cd)
    h = apply_act(h + fused_linear(emb, params["t1"]["w"],
                                   params["t1"]["b"], act="none",
                                   compute_dtype=cd), "silu")
    h = fused_linear(h, params["mid"]["w"], params["mid"]["b"],
                     act="none", compute_dtype=cd)
    h = apply_act(h + fused_linear(emb, params["t2"]["w"],
                                   params["t2"]["b"], act="none",
                                   compute_dtype=cd), "silu")
    out = (fused_linear(h, params["out"]["w"], params["out"]["b"],
                        act="none", compute_dtype=cd)
           + fused_linear(x, params["skip"]["w"], params["skip"]["b"],
                          act="none", compute_dtype=cd))
    return out.astype(jnp.float32)


# --------------------------------------------------------------------
# Conv UNet stack
# --------------------------------------------------------------------

def _block_init(rng, cin: int, cout: int, td: int):
    rc, rt = jax.random.split(rng)
    return {"conv": conv_init(rc, 3, 3, cin, cout), "gn": gn_init(cout),
            "t": linear_init(rt, td, cout)}


def _block_apply(params, h, emb, cfg: Config):
    """conv 3x3 -> GroupNorm -> + time bias -> SiLU."""
    h = conv_apply(params["conv"], h, stride=1, act="none",
                   compute_dtype=_cdt(cfg))
    h = gn_apply(params["gn"], h.astype(jnp.float32))
    tb = fused_linear(emb, params["t"]["w"], params["t"]["b"], act="none")
    return apply_act(h + tb[:, None, None, :], "silu")


def _cdt(cfg: Config):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else None


def conv_unet_init(rng, cfg: Config):
    c = cfg.conv_channels
    td = cfg.ddpm_time_dim
    keys = jax.random.split(rng, 11)
    return {
        "time": _time_mlp_init(keys[0], cfg),
        "stem": conv_init(keys[1], 3, 3, 1, c),
        "d1": _block_init(keys[2], c, c, td),            # 28x28, C
        "down1": conv_init(keys[3], 4, 4, c, 2 * c),     # -> 14x14, 2C
        "d2": _block_init(keys[4], 2 * c, 2 * c, td),
        "down2": conv_init(keys[5], 4, 4, 2 * c, 2 * c),  # -> 7x7, 2C
        "mid": _block_init(keys[6], 2 * c, 2 * c, td),
        "up1": conv_init(keys[7], 4, 4, 2 * c, 2 * c),   # -> 14x14, 2C
        "u1": _block_init(keys[8], 4 * c, c, td),        # cat d2 skip (2C)
        "up2": conv_init(keys[9], 4, 4, c, c),           # -> 28x28, C
        "u2": _block_init(keys[10], 2 * c, c, td),       # cat d1 skip (C)
        "head_gn": gn_init(c),
        "head": _zero_conv(3, 3, c, 1),
    }


def conv_unet_apply(params, x, t, cfg: Config, y=None):
    cd = _cdt(cfg)
    emb = _time_mlp_apply(params["time"], t, cfg, y)
    h = conv_apply(params["stem"], _img(x), stride=1, act="none",
                   compute_dtype=cd).astype(jnp.float32)
    s1 = _block_apply(params["d1"], h, emb, cfg)           # 28, C
    h = conv_apply(params["down1"], s1, stride=2, act="none",
                   compute_dtype=cd).astype(jnp.float32)   # 14, 2C
    s2 = _block_apply(params["d2"], h, emb, cfg)           # 14, 2C
    h = conv_apply(params["down2"], s2, stride=2, act="none",
                   compute_dtype=cd).astype(jnp.float32)   # 7, 2C
    h = _block_apply(params["mid"], h, emb, cfg)           # 7, 2C
    h = convt_apply(params["up1"], h, stride=2, act="none",
                    compute_dtype=cd).astype(jnp.float32)  # 14, 2C
    h = _block_apply(params["u1"], jnp.concatenate([h, s2], -1), emb, cfg)
    h = convt_apply(params["up2"], h, stride=2, act="none",
                    compute_dtype=cd).astype(jnp.float32)  # 28, C
    h = _block_apply(params["u2"], jnp.concatenate([h, s1], -1), emb, cfg)
    h = apply_act(gn_apply(params["head_gn"], h), "silu")
    out = conv_apply(params["head"], h, stride=1, act="none")
    return _flat(out.astype(jnp.float32))


# --------------------------------------------------------------------
# Arch dispatch (mirrors models/nets.py)
# --------------------------------------------------------------------

def net_init(rng, cfg: Config):
    if cfg.arch == "conv":
        return conv_unet_init(rng, cfg)
    return mlp_init(rng, cfg)


def net_apply(params, x, t, cfg: Config, y=None):
    """eps_hat [B, image_dim] for noisy inputs x [B, image_dim] (in the
    [-1, 1] diffusion domain) at integer timesteps t [B]. With
    cfg.ddpm_cond, y [B] int labels condition the prediction (y=None or
    index num_classes = the learned null token)."""
    if cfg.arch == "conv":
        return conv_unet_apply(params, x, t, cfg, y)
    return mlp_apply(params, x, t, cfg, y)
