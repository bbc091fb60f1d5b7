"""DDPM — Denoising Diffusion Probabilistic Models (Ho et al. 2020).

A model family BEYOND the reference zoo (the reference implements VAEs
and GANs only — SURVEY.md §3.2; mount empty, math paper-pinned). It
rides the same SingleModelSpec slot as the VAE family: one optimizer,
no alternation, the whole Trainer/DP/checkpoint/export surface unchanged.

Training (Ho 2020 Algorithm 1, the "simple" objective, Eq. 14):

    t ~ U{0..T-1},  eps ~ N(0, I)
    x_t = sqrt(abar_t) x_0 + sqrt(1 - abar_t) eps
    L = E || eps_theta(x_t, t) - eps ||^2   (mean over batch and pixels)

with the linear beta schedule beta_1..beta_T in [1e-4, 0.02] (Ho §4).
Pixels map [0,1] -> [-1,1] for diffusion and back for sampling, so the
data pipeline, viz, and quality scorer are shared with the zoo.

Sampling (Ho 2020 Algorithm 2, generalized per Song et al. 2021 "DDIM"
§4.1-4.2): over an evenly strided subsequence of S <= T steps,

    x0_hat = (x_t - sqrt(1-abar_t) eps_theta) / sqrt(abar_t), clipped
    sigma  = eta sqrt((1-abar_prev)/(1-abar_t)) sqrt(1 - abar_t/abar_prev)
    x_prev = sqrt(abar_prev) x0_hat + sqrt(1-abar_prev-sigma^2) eps_theta
             + sigma z

eta=1 on the full sequence IS ancestral DDPM (with the x0-clipped
posterior Ho's released code uses); eta=0 is deterministic DDIM; S < T
trades fidelity for an S/T sampling-cost cut. The chain is one
`lax.scan` over stacked per-step constants — static shapes, one compiled
body, TPU-friendly.

EMA: `ema_decay=0.999` is the variant default (Ho samples from an EMA of
the weights); the Trainer's existing EMA plumbing (train/step.py) does
the rest — sampling/export/eval use the EMA params automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.losses.base import SingleModelSpec
from generative_models_tpu.models import ddpm_net


def alphas_bar(cfg):
    """abar_t = prod_{s<=t} alpha_s, t = 0..T-1. [T] f32.

    "linear": alpha_s = 1 - beta_s with beta linearly spaced
    beta_start..beta_end (Ho 2020 §4). "cosine": abar follows
    f(t)/f(0) with f(t) = cos^2((t/T + s)/(1+s) * pi/2), s = 0.008,
    realized through per-step alphas clipped so beta <= 0.999 — the
    clip keeps the chain's final steps from collapsing abar to exactly
    0 (Nichol & Dhariwal 2021 §3.2). The same [T] vector drives both
    the training-noise gather and the sampler's strided schedule, so a
    schedule change is one config knob."""
    t_count = cfg.ddpm_timesteps
    if cfg.ddpm_schedule == "cosine":
        s = 0.008
        grid = jnp.arange(t_count + 1, dtype=jnp.float32) / t_count
        f = jnp.cos((grid + s) / (1.0 + s) * (jnp.pi / 2.0)) ** 2
        abar_grid = f / f[0]
        alphas = jnp.clip(abar_grid[1:] / abar_grid[:-1], 1.0 - 0.999,
                          1.0)
        return jnp.cumprod(alphas)
    betas = jnp.linspace(cfg.ddpm_beta_start, cfg.ddpm_beta_end,
                         t_count, dtype=jnp.float32)
    return jnp.cumprod(1.0 - betas)


def init_params(rng, cfg):
    return ddpm_net.net_init(rng, cfg)


def loss(params, batch, rng, cfg):
    x0 = 2.0 * batch["image"] - 1.0          # [0,1] -> [-1,1]
    t_key, e_key, d_key = jax.random.split(rng, 3)
    b = x0.shape[0]
    t = jax.random.randint(t_key, (b,), 0, cfg.ddpm_timesteps)
    eps = jax.random.normal(e_key, x0.shape, jnp.float32)
    abar = alphas_bar(cfg)[t][:, None]
    xt = jnp.sqrt(abar) * x0 + jnp.sqrt(1.0 - abar) * eps
    y = None
    if cfg.ddpm_cond:
        # classifier-free label dropout: replace the label with the
        # learned null token w.p. ddpm_label_drop, so one net learns
        # both the conditional and the marginal score (Ho & Salimans
        # 2021 §3)
        drop = jax.random.uniform(d_key, (b,)) < cfg.ddpm_label_drop
        y = jnp.where(drop, cfg.num_classes,
                      batch["label"].astype(jnp.int32))
    pred = ddpm_net.net_apply(params, xt, t, cfg, y)
    val = jnp.mean((pred - eps) ** 2)
    return val, {"loss": val}


def _sample_schedule(cfg):
    """Stacked per-step constants for the reverse scan, LAST step first:
    (t [S], abar_t [S], abar_prev [S]) with abar_prev of the final
    (t -> data) step = 1."""
    t_count = cfg.ddpm_timesteps
    s_count = cfg.ddpm_sample_steps or t_count
    # evenly spaced DESCENDING subsequence T-1..0. Built descending so
    # S=1 keeps the T-1 end (the chain starts from pure noise, so the
    # one net eval must be conditioned on the noisiest timestep;
    # linspace(0, T-1, 1) == [0] silently dropped it — round-3 review).
    ts_desc = jnp.round(
        jnp.linspace(float(t_count - 1), 0.0, s_count)).astype(jnp.int32)
    abar = alphas_bar(cfg)
    ab_t = abar[ts_desc]
    # ascending-order predecessor: abar of the NEXT (less noisy) entry,
    # 1.0 for the final (t -> data) step
    ab_prev = jnp.concatenate(
        [ab_t[1:], jnp.ones((1,), jnp.float32)])
    return ts_desc, ab_t, ab_prev


def _sample_with_labels(params, rng, n, cfg, y):
    """Reverse chain; y = None (unconditional / null-token) or [n] int
    labels. With ddpm_guidance > 0 the conditional and null-token
    predictions are computed as ONE 2n-row net call per step (a single
    bigger matmul/conv feeds the MXU better than two small ones) and
    mixed: eps = (1+w) eps_cond - w eps_null (Ho & Salimans 2021 Eq. 6)."""
    ts, ab_t, ab_prev = _sample_schedule(cfg)
    init_key, chain_key = jax.random.split(rng)
    x = jax.random.normal(init_key, (n, cfg.image_dim), jnp.float32)
    eta = jnp.float32(cfg.ddpm_eta)
    w = float(cfg.ddpm_guidance)
    guided = cfg.ddpm_cond and w > 0.0 and y is not None
    if guided:
        y2 = jnp.concatenate(
            [y, jnp.full((n,), cfg.num_classes, jnp.int32)])

    def body(x, step):
        t, ab, abp, i = step
        if guided:
            x2 = jnp.concatenate([x, x])
            e2 = ddpm_net.net_apply(params, x2, jnp.full((2 * n,), t),
                                    cfg, y2)
            eps = (1.0 + w) * e2[:n] - w * e2[n:]
        else:
            eps = ddpm_net.net_apply(params, x, jnp.full((n,), t), cfg, y)
        x0_hat = jnp.clip((x - jnp.sqrt(1.0 - ab) * eps) / jnp.sqrt(ab),
                          -1.0, 1.0)
        sigma = eta * jnp.sqrt((1.0 - abp) / (1.0 - ab)) * jnp.sqrt(
            jnp.maximum(1.0 - ab / abp, 0.0))
        dir_coef = jnp.sqrt(jnp.maximum(1.0 - abp - sigma ** 2, 0.0))
        z = jax.random.normal(jax.random.fold_in(chain_key, i),
                              x.shape, jnp.float32)
        x = jnp.sqrt(abp) * x0_hat + dir_coef * eps + sigma * z
        return x, None

    steps = (ts, ab_t, ab_prev, jnp.arange(ts.shape[0]))
    x, _ = jax.lax.scan(body, x, steps)
    return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)   # [-1,1] -> [0,1]


def sample(params, rng, n, cfg):
    y = None
    if cfg.ddpm_cond:
        # one column per digit in the sample grid (the CGAN convention)
        y = jnp.arange(n) % cfg.num_classes
    return _sample_with_labels(params, rng, n, cfg, y)


def sample_class(params, rng, n, label, cfg):
    """All-one-class conditional sampling (the notebooks' conditional
    grid; mirrors losses/cgan.sample_class)."""
    y = jnp.full((n,), label, jnp.int32)
    return _sample_with_labels(params, rng, n, cfg, y)


DDPM = SingleModelSpec(
    name="ddpm",
    init_params=init_params,
    loss=loss,
    sample=sample,
)
