"""Flow matching / rectified flow (Lipman et al. 2023 "Flow Matching
for Generative Modeling"; Liu, Gong & Liu 2022 "Flow Straight and Fast:
Learning to Generate and Transfer Data with Rectified Flow").

A 16th variant BEYOND the reference zoo (the reference implements VAEs
and GANs only — SURVEY.md §3.2; mount empty, math paper-pinned), and
the second member of the diffusion-adjacent family: where DDPM learns
to reverse a fixed stochastic noising chain, flow matching regresses
the VELOCITY of a deterministic straight-line bridge between noise and
data, and generation integrates an ODE — no per-step noise injection,
so small step counts work far better than ancestral sampling
(the TPU serving angle: S net evals per image is the whole cost).

Training (rectified-flow / conditional-FM objective; Liu 2022 Eq. 1,
Lipman 2023 Eq. 23 with the linear-interpolant path):

    t  ~ U[0, 1),  x0 ~ N(0, I),  x1 = data in [-1, 1]
    x_t = (1 - t) x0 + t x1
    L   = E || v_theta(x_t, t) - (x1 - x0) ||^2

(x1 - x0 is the constant velocity of the straight path; the marginal
vector field this regresses onto transports N(0, I) at t=0 to the data
at t=1.) Single model, single optimizer — it rides the same
`SingleModelSpec` slot as the VAE/DDPM families, so the Trainer, data
path, DP, checkpointing, export, viz, and quality scoring all apply
unchanged, and it reuses the DDPM family's time-conditioned nets
(models/ddpm_net.py) verbatim: a velocity net and an eps net are the
same shape class. Continuous t in [0, 1] is fed to the sinusoidal
embedding scaled by T_EMB_SCALE so it spans the same frequency range
integer DDPM timesteps do.

Sampling: integrate dx/dt = v_theta(x, t) from t=0 (noise) to t=1
(data) over `flow_sample_steps` uniform steps as ONE `jax.lax.scan` —
solver per `flow_solver`:

    "euler":  x <- x + dt v(x, t)                       (Liu 2022)
    "heun":   predictor-corrector midpoint average       (2 evals/step)

Conditioning + classifier-free guidance REUSE the DDPM config fields
(`ddpm_cond`, `ddpm_label_drop`, `ddpm_guidance`) because the
mechanism is identical at the net level (learned null token; guided
extrapolation v = (1+w) v_cond - w v_null evaluated as ONE 2n-row net
call per step) — one knob set, two families, documented here and in
config.py.

EMA: `ema_decay=0.999` variant default (as for DDPM; flow-matching
practice samples from EMA weights too).

Reflow / 2-rectified flow (Liu 2022 §3.2): with `cfg.flow_reflow` the
SAME objective trains on teacher couplings [x1_hat | x0] read from the
batch (rows of width 2*image_dim, built by `generate_pairs` /
train/reflow.py) instead of independent (noise, data) pairs —
straightening the ODE so 1-2 step sampling works (the TPU serving
capstone; measured in benchmarks/reflow_ablation.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.losses.base import SingleModelSpec
from generative_models_tpu.models import ddpm_net

# Continuous t in [0,1] -> the embedding's useful frequency range (the
# same span integer DDPM timesteps 0..999 cover). A constant, not a
# config knob: it only reparameterizes the embedding input.
T_EMB_SCALE = 1000.0


def init_params(rng, cfg):
    return ddpm_net.net_init(rng, cfg)


def loss(params, batch, rng, cfg):
    # the rng split layout is shared by both branches (and replicated
    # by tests/oracles): (t draw, x0 draw, label-drop)
    t_key, x0_key, d_key = jax.random.split(rng, 3)
    if cfg.flow_reflow:
        # 2-rectified flow (Liu 2022 §3.2): the batch rows are TEACHER
        # couplings [x1_hat in [0,1] | x0 raw], width 2*image_dim
        # (train/reflow.py) — same objective, but the bridge endpoints
        # are paired by the teacher's own ODE instead of independent.
        d = cfg.image_dim
        x1 = 2.0 * batch["image"][:, :d] - 1.0
        x0 = batch["image"][:, d:]
    else:
        x1 = 2.0 * batch["image"] - 1.0      # [0,1] -> [-1,1]
        x0 = jax.random.normal(x0_key, x1.shape, jnp.float32)
    b = x1.shape[0]
    t = jax.random.uniform(t_key, (b,))
    xt = (1.0 - t)[:, None] * x0 + t[:, None] * x1
    target = x1 - x0
    y = None
    if cfg.ddpm_cond:
        # classifier-free label dropout, exactly as losses/ddpm.py
        drop = jax.random.uniform(d_key, (b,)) < cfg.ddpm_label_drop
        y = jnp.where(drop, cfg.num_classes,
                      batch["label"].astype(jnp.int32))
    pred = ddpm_net.net_apply(params, xt, t * T_EMB_SCALE, cfg, y)
    val = jnp.mean((pred - target) ** 2)
    return val, {"loss": val}


def _velocity(params, x, t_scalar, n, cfg, y, y2):
    """v_theta at one scan step; the guided pair rides ONE 2n-row call
    (the DDPM sampler's MXU-friendly form)."""
    w = float(cfg.ddpm_guidance)
    if y2 is not None:
        x2 = jnp.concatenate([x, x])
        v2 = ddpm_net.net_apply(
            params, x2, jnp.full((2 * n,), t_scalar * T_EMB_SCALE),
            cfg, y2)
        return (1.0 + w) * v2[:n] - w * v2[n:]
    return ddpm_net.net_apply(
        params, x, jnp.full((n,), t_scalar * T_EMB_SCALE), cfg, y)


def _integrate(params, x0, cfg, y=None, y2=None):
    """ODE endpoint: integrate dx/dt = v_theta from the given x0 at
    t=0 to t=1 over flow_sample_steps uniform steps (one lax.scan;
    solver per cfg.flow_solver). Returns x(1) in model scale [-1,1]."""
    n = x0.shape[0]
    s_count = cfg.flow_sample_steps
    dt = 1.0 / s_count
    ts = jnp.arange(s_count, dtype=jnp.float32) * dt

    def body(x, t):
        v1 = _velocity(params, x, t, n, cfg, y, y2)
        if cfg.flow_solver == "heun":
            xe = x + dt * v1
            v2 = _velocity(params, xe, t + dt, n, cfg, y, y2)
            x = x + dt * 0.5 * (v1 + v2)
        else:
            x = x + dt * v1
        return x, None

    x, _ = jax.lax.scan(body, x0, ts)
    return x


def _sample_with_labels(params, rng, n, cfg, y):
    x0 = jax.random.normal(rng, (n, cfg.image_dim), jnp.float32)
    y2 = None
    if cfg.ddpm_cond and cfg.ddpm_guidance > 0.0 and y is not None:
        y2 = jnp.concatenate(
            [y, jnp.full((n,), cfg.num_classes, jnp.int32)])
    x = _integrate(params, x0, cfg, y, y2)
    return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)   # [-1,1] -> [0,1]


def sample(params, rng, n, cfg):
    y = None
    if cfg.ddpm_cond:
        # one column per digit in the sample grid (the CGAN convention)
        y = jnp.arange(n) % cfg.num_classes
    return _sample_with_labels(params, rng, n, cfg, y)


def sample_class(params, rng, n, label, cfg):
    """All-one-class conditional sampling (mirrors losses/ddpm.py)."""
    y = jnp.full((n,), label, jnp.int32)
    return _sample_with_labels(params, rng, n, cfg, y)


def generate_pairs(params, rng, n, cfg, batch_size=2048):
    """Teacher couplings for reflow (Liu 2022 §3.2): draw x0 from the
    prior, integrate the teacher's ODE to x1_hat, and return rows
    [x1_hat in [0,1] | x0 raw] of width 2*image_dim — the dataset
    format Config.flow_reflow's loss branch consumes. Unconditional
    (the reflow coupling is a map of the prior, not of labels).

    Host loop over fixed-width chunks so one compiled integrate serves
    any n; `jnp.clip` matches sample()'s output encoding, so a stored
    x1_hat is exactly what the teacher would have served."""
    d = cfg.image_dim
    bs = min(batch_size, n)

    @jax.jit
    def one(key):
        x0 = jax.random.normal(key, (bs, d), jnp.float32)
        x1 = _integrate(params, x0, cfg)
        return jnp.clip((x1 + 1.0) * 0.5, 0.0, 1.0), x0

    chunks = []
    key = rng
    for _ in range((n + bs - 1) // bs):
        key, sub = jax.random.split(key)
        x1, x0 = one(sub)
        chunks.append(jnp.concatenate([x1, x0], axis=1))
    return jnp.concatenate(chunks, axis=0)[:n]


FLOW = SingleModelSpec(
    name="flow",
    init_params=init_params,
    loss=loss,
    sample=sample,
)
