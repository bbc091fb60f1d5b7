"""Flow-matching family (losses/flow.py) — beyond-reference capability
tests: the rectified-flow objective pinned to Liu 2022 / Lipman 2023,
torch-oracle loss parity on the shared ddpm_net MLP stack, ODE sampler
contracts + solver-order property, and an analytic-Gaussian
end-to-end validation with a closed-form optimal velocity field."""

from unittest import mock

import numpy as np
import torch

import jax
import jax.numpy as jnp

from generative_models_tpu.losses.flow import (
    FLOW,
    T_EMB_SCALE,
    loss,
    sample,
    sample_class,
)
from generative_models_tpu.models import ddpm_net
from tests.conftest import tiny_cfg


def test_zero_init_loss_is_bridge_energy(tiny_data):
    """The shared net's output + skip layers are zero-init, so the
    untrained prediction is exactly 0 and the loss equals the bridge's
    own energy E||x1 - x0||^2 on the replicated internal draws — pins
    both the init convention and the loss's rng-split layout."""
    for arch, kw in (("mlp", {}), ("conv", {"conv_channels": 8})):
        cfg = tiny_cfg("flow", arch=arch, **kw)
        params = FLOW.init_params(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(
            tiny_data["x_train"][:256].reshape(256, -1) / 255.0,
            jnp.float32)
        rng = jax.random.PRNGKey(1)
        val, metrics = loss(params, {"image": x}, rng, cfg)
        # replicate the loss's internal draws (t_key, x0_key, d_key)
        t_key, x0_key, _ = jax.random.split(rng, 3)
        t = jax.random.uniform(t_key, (256,))
        x0 = jax.random.normal(x0_key, x.shape, jnp.float32)
        x1 = 2.0 * x - 1.0
        expected = float(jnp.mean((x1 - x0) ** 2))
        np.testing.assert_allclose(float(val), expected, rtol=1e-6,
                                   err_msg=arch)
        assert "loss" in metrics
        del t  # the zero net's prediction is t-independent


def _torch_linear(p):
    lin = torch.nn.Linear(p["w"].shape[0], p["w"].shape[1])
    lin.weight.data = torch.tensor(np.asarray(p["w"]).T)
    lin.bias.data = torch.tensor(np.asarray(p["b"]))
    return lin


def test_torch_oracle_loss_parity():
    """Same weights + same (t, x0) draw both sides: the flow-matching
    loss value agrees with an independent torch replica. (Forward
    parity of the shared net is pinned by test_ddpm's oracle; this
    covers the flow-specific bridge, target, and t-scaling.)"""
    cfg = tiny_cfg("flow")
    params = ddpm_net.net_init(jax.random.PRNGKey(3), cfg)
    from generative_models_tpu.models.mlp import linear_init
    # randomize the zero-init layers so both output terms are exercised
    params["skip"] = linear_init(jax.random.PRNGKey(4), cfg.image_dim,
                                 cfg.image_dim)
    params["out"] = linear_init(jax.random.PRNGKey(5), cfg.hidden_dim,
                                cfg.image_dim)
    b, td = 8, cfg.ddpm_time_dim
    img = jnp.asarray(np.random.RandomState(0).rand(b, cfg.image_dim),
                      jnp.float32)
    rng = jax.random.PRNGKey(7)
    val_jax, _ = loss(params, {"image": img}, rng, cfg)

    # replicate the draws, then re-derive the math in torch
    t_key, x0_key, _ = jax.random.split(rng, 3)
    t = np.asarray(jax.random.uniform(t_key, (b,)))
    x0 = np.asarray(jax.random.normal(x0_key, (b, cfg.image_dim)))
    x1 = 2.0 * np.asarray(img) - 1.0
    xt = (1.0 - t)[:, None] * x0 + t[:, None] * x1

    half = td // 2
    freqs = np.exp(-np.log(1e4) * np.arange(half) / max(half - 1, 1))
    args = (t * T_EMB_SCALE)[:, None] * freqs[None, :]
    emb = np.concatenate([np.sin(args), np.cos(args)],
                         -1).astype(np.float32)
    silu = torch.nn.SiLU()
    t0 = _torch_linear(params["time"]["l"][0])
    t1 = _torch_linear(params["time"]["l"][1])
    temb = t1(silu(t0(torch.tensor(emb))))
    xt_t = torch.tensor(xt.astype(np.float32))
    h = silu(_torch_linear(params["in"])(xt_t)
             + _torch_linear(params["t1"])(temb))
    h = silu(_torch_linear(params["mid"])(h)
             + _torch_linear(params["t2"])(temb))
    pred = _torch_linear(params["out"])(h) + _torch_linear(
        params["skip"])(xt_t)
    target = torch.tensor((x1 - x0).astype(np.float32))
    val_torch = torch.mean((pred - target) ** 2).item()
    np.testing.assert_allclose(float(val_jax), val_torch, rtol=2e-5)


def test_sampler_contracts():
    cfg = tiny_cfg("flow")
    params = FLOW.init_params(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(11)
    a = np.asarray(sample(params, rng, 6, cfg))
    b = np.asarray(sample(params, rng, 6, cfg))
    assert a.shape == (6, cfg.image_dim)
    assert a.min() >= 0.0 and a.max() <= 1.0
    np.testing.assert_array_equal(a, b)  # same key -> same ODE path
    c = np.asarray(sample(params, jax.random.PRNGKey(12), 6, cfg))
    assert np.abs(a - c).max() > 0       # fresh key -> fresh noise

    # heun solver runs and is finite; one-step euler runs
    d = np.asarray(sample(params, rng, 4,
                          tiny_cfg("flow", flow_solver="heun")))
    assert d.shape == (4, cfg.image_dim) and np.isfinite(d).all()
    e = np.asarray(sample(params, rng, 4,
                          tiny_cfg("flow", flow_sample_steps=1)))
    assert np.isfinite(e).all()


def test_config_validation():
    import pytest

    with pytest.raises(ValueError, match="flow_sample_steps"):
        tiny_cfg("flow", flow_sample_steps=0)
    with pytest.raises(ValueError, match="flow_solver"):
        tiny_cfg("flow", flow_solver="rk4")
    # shared guidance knob still validates for the flow family
    with pytest.raises(ValueError, match="ddpm_guidance"):
        tiny_cfg("flow", ddpm_guidance=1.0)  # without ddpm_cond


def test_ode_analytic_gaussian():
    """End-to-end validation against the one case with a CLOSED-FORM
    optimal velocity field: for data x1 ~ N(0, s^2 I) and noise
    x0 ~ N(0, I), X_t = (1-t) X0 + t X1 has Var = (1-t)^2 + t^2 s^2 and

        v*(x, t) = E[X1 - X0 | X_t = x]
                 = (t s^2 - (1 - t)) / ((1-t)^2 + t^2 s^2) * x.

    The probability-flow ODE with this field transports N(0, I)
    exactly to N(0, s^2): d(sigma^2)/dt = 2 a(t) sigma^2 holds for
    sigma^2(t) = (1-t)^2 + t^2 s^2. Mock the net with v* and check the
    integrated samples have the target std — and that heun converges
    faster than euler at the same step count (2nd vs 1st order)."""
    s = 0.25
    n = 4096

    def v_star(params, x, t_emb, cfg, y=None):
        t = t_emb[0] / T_EMB_SCALE   # undo the embedding scaling
        var = (1.0 - t) ** 2 + (t * s) ** 2
        return (t * s * s - (1.0 - t)) / var * x

    def run(solver, steps):
        cfg = tiny_cfg("flow", flow_solver=solver,
                       flow_sample_steps=steps)
        from generative_models_tpu.losses import flow as flow_mod
        with mock.patch.object(flow_mod.ddpm_net, "net_apply", v_star):
            # public path; samples land in [0,1] via (x+1)/2, undone
            # below for the std check
            out = flow_mod.sample({}, jax.random.PRNGKey(0), n, cfg)
        x = 2.0 * np.asarray(out) - 1.0
        return x

    x_euler = run("euler", 16)
    x_heun = run("heun", 16)
    # s = 0.25 keeps essentially all mass inside the clip range
    err_e = abs(float(x_euler.std()) - s)
    err_h = abs(float(x_heun.std()) - s)
    assert err_e < 0.05 * s + 0.02, err_e
    assert err_h < err_e, (err_h, err_e)     # 2nd order beats 1st
    assert abs(float(x_heun.mean())) < 0.01


def test_trains_and_improves(tiny_data):
    """The velocity net learns: loss drops well below the v=0 baseline
    E||x1 - x0||^2 (~1 + E[x1^2])."""
    from generative_models_tpu.train.trainer import Trainer

    cfg = tiny_cfg("flow", batch_size=64, scan_steps=25, g_lr=2e-3)
    t = Trainer(config=cfg, data=tiny_data)
    hist = t.train(steps=300, sample_every=-1)
    first = float(np.mean(hist["loss"][:4]))
    last = float(np.mean(hist["loss"][-8:]))
    assert last < 0.75 * first, (first, last)
    # EMA is the variant default and rides the TrainState
    assert "ema" in t.state
    imgs = t.sample(4)
    assert imgs.shape == (4, 784) and np.isfinite(imgs).all()


def test_cond_guided_wiring(tiny_data):
    """Conditional training runs; w=0 sampling equals the unguided
    conditional path bit-for-bit (the guided branch only engages at
    w > 0); guided sampling is finite and label-sensitive."""
    from generative_models_tpu.train.trainer import Trainer

    from generative_models_tpu.config import FLOW_GUIDANCE_DEFAULT

    cfg = tiny_cfg("flow", ddpm_cond=True, scan_steps=5)
    # conditional flow defaults to the MEASURED guidance winner
    # (config.variant_config, benchmarks/flow_guidance.json)
    assert cfg.ddpm_guidance == FLOW_GUIDANCE_DEFAULT
    t = Trainer(config=cfg, data=tiny_data)
    t.train(steps=10, sample_every=-1)
    params = t.state["ema"]
    rng = jax.random.PRNGKey(3)
    cfg0 = cfg.replace(ddpm_guidance=0.0)
    a = np.asarray(sample(params, rng, 8, cfg0))
    b = np.asarray(sample(params, rng, 8,
                          tiny_cfg("flow", ddpm_cond=True, scan_steps=5,
                                   ddpm_guidance=0.0)))
    np.testing.assert_array_equal(a, b)  # explicit w=0 pin == w=0
    g = np.asarray(sample(params, rng, 8, cfg.replace(ddpm_guidance=2.0)))
    assert np.isfinite(g).all()
    assert np.abs(g - a).max() > 0
    # the default-guided sampler engages the guided branch
    d = np.asarray(sample(params, rng, 8, cfg))
    assert np.abs(d - a).max() > 0
    # sample_class conditions every row on one label
    c0 = np.asarray(sample_class(params, rng, 8, 0, cfg))
    c1 = np.asarray(sample_class(params, rng, 8, 1, cfg))
    assert np.abs(c0 - c1).max() > 0


def test_spec_registered():
    from generative_models_tpu.losses.registry import get_variant

    spec = get_variant("flow")
    assert spec is FLOW and not spec.adversarial
