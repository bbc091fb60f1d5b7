"""DDPM family (losses/ddpm.py, models/ddpm_net.py) — beyond-reference
capability tests: schedule/posterior math pinned to Ho 2020 / Song 2021,
torch-oracle forward+loss parity on the MLP stack, sampler contracts,
and the zero-init head property."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from generative_models_tpu.losses.ddpm import (
    DDPM,
    _sample_schedule,
    alphas_bar,
    loss,
    sample,
)
from generative_models_tpu.models import ddpm_net
from tests.conftest import tiny_cfg


def test_schedule_properties():
    cfg = tiny_cfg("ddpm", ddpm_timesteps=1000)  # full paper schedule
    ab = np.asarray(alphas_bar(cfg))
    assert ab.shape == (1000,)
    assert np.all(np.diff(ab) < 0), "abar must be strictly decreasing"
    assert 0.0 < ab[-1] < ab[0] < 1.0
    # Ho 2020 §4 endpoints: abar_0 = 1 - beta_1
    np.testing.assert_allclose(ab[0], 1.0 - cfg.ddpm_beta_start, rtol=1e-6)


def test_cosine_schedule_properties():
    """Nichol & Dhariwal 2021 §3.2: abar follows f(t)/f(0) with
    f(t) = cos^2((t/T + s)/(1+s) * pi/2), s = 0.008, betas clipped at
    0.999. Pins the formula, the clip, and the monotonicity the sampler
    relies on."""
    t_count = 1000
    cfg = tiny_cfg("ddpm", ddpm_timesteps=t_count,
                   ddpm_schedule="cosine")
    ab = np.asarray(alphas_bar(cfg))
    assert ab.shape == (t_count,)
    assert np.all(np.diff(ab) < 0), "abar must be strictly decreasing"
    assert 0.0 < ab[-1] < ab[0] < 1.0
    # closed form where the beta clip is inactive (everywhere early)
    s = 0.008
    f = lambda u: np.cos((u + s) / (1 + s) * np.pi / 2) ** 2  # noqa: E731
    grid = (np.arange(t_count) + 1.0) / t_count
    np.testing.assert_allclose(ab[:800], f(grid[:800]) / f(0.0),
                               rtol=1e-4)
    # per-step beta never exceeds the 0.999 clip
    alphas = ab / np.concatenate([[1.0], ab[:-1]])
    assert np.all(1.0 - alphas <= 0.999 + 1e-6)
    # cosine degrades abar more slowly early on than Ho's linear
    # schedule at the same T (the paper's Fig. 5 point)
    ab_lin = np.asarray(alphas_bar(tiny_cfg("ddpm",
                                            ddpm_timesteps=t_count)))
    mid = t_count // 2
    assert ab[mid] > ab_lin[mid]


def test_full_sequence_eta1_matches_ddpm_posterior_variance():
    """On the FULL subsequence with eta=1, the DDIM sigma_t^2 must equal
    the ancestral DDPM posterior variance beta_t (1-abar_{t-1})/(1-abar_t)
    (Song 2021 §4.1 — the eta=1 special case IS DDPM)."""
    cfg = tiny_cfg("ddpm", ddpm_timesteps=50, ddpm_sample_steps=0)
    betas = np.linspace(cfg.ddpm_beta_start, cfg.ddpm_beta_end, 50)
    ab = np.asarray(alphas_bar(cfg))
    ts, ab_t, ab_prev = map(np.asarray, _sample_schedule(cfg))
    assert list(ts) == list(range(49, -1, -1))  # full chain, reversed
    sigma_sq = (1 - ab_prev) / (1 - ab_t) * (1 - ab_t / ab_prev)
    # direct form: for t>0 posterior var = beta_t (1-abar_{t-1})/(1-abar_t)
    post = np.array([betas[t] * ((1 - ab[t - 1]) if t > 0 else 0.0)
                     / (1 - ab[t]) for t in ts])
    np.testing.assert_allclose(sigma_sq, post, rtol=1e-5, atol=1e-8)


def test_strided_schedule_endpoints():
    cfg = tiny_cfg("ddpm", ddpm_timesteps=100, ddpm_sample_steps=10)
    ts, ab_t, ab_prev = map(np.asarray, _sample_schedule(cfg))
    assert ts.shape == (10,)
    assert ts[0] == 99 and ts[-1] == 0      # hits both chain ends
    assert ab_prev[-1] == 1.0               # final step maps to data


def test_one_step_schedule_uses_noisiest_timestep():
    """S=1: the single net eval denoises FROM pure noise, so it must be
    conditioned on t = T-1 (the ascending-linspace form silently used
    t=0 — round-3 review finding)."""
    cfg = tiny_cfg("ddpm", ddpm_timesteps=100, ddpm_sample_steps=1)
    ts, ab_t, ab_prev = map(np.asarray, _sample_schedule(cfg))
    assert list(ts) == [99]
    assert ab_prev[0] == 1.0
    # and the sampler runs end-to-end on it
    params = DDPM.init_params(jax.random.PRNGKey(0), cfg)
    s = np.asarray(sample(params, jax.random.PRNGKey(1), 4, cfg))
    assert s.shape == (4, cfg.image_dim) and np.isfinite(s).all()


def test_zero_init_head_gives_unit_loss(tiny_data):
    """Untrained net predicts eps = 0 (zero-init output layer), so the
    simple loss is E||eps||^2 -> 1 over a large batch. Pins the init
    convention the module docstring promises."""
    for arch, kw in (("mlp", {}), ("conv", {"conv_channels": 8})):
        cfg = tiny_cfg("ddpm", arch=arch, **kw)
        params = DDPM.init_params(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(
            tiny_data["x_train"][:256].reshape(256, -1) / 255.0,
            jnp.float32)
        val, metrics = loss(params, {"image": x}, jax.random.PRNGKey(1),
                            cfg)
        assert abs(float(val) - 1.0) < 0.15, (arch, float(val))


def _torch_linear(p):
    lin = torch.nn.Linear(p["w"].shape[0], p["w"].shape[1])
    lin.weight.data = torch.tensor(np.asarray(p["w"]).T)
    lin.bias.data = torch.tensor(np.asarray(p["b"]))
    return lin


def test_torch_oracle_mlp_forward_and_loss():
    """Same weights both sides: the time-conditioned MLP forward and the
    simple-loss value agree with an independent torch replica."""
    cfg = tiny_cfg("ddpm")
    params = ddpm_net.net_init(jax.random.PRNGKey(3), cfg)
    # the skip and out layers are zero-init; randomize them so the
    # parity check actually exercises both terms of the output sum
    from generative_models_tpu.models.mlp import linear_init
    params["skip"] = linear_init(jax.random.PRNGKey(4), cfg.image_dim,
                                 cfg.image_dim)
    params["out"] = linear_init(jax.random.PRNGKey(5), cfg.hidden_dim,
                                cfg.image_dim)
    b, td = 8, cfg.ddpm_time_dim
    x = np.random.RandomState(0).randn(b, cfg.image_dim).astype(np.float32)
    t = np.arange(b, dtype=np.int32) * 5

    out_jax = np.asarray(ddpm_net.net_apply(
        params, jnp.asarray(x), jnp.asarray(t), cfg))

    # torch replica (independent re-derivation of the module docstring)
    half = td // 2
    freqs = np.exp(-np.log(1e4) * np.arange(half) / max(half - 1, 1))
    emb = np.concatenate([np.sin(t[:, None] * freqs),
                          np.cos(t[:, None] * freqs)], -1).astype(np.float32)
    temb = torch.tensor(emb)
    t0 = _torch_linear(params["time"]["l"][0])
    t1 = _torch_linear(params["time"]["l"][1])
    silu = torch.nn.SiLU()
    temb = t1(silu(t0(temb)))
    lin_in = _torch_linear(params["in"])
    lin_t1 = _torch_linear(params["t1"])
    lin_mid = _torch_linear(params["mid"])
    lin_t2 = _torch_linear(params["t2"])
    lin_out = _torch_linear(params["out"])
    lin_skip = _torch_linear(params["skip"])
    xt = torch.tensor(x)
    h = silu(lin_in(xt) + lin_t1(temb))
    h = silu(lin_mid(h) + lin_t2(temb))
    out_torch = (lin_out(h) + lin_skip(xt)).detach().numpy()
    np.testing.assert_allclose(out_jax, out_torch, rtol=2e-5, atol=2e-5)

    # loss parity on the same (t, eps) draw
    rng = jax.random.PRNGKey(7)
    img = jnp.asarray((x - x.min()) / (x.max() - x.min()), jnp.float32)
    val_jax, _ = loss(params, {"image": img}, rng, cfg)
    tk, ek = jax.random.split(rng)
    t_draw = np.asarray(jax.random.randint(tk, (b,), 0, cfg.ddpm_timesteps))
    eps = np.asarray(jax.random.normal(ek, (b, cfg.image_dim)))
    ab = np.asarray(alphas_bar(cfg))[t_draw][:, None]
    x0 = 2 * np.asarray(img) - 1
    xt_np = np.sqrt(ab) * x0 + np.sqrt(1 - ab) * eps
    emb2 = np.concatenate(
        [np.sin(t_draw[:, None] * freqs), np.cos(t_draw[:, None] * freqs)],
        -1).astype(np.float32)
    temb2 = t1(silu(t0(torch.tensor(emb2))))
    xt_t = torch.tensor(xt_np.astype(np.float32))
    h2 = silu(lin_in(xt_t) + lin_t1(temb2))
    h2 = silu(lin_mid(h2) + lin_t2(temb2))
    pred = lin_out(h2) + lin_skip(xt_t)
    val_torch = torch.mean((pred - torch.tensor(
        eps.astype(np.float32))) ** 2).item()
    np.testing.assert_allclose(float(val_jax), val_torch, rtol=1e-5)


def test_sampler_contracts():
    cfg = tiny_cfg("ddpm")
    params = DDPM.init_params(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(11)
    a = np.asarray(sample(params, rng, 6, cfg))
    b = np.asarray(sample(params, rng, 6, cfg))
    assert a.shape == (6, cfg.image_dim)
    assert a.min() >= 0.0 and a.max() <= 1.0
    np.testing.assert_array_equal(a, b)  # same key -> same chain
    c = np.asarray(sample(params, jax.random.PRNGKey(12), 6, cfg))
    assert np.abs(a - c).max() > 0       # fresh key -> fresh samples

    # eta=0 (DDIM) runs, and strided vs full chains both produce valid
    # images on the same params
    cfg0 = tiny_cfg("ddpm", ddpm_eta=0.0, ddpm_sample_steps=5)
    d = np.asarray(sample(params, rng, 4, cfg0))
    assert d.shape == (4, cfg.image_dim) and np.isfinite(d).all()
    cfg_full = tiny_cfg("ddpm", ddpm_sample_steps=0)
    e = np.asarray(sample(params, rng, 4, cfg_full))
    assert np.isfinite(e).all()


def test_trains_and_improves(tiny_data):
    """The denoiser learns: loss drops well below the eps=0 baseline of
    1.0. Test-scaled schedule: T=50 needs beta_end ~0.3 so abar_T ~ 0
    (the paper's 0.02 is calibrated to T=1000 — at T=50 the chain never
    nears pure noise and eps is mostly unidentifiable); lr 2e-3 because
    Adam's per-coordinate step is lr and the input->output skip's
    diagonal must travel O(1)."""
    from generative_models_tpu.train.trainer import Trainer
    cfg = tiny_cfg("ddpm", batch_size=64, ddpm_beta_end=0.3, g_lr=2e-3)
    t = Trainer(config=cfg, data=tiny_data)
    hist = t.train(steps=160)
    assert np.mean(hist["loss"][:4]) > 0.9
    assert np.mean(hist["loss"][-8:]) < 0.8, np.mean(hist["loss"][-8:])
    # EMA is the variant default and rides the TrainState
    assert "ema" in t.state
    imgs = t.sample(4)
    assert imgs.shape == (4, 784) and np.isfinite(imgs).all()


def test_config_validation():
    with pytest.raises(ValueError, match="ddpm_sample_steps"):
        tiny_cfg("ddpm", ddpm_sample_steps=51, ddpm_timesteps=50)
    with pytest.raises(ValueError, match="ddpm_eta"):
        tiny_cfg("ddpm", ddpm_eta=1.5)
    with pytest.raises(ValueError, match="ddpm_guidance"):
        tiny_cfg("ddpm", ddpm_guidance=1.0)  # requires ddpm_cond
    with pytest.raises(ValueError, match="ddpm_label_drop"):
        tiny_cfg("ddpm", ddpm_cond=True, ddpm_label_drop=1.5)


@pytest.mark.parametrize("schedule", ["linear", "cosine"])
def test_reverse_chain_analytic_gaussian(schedule):
    """End-to-end validation of the reverse chain against the one case
    with a CLOSED-FORM optimal predictor: for x0 ~ N(0, s^2 I),
    eps*(x_t, t) = sqrt(1-abar_t) x_t / (abar_t s^2 + 1-abar_t).
    Running the sampler with eps* must reproduce ~N(0, s^2). Derivation
    note: the eta=1 mean form is EXACT here (it equals the true
    Gaussian posterior mean — checked symbolically), while the fixed
    sigma_t^2 = beta_t (1-abar_{t-1})/(1-abar_t) slightly UNDERSTATES
    the true conditional variance for s < 1, so a few percent of std
    shrink is the algorithm's known property, not a bug. Parametrized
    over both noise schedules: the validation is schedule-independent
    (the optimal predictor is a function of abar alone), so it pins the
    cosine path end-to-end as well."""
    from unittest import mock

    from generative_models_tpu.losses import ddpm as ddpm_mod

    s = 0.25
    cfg = tiny_cfg("ddpm", ddpm_timesteps=200, ddpm_sample_steps=0,
                   ddpm_beta_end=0.1, ddpm_schedule=schedule)
    ab = alphas_bar(cfg)
    assert float(ab[-1]) < 1e-4  # the chain reaches ~pure noise

    def analytic_net(params, x, t, cfg_, y=None):
        a = ab[t[0]]
        return jnp.sqrt(1.0 - a) * x / (a * s ** 2 + 1.0 - a)

    with mock.patch.object(ddpm_mod.ddpm_net, "net_apply", analytic_net):
        out = ddpm_mod.sample(None, jax.random.PRNGKey(0), 4096, cfg)
    x = 2.0 * np.asarray(out) - 1.0
    assert abs(x.mean()) < 0.01
    assert 0.9 * s < x.std() < 1.03 * s, x.std()


# ------------------------------------------------------------------
# Conditional DDPM + classifier-free guidance (Ho & Salimans 2021)
# ------------------------------------------------------------------

def test_cond_full_dropout_ignores_labels(tiny_data):
    """With ddpm_label_drop=1.0 every label is replaced by the null
    token, so the loss must be IDENTICAL for any label assignment under
    the same rng — pins the dropout path."""
    cfg = tiny_cfg("ddpm", ddpm_cond=True, ddpm_label_drop=1.0)
    params = DDPM.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(
        tiny_data["x_train"][:32].reshape(32, -1) / 255.0, jnp.float32)
    rng = jax.random.PRNGKey(2)
    v1, _ = loss(params, {"image": x, "label": jnp.zeros(32, jnp.int32)},
                 rng, cfg)
    v2, _ = loss(params, {"image": x, "label": jnp.ones(32, jnp.int32) * 7},
                 rng, cfg)
    assert float(v1) == float(v2)


def test_cond_labels_change_loss(tiny_data):
    """With dropout off and a nonzero label table, different labels
    give different predictions (the conditioning is wired through)."""
    cfg = tiny_cfg("ddpm", ddpm_cond=True, ddpm_label_drop=0.0)
    params = DDPM.init_params(jax.random.PRNGKey(0), cfg)
    # randomize the zero-init OUT head so the label-conditioned trunk
    # actually reaches the output
    from generative_models_tpu.models.mlp import linear_init
    params["out"] = linear_init(jax.random.PRNGKey(4), cfg.hidden_dim,
                                cfg.image_dim)
    x = jnp.asarray(
        tiny_data["x_train"][:32].reshape(32, -1) / 255.0, jnp.float32)
    rng = jax.random.PRNGKey(2)
    v1, _ = loss(params, {"image": x, "label": jnp.zeros(32, jnp.int32)},
                 rng, cfg)
    v2, _ = loss(params, {"image": x, "label": jnp.ones(32, jnp.int32) * 7},
                 rng, cfg)
    assert float(v1) != float(v2)


def test_cond_trains_and_guided_sampling(tiny_data):
    from generative_models_tpu.losses.ddpm import sample_class
    from generative_models_tpu.train.trainer import Trainer
    cfg = tiny_cfg("ddpm", batch_size=64, ddpm_cond=True,
                   ddpm_beta_end=0.3, g_lr=2e-3)
    t = Trainer(config=cfg, data=tiny_data)
    hist = t.train(steps=40)
    assert np.all(np.isfinite(hist["loss"]))

    # guided sampling: w=0 vs w>0 differ; both valid images
    p = t.state["ema"]
    rng = jax.random.PRNGKey(5)
    a = np.asarray(_sample_with_guidance(p, rng, 8, cfg, 0.0))
    b = np.asarray(_sample_with_guidance(p, rng, 8, cfg, 2.0))
    for s in (a, b):
        assert s.shape == (8, 784)
        assert s.min() >= 0.0 and s.max() <= 1.0 and np.isfinite(s).all()
    assert np.abs(a - b).max() > 0
    # class-conditional grid helper
    c = np.asarray(sample_class(p, rng, 4, 3, cfg.replace(
        ddpm_guidance=1.0)))
    assert c.shape == (4, 784) and np.isfinite(c).all()


def _sample_with_guidance(params, rng, n, cfg, w):
    return sample(params, rng, n, cfg.replace(ddpm_guidance=w))
