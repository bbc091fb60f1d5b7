"""50-step same-seed trajectory parity for the REST of the zoo
(VERDICT r1 next #3: extend the pins from 5 variants to all 14, plus
one conv trajectory to pin the conv stack's update order).

Combined with tests/test_trajectory_parity.py (NSGAN) and
tests/test_trajectory_parity_more.py (WGAN-GP, BEGAN, FisherGAN, VAE),
every variant in the registry now has its loss curve asserted
step-for-step against a PyTorch-eager replica written from the paper
formulas (SURVEY.md §3.2 — not ported reference code; the mount is
empty). Each test runs the variant's REGISTRY config (tuned β1=0.5
etc.) and configures the torch replica from the same cfg, so the pins
cover the defaults users actually run.

Noise discipline: variants whose step consumes one noise draw per loss
call get a counter-patched `compute_noise` (even call = D draw, odd =
G draw) like the BEGAN pin; WGAN (5-critic scan) and BIR-VAE (rng
threaded through the step) replay the framework's real PRNG chain
host-side instead, because a patched fn would be baked as a trace-time
constant across scan iterations.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

# 50-step torch-oracle trajectories: minutes each (VERDICT r2 #5)
pytestmark = pytest.mark.slow
import torch.nn.functional as F

from generative_models_tpu.config import variant_config
from generative_models_tpu.losses import dragan as dragan_mod
from generative_models_tpu.losses import fgan as fgan_mod
from generative_models_tpu.losses import infogan as infogan_mod
from generative_models_tpu.losses import lsgan as lsgan_mod
from generative_models_tpu.losses import minimax as minimax_mod
from generative_models_tpu.losses import ragan as ragan_mod
from generative_models_tpu.losses import cgan as cgan_mod
from generative_models_tpu.losses.registry import get_variant
from generative_models_tpu.train import step as step_lib
from generative_models_tpu.train.optim import make_tx

B, ZD, H, XD, LD, STEPS = 32, 16, 48, 784, 8, 50


def _np_linear(rng, i, o):
    b = 1 / np.sqrt(i)
    return (rng.uniform(-b, b, size=(i, o)).astype(np.float32),
            rng.uniform(-b, b, size=(o,)).astype(np.float32))


def _copy_into(torch_linears, np_ws):
    with torch.no_grad():
        for m, (w, b) in zip(torch_linears, np_ws):
            m.weight.copy_(torch.from_numpy(w.T))
            m.bias.copy_(torch.from_numpy(b))


def _jx_params(np_ws):
    return [{"w": jnp.asarray(w), "b": jnp.asarray(b)} for w, b in np_ws]


def _state_with(spec, cfg, g_params, d_params):
    state = step_lib.init_state(spec, cfg, jax.random.PRNGKey(0))
    state["g_params"] = g_params
    state["d_params"] = d_params
    state["g_opt"] = make_tx(cfg, cfg.g_lr).init(state["g_params"])
    state["d_opt"] = make_tx(cfg, cfg.d_lr).init(state["d_params"])
    return state


def _assert_curves(j, t, rtol=3e-3, atol=3e-4, head_rtol=2e-5):
    np.testing.assert_allclose(j, t, rtol=rtol, atol=atol)
    np.testing.assert_allclose(j[:5], t[:5], rtol=head_rtol, atol=1e-5)


def _adam_like(cfg, params, lr):
    return torch.optim.Adam(params, lr=lr, betas=(cfg.adam_b1, cfg.adam_b2),
                            eps=cfg.adam_eps)


def _counter_noise(zs_d, zs_g):
    c = {"n": 0}

    def fixed_noise(rng_, n, z_dim):
        i = c["n"]
        c["n"] += 1
        return jnp.asarray(zs_d[i // 2] if i % 2 == 0 else zs_g[i // 2])
    return fixed_noise


def _mlp_G():
    return torch.nn.Sequential(torch.nn.Linear(ZD, H), torch.nn.ReLU(),
                               torch.nn.Linear(H, XD), torch.nn.Sigmoid())


def _mlp_D(out=1, in_dim=XD):
    return torch.nn.Sequential(torch.nn.Linear(in_dim, H),
                               torch.nn.LeakyReLU(0.2),
                               torch.nn.Linear(H, out))


def _run_jax(spec, cfg, state, xs, ys=None):
    train_step = step_lib.build_step(spec, cfg)
    j_d, j_g = [], []
    for k in range(xs.shape[0]):
        lab = (jnp.asarray(ys[k][None]) if ys is not None
               else jnp.zeros((1, xs.shape[1]), jnp.int32))
        batch = {"image": jnp.asarray(xs[k][None]), "label": lab}
        state, m = train_step(state, batch)
        j_d.append(float(m["d_loss"]))
        j_g.append(float(m["g_loss"]))
    return j_d, j_g


# =====================================================================
# MM-GAN: the saturating original
# =====================================================================

def test_mmgan_50_step_trajectory_matches_torch(monkeypatch):
    rng = np.random.default_rng(10)
    g_ws = [_np_linear(rng, ZD, H), _np_linear(rng, H, XD)]
    d_ws = [_np_linear(rng, XD, H), _np_linear(rng, H, 1)]
    xs = rng.random((STEPS, B, XD), dtype=np.float32)
    zs_d = rng.normal(size=(STEPS, B, ZD)).astype(np.float32)
    zs_g = rng.normal(size=(STEPS, B, ZD)).astype(np.float32)

    cfg = variant_config("mmgan", batch_size=B, z_dim=ZD, hidden_dim=H)
    assert cfg.adam_b1 == 0.5  # the registry default rides the pin

    G, D = _mlp_G(), _mlp_D()
    _copy_into([G[0], G[2]], g_ws)
    _copy_into([D[0], D[2]], d_ws)
    g_opt = _adam_like(cfg, G.parameters(), cfg.g_lr)
    d_opt = _adam_like(cfg, D.parameters(), cfg.d_lr)

    t_d, t_g = [], []
    for k in range(STEPS):
        x = torch.from_numpy(xs[k])
        fake = G(torch.from_numpy(zs_d[k])).detach()
        d_loss = (F.binary_cross_entropy_with_logits(
            D(x), torch.ones(B, 1)) + F.binary_cross_entropy_with_logits(
            D(fake), torch.zeros(B, 1)))
        d_opt.zero_grad(); d_loss.backward(); d_opt.step()
        l_fake = D(G(torch.from_numpy(zs_g[k])))
        g_loss = -F.softplus(l_fake).mean()   # min log(1-D(G(z)))
        g_opt.zero_grad(); g_loss.backward(); g_opt.step()
        t_d.append(d_loss.item()); t_g.append(g_loss.item())

    monkeypatch.setattr(minimax_mod, "compute_noise",
                        _counter_noise(zs_d, zs_g))
    spec = get_variant("mmgan")
    state = _state_with(spec, cfg, _jx_params(g_ws), _jx_params(d_ws))
    j_d, j_g = _run_jax(spec, cfg, state, xs)
    _assert_curves(j_d, t_d)
    _assert_curves(j_g, t_g)


# =====================================================================
# LSGAN: half-squares, linear head
# =====================================================================

def test_lsgan_50_step_trajectory_matches_torch(monkeypatch):
    rng = np.random.default_rng(11)
    g_ws = [_np_linear(rng, ZD, H), _np_linear(rng, H, XD)]
    d_ws = [_np_linear(rng, XD, H), _np_linear(rng, H, 1)]
    xs = rng.random((STEPS, B, XD), dtype=np.float32)
    zs_d = rng.normal(size=(STEPS, B, ZD)).astype(np.float32)
    zs_g = rng.normal(size=(STEPS, B, ZD)).astype(np.float32)

    cfg = variant_config("lsgan", batch_size=B, z_dim=ZD, hidden_dim=H)
    G, D = _mlp_G(), _mlp_D()
    _copy_into([G[0], G[2]], g_ws)
    _copy_into([D[0], D[2]], d_ws)
    g_opt = _adam_like(cfg, G.parameters(), cfg.g_lr)
    d_opt = _adam_like(cfg, D.parameters(), cfg.d_lr)

    t_d, t_g = [], []
    for k in range(STEPS):
        x = torch.from_numpy(xs[k])
        fake = G(torch.from_numpy(zs_d[k])).detach()
        d_loss = (0.5 * ((D(x) - 1.0) ** 2).mean()
                  + 0.5 * (D(fake) ** 2).mean())
        d_opt.zero_grad(); d_loss.backward(); d_opt.step()
        g_loss = 0.5 * ((D(G(torch.from_numpy(zs_g[k]))) - 1.0) ** 2).mean()
        g_opt.zero_grad(); g_loss.backward(); g_opt.step()
        t_d.append(d_loss.item()); t_g.append(g_loss.item())

    monkeypatch.setattr(lsgan_mod, "compute_noise",
                        _counter_noise(zs_d, zs_g))
    spec = get_variant("lsgan")
    state = _state_with(spec, cfg, _jx_params(g_ws), _jx_params(d_ws))
    j_d, j_g = _run_jax(spec, cfg, state, xs)
    # squared losses near 0 amplify relative drift: observed max 0.6%
    # on a handful of tail steps with the head still matching to 2e-5
    _assert_curves(j_d, t_d, rtol=2e-2, atol=1e-3)
    _assert_curves(j_g, t_g, rtol=2e-2, atol=1e-3)


# =====================================================================
# WGAN: 5-critic scan + weight clip + RMSprop — PRNG chain replayed
# =====================================================================

def test_wgan_50_step_trajectory_matches_torch():
    DS = 5
    rng = np.random.default_rng(12)
    g_ws = [_np_linear(rng, ZD, H), _np_linear(rng, H, XD)]
    d_ws = [_np_linear(rng, XD, H), _np_linear(rng, H, 1)]
    xs = rng.random((STEPS, DS, B, XD), dtype=np.float32)

    cfg = variant_config("wgan", batch_size=B, z_dim=ZD, hidden_dim=H)
    assert cfg.d_steps == DS and cfg.optimizer == "rmsprop"
    spec = get_variant("wgan")
    state = _state_with(spec, cfg, _jx_params(g_ws), _jx_params(d_ws))

    # replay of train/step.py's split order -> the exact z draws
    zs_d = np.zeros((STEPS, DS, B, ZD), np.float32)
    zs_g = np.zeros((STEPS, B, ZD), np.float32)
    r = state["rng"]
    for k in range(STEPS):
        r, d_key, g_key = jax.random.split(r, 3)
        for i, dr in enumerate(jax.random.split(d_key, DS)):
            zs_d[k, i] = jax.random.normal(dr, (B, ZD))
        zs_g[k] = jax.random.normal(g_key, (B, ZD))

    G, D = _mlp_G(), _mlp_D()
    _copy_into([G[0], G[2]], g_ws)
    _copy_into([D[0], D[2]], d_ws)
    # torch RMSprop: eps OUTSIDE sqrt — train/optim.py pins optax's
    # eps_in_sqrt=False to this exact rule
    g_opt = torch.optim.RMSprop(G.parameters(), lr=cfg.g_lr, alpha=0.99,
                                eps=1e-8)
    d_opt = torch.optim.RMSprop(D.parameters(), lr=cfg.d_lr, alpha=0.99,
                                eps=1e-8)

    t_d, t_g = [], []
    for k in range(STEPS):
        for i in range(DS):
            x = torch.from_numpy(xs[k, i])
            fake = G(torch.from_numpy(zs_d[k, i])).detach()
            d_loss = D(fake).mean() - D(x).mean()
            d_opt.zero_grad(); d_loss.backward(); d_opt.step()
            with torch.no_grad():
                for p in D.parameters():
                    p.clamp_(-cfg.wgan_clip, cfg.wgan_clip)
        g_loss = -D(G(torch.from_numpy(zs_g[k]))).mean()
        g_opt.zero_grad(); g_loss.backward(); g_opt.step()
        t_d.append(d_loss.item()); t_g.append(g_loss.item())

    train_step = step_lib.build_step(spec, cfg)
    j_d, j_g = [], []
    for k in range(STEPS):
        batch = {"image": jnp.asarray(xs[k]),
                 "label": jnp.zeros((DS, B), jnp.int32)}
        state, m = train_step(state, batch)
        j_d.append(float(m["d_loss"])); j_g.append(float(m["g_loss"]))

    # clipped-critic losses are tiny differences of means — use atol
    np.testing.assert_allclose(j_d, t_d, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(j_g, t_g, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(j_d[:5], t_d[:5], rtol=1e-4, atol=1e-5)


# =====================================================================
# DRAGAN: NSGAN + penalty around perturbed reals (double backward)
# =====================================================================

def test_dragan_50_step_trajectory_matches_torch(monkeypatch):
    rng = np.random.default_rng(13)
    g_ws = [_np_linear(rng, ZD, H), _np_linear(rng, H, XD)]
    d_ws = [_np_linear(rng, XD, H), _np_linear(rng, H, 1)]
    xs = rng.random((STEPS, B, XD), dtype=np.float32)
    zs_d = rng.normal(size=(STEPS, B, ZD)).astype(np.float32)
    zs_g = rng.normal(size=(STEPS, B, ZD)).astype(np.float32)
    us = rng.random((STEPS, B, XD), dtype=np.float32)  # perturbation U(0,1)

    cfg = variant_config("dragan", batch_size=B, z_dim=ZD, hidden_dim=H)
    G, D = _mlp_G(), _mlp_D()
    _copy_into([G[0], G[2]], g_ws)
    _copy_into([D[0], D[2]], d_ws)
    g_opt = _adam_like(cfg, G.parameters(), cfg.g_lr)
    d_opt = _adam_like(cfg, D.parameters(), cfg.d_lr)

    t_d, t_g = [], []
    for k in range(STEPS):
        x = torch.from_numpy(xs[k])
        fake = G(torch.from_numpy(zs_d[k])).detach()
        bce = (F.binary_cross_entropy_with_logits(D(x), torch.ones(B, 1))
               + F.binary_cross_entropy_with_logits(D(fake),
                                                    torch.zeros(B, 1)))
        # x_hat = x + scale*std(x)*U(0,1); std = biased global std as in
        # ops/penalty.py::perturb_real (jnp.std)
        std = float(np.std(xs[k]))
        x_hat = (x + cfg.dragan_noise_scale * std
                 * torch.from_numpy(us[k])).requires_grad_(True)
        grads = torch.autograd.grad(D(x_hat).sum(), x_hat,
                                    create_graph=True)[0]
        norms = torch.sqrt((grads * grads).sum(dim=1) + 1e-12)
        gp = cfg.gp_lambda * ((norms - 1.0) ** 2).mean()
        d_loss = bce + gp
        d_opt.zero_grad(); d_loss.backward(); d_opt.step()
        g_loss = F.binary_cross_entropy_with_logits(
            D(G(torch.from_numpy(zs_g[k]))), torch.ones(B, 1))
        g_opt.zero_grad(); g_loss.backward(); g_opt.step()
        t_d.append(d_loss.item()); t_g.append(g_loss.item())

    monkeypatch.setattr(dragan_mod, "compute_noise",
                        _counter_noise(zs_d, zs_g))
    c = {"n": 0}

    def fixed_perturb(rng_, real, scale):
        i = c["n"]; c["n"] += 1
        return real + scale * jnp.std(real) * jnp.asarray(us[i])
    monkeypatch.setattr(dragan_mod, "perturb_real", fixed_perturb)

    spec = get_variant("dragan")
    state = _state_with(spec, cfg, _jx_params(g_ws), _jx_params(d_ws))
    j_d, j_g = _run_jax(spec, cfg, state, xs)
    _assert_curves(j_d, t_d)
    _assert_curves(j_g, t_g)


# =====================================================================
# RaGAN: relativistic-average logits; G consumes the real batch
# =====================================================================

def test_ragan_50_step_trajectory_matches_torch(monkeypatch):
    rng = np.random.default_rng(14)
    g_ws = [_np_linear(rng, ZD, H), _np_linear(rng, H, XD)]
    d_ws = [_np_linear(rng, XD, H), _np_linear(rng, H, 1)]
    xs = rng.random((STEPS, B, XD), dtype=np.float32)
    zs_d = rng.normal(size=(STEPS, B, ZD)).astype(np.float32)
    zs_g = rng.normal(size=(STEPS, B, ZD)).astype(np.float32)

    cfg = variant_config("ragan", batch_size=B, z_dim=ZD, hidden_dim=H)
    G, D = _mlp_G(), _mlp_D()
    _copy_into([G[0], G[2]], g_ws)
    _copy_into([D[0], D[2]], d_ws)
    g_opt = _adam_like(cfg, G.parameters(), cfg.g_lr)
    d_opt = _adam_like(cfg, D.parameters(), cfg.d_lr)

    def rel(x, z, detach_fake):
        fake = G(z)
        if detach_fake:
            fake = fake.detach()
        c_real, c_fake = D(x), D(fake)
        return (c_real - c_fake.mean(), c_fake - c_real.mean())

    t_d, t_g = [], []
    for k in range(STEPS):
        x = torch.from_numpy(xs[k])
        d_real, d_fake = rel(x, torch.from_numpy(zs_d[k]), True)
        d_loss = (F.binary_cross_entropy_with_logits(
            d_real, torch.ones(B, 1)) + F.binary_cross_entropy_with_logits(
            d_fake, torch.zeros(B, 1)))
        d_opt.zero_grad(); d_loss.backward(); d_opt.step()
        d_real, d_fake = rel(x, torch.from_numpy(zs_g[k]), False)
        g_loss = (F.binary_cross_entropy_with_logits(
            d_fake, torch.ones(B, 1)) + F.binary_cross_entropy_with_logits(
            d_real, torch.zeros(B, 1)))
        g_opt.zero_grad(); d_opt.zero_grad(); g_loss.backward(); g_opt.step()
        t_d.append(d_loss.item()); t_g.append(g_loss.item())

    monkeypatch.setattr(ragan_mod, "compute_noise",
                        _counter_noise(zs_d, zs_g))
    spec = get_variant("ragan")
    state = _state_with(spec, cfg, _jx_params(g_ws), _jx_params(d_ws))
    j_d, j_g = _run_jax(spec, cfg, state, xs)
    _assert_curves(j_d, t_d)
    _assert_curves(j_g, t_g)


# =====================================================================
# f-GAN (Jensen-Shannon): variational bound with conjugate
# =====================================================================

def test_fgan_js_50_step_trajectory_matches_torch(monkeypatch):
    rng = np.random.default_rng(15)
    g_ws = [_np_linear(rng, ZD, H), _np_linear(rng, H, XD)]
    d_ws = [_np_linear(rng, XD, H), _np_linear(rng, H, 1)]
    xs = rng.random((STEPS, B, XD), dtype=np.float32)
    zs_d = rng.normal(size=(STEPS, B, ZD)).astype(np.float32)
    zs_g = rng.normal(size=(STEPS, B, ZD)).astype(np.float32)

    cfg = variant_config("fgan", batch_size=B, z_dim=ZD, hidden_dim=H)
    assert cfg.fgan_divergence == "jensen_shannon"
    G, V = _mlp_G(), _mlp_D()
    _copy_into([G[0], G[2]], g_ws)
    _copy_into([V[0], V[2]], d_ws)
    g_opt = _adam_like(cfg, G.parameters(), cfg.g_lr)
    d_opt = _adam_like(cfg, V.parameters(), cfg.d_lr)

    def gf(v):
        return math.log(2.0) - F.softplus(-v)

    def conj(t):
        return -torch.log(2.0 - torch.exp(t))

    t_d, t_g = [], []
    for k in range(STEPS):
        x = torch.from_numpy(xs[k])
        fake = G(torch.from_numpy(zs_d[k])).detach()
        bound = gf(V(x)).mean() - conj(gf(V(fake))).mean()
        d_loss = -bound
        d_opt.zero_grad(); d_loss.backward(); d_opt.step()
        g_loss = -conj(gf(V(G(torch.from_numpy(zs_g[k]))))).mean()
        g_opt.zero_grad(); g_loss.backward(); g_opt.step()
        t_d.append(d_loss.item()); t_g.append(g_loss.item())

    monkeypatch.setattr(fgan_mod, "compute_noise",
                        _counter_noise(zs_d, zs_g))
    spec = get_variant("fgan")
    state = _state_with(spec, cfg, _jx_params(g_ws), _jx_params(d_ws))
    j_d, j_g = _run_jax(spec, cfg, state, xs)
    # exp/log conjugate chains drift faster than BCE heads (the
    # -log(2-exp(t)) G objective is steep near its pole): observed max
    # 0.003 absolute on isolated tail steps, head still at 2e-5
    _assert_curves(j_d, t_d, rtol=2e-2, atol=5e-3)
    _assert_curves(j_g, t_g, rtol=2e-2, atol=5e-3)


# =====================================================================
# CGAN: one-hot label concat on both nets
# =====================================================================

def test_cgan_50_step_trajectory_matches_torch(monkeypatch):
    NC = 10
    rng = np.random.default_rng(16)
    g_ws = [_np_linear(rng, ZD + NC, H), _np_linear(rng, H, XD)]
    d_ws = [_np_linear(rng, XD + NC, H), _np_linear(rng, H, 1)]
    xs = rng.random((STEPS, B, XD), dtype=np.float32)
    ys = rng.integers(0, NC, size=(STEPS, B)).astype(np.int32)
    zs_d = rng.normal(size=(STEPS, B, ZD)).astype(np.float32)
    zs_g = rng.normal(size=(STEPS, B, ZD)).astype(np.float32)

    cfg = variant_config("cgan", batch_size=B, z_dim=ZD, hidden_dim=H)
    G = torch.nn.Sequential(torch.nn.Linear(ZD + NC, H), torch.nn.ReLU(),
                            torch.nn.Linear(H, XD), torch.nn.Sigmoid())
    D = _mlp_D(in_dim=XD + NC)
    _copy_into([G[0], G[2]], g_ws)
    _copy_into([D[0], D[2]], d_ws)
    g_opt = _adam_like(cfg, G.parameters(), cfg.g_lr)
    d_opt = _adam_like(cfg, D.parameters(), cfg.d_lr)

    t_d, t_g = [], []
    for k in range(STEPS):
        x = torch.from_numpy(xs[k])
        y1h = F.one_hot(torch.from_numpy(ys[k]).long(), NC).float()
        fake = G(torch.cat([torch.from_numpy(zs_d[k]), y1h], 1)).detach()
        d_loss = (F.binary_cross_entropy_with_logits(
            D(torch.cat([x, y1h], 1)), torch.ones(B, 1))
            + F.binary_cross_entropy_with_logits(
            D(torch.cat([fake, y1h], 1)), torch.zeros(B, 1)))
        d_opt.zero_grad(); d_loss.backward(); d_opt.step()
        fake = G(torch.cat([torch.from_numpy(zs_g[k]), y1h], 1))
        g_loss = F.binary_cross_entropy_with_logits(
            D(torch.cat([fake, y1h], 1)), torch.ones(B, 1))
        g_opt.zero_grad(); d_opt.zero_grad(); g_loss.backward(); g_opt.step()
        t_d.append(d_loss.item()); t_g.append(g_loss.item())

    monkeypatch.setattr(cgan_mod, "compute_noise",
                        _counter_noise(zs_d, zs_g))
    spec = get_variant("cgan")
    state = _state_with(spec, cfg, _jx_params(g_ws), _jx_params(d_ws))
    j_d, j_g = _run_jax(spec, cfg, state, xs, ys=ys)
    _assert_curves(j_d, t_d)
    _assert_curves(j_g, t_g)


# =====================================================================
# InfoGAN: shared-trunk Q head, MI bound in both updates
# =====================================================================

def test_infogan_50_step_trajectory_matches_torch(monkeypatch):
    CAT, CONT = 10, 2
    rng = np.random.default_rng(17)
    in_g = ZD + CAT + CONT
    g_ws = [_np_linear(rng, in_g, H), _np_linear(rng, H, XD)]
    trunk_w = _np_linear(rng, XD, H)
    dhead_w = _np_linear(rng, H, 1)
    qhead_w = _np_linear(rng, H, CAT + 2 * CONT)
    xs = rng.random((STEPS, B, XD), dtype=np.float32)
    zs = rng.normal(size=(2 * STEPS, B, ZD)).astype(np.float32)
    cats = rng.integers(0, CAT, size=(2 * STEPS, B)).astype(np.int32)
    conts = rng.uniform(-1, 1, size=(2 * STEPS, B, CONT)).astype(np.float32)

    cfg = variant_config("infogan", batch_size=B, z_dim=ZD, hidden_dim=H)
    assert cfg.g_lr == 1e-3 and cfg.info_cont_fixed_var

    trunk = torch.nn.Sequential(torch.nn.Linear(XD, H),
                                torch.nn.LeakyReLU(0.2))
    d_head = torch.nn.Linear(H, 1)
    q_head = torch.nn.Linear(H, CAT + 2 * CONT)
    G = torch.nn.Sequential(torch.nn.Linear(in_g, H), torch.nn.ReLU(),
                            torch.nn.Linear(H, XD), torch.nn.Sigmoid())
    _copy_into([trunk[0]], [trunk_w])
    _copy_into([d_head], [dhead_w])
    _copy_into([q_head], [qhead_w])
    _copy_into([G[0], G[2]], g_ws)
    d_params_t = (list(trunk.parameters()) + list(d_head.parameters())
                  + list(q_head.parameters()))
    g_opt = _adam_like(cfg, G.parameters(), cfg.g_lr)
    d_opt = _adam_like(cfg, d_params_t, cfg.d_lr)

    def mi(fake, cat, cont):
        h = trunk(fake)
        q = q_head(h)
        ce = F.cross_entropy(q[:, :CAT], torch.from_numpy(cat).long())
        q_mu = q[:, CAT:CAT + CONT]
        nll = (0.5 * (torch.from_numpy(cont) - q_mu) ** 2).mean()
        return ce + nll

    t_d, t_g = [], []
    for k in range(STEPS):
        x = torch.from_numpy(xs[k])
        i = 2 * k
        y1h = F.one_hot(torch.from_numpy(cats[i]).long(), CAT).float()
        gin = torch.cat([torch.from_numpy(zs[i]), y1h,
                         torch.from_numpy(conts[i])], 1)
        fake = G(gin).detach()
        bce = (F.binary_cross_entropy_with_logits(
            d_head(trunk(x)), torch.ones(B, 1))
            + F.binary_cross_entropy_with_logits(
            d_head(trunk(fake)), torch.zeros(B, 1)))
        d_loss = bce + cfg.info_lambda * mi(fake, cats[i], conts[i])
        d_opt.zero_grad(); d_loss.backward(); d_opt.step()

        i = 2 * k + 1
        y1h = F.one_hot(torch.from_numpy(cats[i]).long(), CAT).float()
        gin = torch.cat([torch.from_numpy(zs[i]), y1h,
                         torch.from_numpy(conts[i])], 1)
        fake = G(gin)
        g_loss = (F.binary_cross_entropy_with_logits(
            d_head(trunk(fake)), torch.ones(B, 1))
            + cfg.info_lambda * mi(fake, cats[i], conts[i]))
        g_opt.zero_grad(); d_opt.zero_grad(); g_loss.backward(); g_opt.step()
        t_d.append(d_loss.item()); t_g.append(g_loss.item())

    c = {"n": 0}

    def fixed_codes(rng_, n, cfg_):
        i = c["n"]; c["n"] += 1
        cat = jnp.asarray(cats[i])
        return (jnp.asarray(zs[i]), cat,
                jax.nn.one_hot(cat, CAT), jnp.asarray(conts[i]))
    monkeypatch.setattr(infogan_mod, "_sample_codes", fixed_codes)

    spec = get_variant("infogan")
    d_params = {"trunk": _jx_params([trunk_w]),
                "d_head": _jx_params([dhead_w])[0],
                "q_head": _jx_params([qhead_w])[0]}
    state = _state_with(spec, cfg, _jx_params(g_ws), d_params)
    j_d, j_g = _run_jax(spec, cfg, state, xs)
    _assert_curves(j_d, t_d)
    _assert_curves(j_g, t_g)


# =====================================================================
# BIR-VAE: fixed-variance channel + global-batch BN — rng replayed
# =====================================================================

def test_birvae_50_step_trajectory_matches_torch():
    rng = np.random.default_rng(18)
    trunk_w = _np_linear(rng, XD, H)
    mu_w = _np_linear(rng, H, LD)
    dec_ws = [_np_linear(rng, LD, H), _np_linear(rng, H, XD)]
    xs = rng.random((STEPS, B, XD), dtype=np.float32)

    cfg = variant_config("birvae", batch_size=B, latent_dim=LD,
                         vae_hidden_dim=H)
    assert cfg.vae_recon == "mse" and cfg.d_steps == 0
    spec = get_variant("birvae")
    state = step_lib.init_state(spec, cfg, jax.random.PRNGKey(0))
    state["params"] = {"enc_trunk": _jx_params([trunk_w]),
                       "enc_mu": _jx_params([mu_w])[0],
                       "decoder": _jx_params(dec_ws)}
    state["opt"] = make_tx(cfg, cfg.g_lr).init(state["params"])

    # replay the single-model step's rng split -> channel noise draws
    from generative_models_tpu.losses.birvae import noise_sigma
    sigma = noise_sigma(cfg)
    eps = np.zeros((STEPS, B, LD), np.float32)
    r = state["rng"]
    for k in range(STEPS):
        r, key = jax.random.split(r)
        eps[k] = jax.random.normal(key, (B, LD))

    enc = torch.nn.Sequential(torch.nn.Linear(XD, H), torch.nn.ReLU())
    mu_head = torch.nn.Linear(H, LD)
    dec = torch.nn.Sequential(torch.nn.Linear(LD, H), torch.nn.ReLU(),
                              torch.nn.Linear(H, XD), torch.nn.Sigmoid())
    _copy_into([enc[0]], [trunk_w])
    _copy_into([mu_head], [mu_w])
    _copy_into([dec[0], dec[2]], dec_ws)
    params = (list(enc.parameters()) + list(mu_head.parameters())
              + list(dec.parameters()))
    opt = _adam_like(cfg, params, cfg.g_lr)

    t_l = []
    for k in range(STEPS):
        x = torch.from_numpy(xs[k])
        mu = mu_head(enc(x))
        m = mu.mean(dim=0, keepdim=True)
        m2 = (mu * mu).mean(dim=0, keepdim=True)
        var = torch.clamp(m2 - m * m, min=0.0)
        mu_hat = (mu - m) / torch.sqrt(var + 1e-5)
        z = mu_hat + sigma * torch.from_numpy(eps[k])
        out = dec(z)
        loss = ((out - x) ** 2).sum(dim=1).mean()
        opt.zero_grad(); loss.backward(); opt.step()
        t_l.append(loss.item())

    train_step = step_lib.build_step(spec, cfg)
    j_l = []
    for k in range(STEPS):
        batch = {"image": jnp.asarray(xs[k][None]),
                 "label": jnp.zeros((1, B), jnp.int32)}
        state, m_ = train_step(state, batch)
        j_l.append(float(m_["loss"]))
    _assert_curves(j_l, t_l)


# =====================================================================
# NSGAN on the CONV stacks: pins the conv update order cross-backend
# =====================================================================

def test_nsgan_conv_50_step_trajectory_matches_torch(monkeypatch):
    import torch.nn as nn

    from generative_models_tpu.models import conv as conv_mod
    from tests.test_torch_oracle_conv import _conv_w, _convt_w, _t

    CB, C, CZ = 16, 4, 8
    cfg = variant_config("nsgan", arch="conv", conv_channels=C, z_dim=CZ,
                         batch_size=CB)
    rng_np = np.random.default_rng(19)
    xs = rng_np.random((STEPS, CB, XD), dtype=np.float32)
    zs_d = rng_np.normal(size=(STEPS, CB, CZ)).astype(np.float32)
    zs_g = rng_np.normal(size=(STEPS, CB, CZ)).astype(np.float32)

    g_params = conv_mod.generator_init(jax.random.PRNGKey(3), cfg)
    d_params = conv_mod.discriminator_init(jax.random.PRNGKey(4), cfg)

    # ---- torch replica with the SAME weights (oracle-conv mapping) --
    fc = nn.Linear(CZ, 7 * 7 * 2 * C)
    gn0 = nn.GroupNorm(min(8, 2 * C), 2 * C, eps=conv_mod._GN_EPS)
    gn1 = nn.GroupNorm(min(8, C), C, eps=conv_mod._GN_EPS)
    up1 = nn.ConvTranspose2d(2 * C, C, 4, 2, 1)
    up2 = nn.ConvTranspose2d(C, 1, 4, 2, 1)
    c1 = nn.Conv2d(1, C, 4, 2, 1)
    c2 = nn.Conv2d(C, 2 * C, 4, 2, 1)
    d_fc = nn.Linear(7 * 7 * 2 * C, 1)
    with torch.no_grad():
        fc.weight.copy_(_t(g_params["fc"]["w"]).T)
        fc.bias.copy_(_t(g_params["fc"]["b"]))
        gn0.weight.copy_(_t(g_params["gn0"]["scale"]))
        gn0.bias.copy_(_t(g_params["gn0"]["bias"]))
        gn1.weight.copy_(_t(g_params["gn1"]["scale"]))
        gn1.bias.copy_(_t(g_params["gn1"]["bias"]))
        up1.weight.copy_(_convt_w(g_params["up1"]))
        up1.bias.copy_(_t(g_params["up1"]["b"]))
        up2.weight.copy_(_convt_w(g_params["up2"]))
        up2.bias.copy_(_t(g_params["up2"]["b"]))
        c1.weight.copy_(_conv_w(d_params["trunk"]["c1"]))
        c1.bias.copy_(_t(d_params["trunk"]["c1"]["b"]))
        c2.weight.copy_(_conv_w(d_params["trunk"]["c2"]))
        c2.bias.copy_(_t(d_params["trunk"]["c2"]["b"]))
        d_fc.weight.copy_(_t(d_params["fc"]["w"]).T)
        d_fc.bias.copy_(_t(d_params["fc"]["b"]))

    def G_t(z):
        h = fc(z).view(-1, 7, 7, 2 * C).permute(0, 3, 1, 2)
        h = torch.relu(gn0(h))
        h = torch.relu(gn1(up1(h)))
        return torch.sigmoid(up2(h)).permute(0, 2, 3, 1).reshape(-1, XD)

    def D_t(x_flat):
        h = x_flat.view(-1, 28, 28, 1).permute(0, 3, 1, 2)
        h = F.leaky_relu(c1(h), cfg.leaky_slope)
        h = F.leaky_relu(c2(h), cfg.leaky_slope)
        return d_fc(h.permute(0, 2, 3, 1).reshape(h.shape[0], -1))

    g_t_params = (list(fc.parameters()) + list(gn0.parameters())
                  + list(gn1.parameters()) + list(up1.parameters())
                  + list(up2.parameters()))
    d_t_params = (list(c1.parameters()) + list(c2.parameters())
                  + list(d_fc.parameters()))
    g_opt = _adam_like(cfg, g_t_params, cfg.g_lr)
    d_opt = _adam_like(cfg, d_t_params, cfg.d_lr)

    t_d, t_g = [], []
    for k in range(STEPS):
        x = torch.from_numpy(xs[k])
        fake = G_t(torch.from_numpy(zs_d[k])).detach()
        d_loss = (F.binary_cross_entropy_with_logits(
            D_t(x), torch.ones(CB, 1)) + F.binary_cross_entropy_with_logits(
            D_t(fake), torch.zeros(CB, 1)))
        d_opt.zero_grad(); d_loss.backward(); d_opt.step()
        g_loss = F.binary_cross_entropy_with_logits(
            D_t(G_t(torch.from_numpy(zs_g[k]))), torch.ones(CB, 1))
        g_opt.zero_grad(); d_opt.zero_grad(); g_loss.backward(); g_opt.step()
        t_d.append(d_loss.item()); t_g.append(g_loss.item())

    monkeypatch.setattr(minimax_mod, "compute_noise",
                        _counter_noise(zs_d, zs_g))
    spec = get_variant("nsgan")
    state = _state_with(spec, cfg, g_params, d_params)
    j_d, j_g = _run_jax(spec, cfg, state, xs)
    # conv cross-backend ops (SAME-pad convs, GroupNorm) accumulate a
    # little faster than the MLP stack
    np.testing.assert_allclose(j_d, t_d, rtol=8e-3, atol=8e-4)
    np.testing.assert_allclose(j_g, t_g, rtol=8e-3, atol=8e-4)
    np.testing.assert_allclose(j_d[:5], t_d[:5], rtol=1e-4, atol=1e-5)


# =====================================================================
# DDPM (beyond-reference family): the same 50-step evidence bar
# =====================================================================

def test_ddpm_50_step_trajectory_matches_torch():
    """Same weights, same replayed (t, eps) draws, same Adam: the
    diffusion family's loss curve matches an independent torch replica
    step-for-step. out/skip get RANDOM weights here (overriding the
    zero-init policy) so every layer trains from step 0."""
    TD, T = 16, 50
    rng = np.random.default_rng(21)
    time_ws = [_np_linear(rng, TD, TD), _np_linear(rng, TD, TD)]
    in_w = _np_linear(rng, XD, H)
    t1_w = _np_linear(rng, TD, H)
    mid_w = _np_linear(rng, H, H)
    t2_w = _np_linear(rng, TD, H)
    out_w = _np_linear(rng, H, XD)
    skip_w = _np_linear(rng, XD, XD)
    xs = rng.random((STEPS, B, XD), dtype=np.float32)

    cfg = variant_config("ddpm", batch_size=B, hidden_dim=H,
                         ddpm_time_dim=TD, ddpm_timesteps=T,
                         ddpm_beta_end=0.3)
    assert cfg.d_steps == 0 and cfg.adam_b1 == 0.9
    spec = get_variant("ddpm")
    state = step_lib.init_state(spec, cfg, jax.random.PRNGKey(0))
    state["params"] = {
        "time": {"l": _jx_params(time_ws)},
        "in": _jx_params([in_w])[0], "t1": _jx_params([t1_w])[0],
        "mid": _jx_params([mid_w])[0], "t2": _jx_params([t2_w])[0],
        "out": _jx_params([out_w])[0], "skip": _jx_params([skip_w])[0],
    }
    state["opt"] = make_tx(cfg, cfg.g_lr).init(state["params"])
    if "ema" in state:
        state["ema"] = state["params"]

    # replay the single-model step's rng chain: split per step, then
    # the loss's 3-way split -> (t draw, eps draw, label-drop draw)
    ts = np.zeros((STEPS, B), np.int64)
    eps = np.zeros((STEPS, B, XD), np.float32)
    r = state["rng"]
    for k in range(STEPS):
        r, key = jax.random.split(r)
        tk, ek, _ = jax.random.split(key, 3)
        ts[k] = np.asarray(jax.random.randint(tk, (B,), 0, T))
        eps[k] = np.asarray(jax.random.normal(ek, (B, XD)))

    # torch replica
    t0 = torch.nn.Linear(TD, TD); t1 = torch.nn.Linear(TD, TD)
    lin_in = torch.nn.Linear(XD, H); lin_t1 = torch.nn.Linear(TD, H)
    lin_mid = torch.nn.Linear(H, H); lin_t2 = torch.nn.Linear(TD, H)
    lin_out = torch.nn.Linear(H, XD); lin_skip = torch.nn.Linear(XD, XD)
    _copy_into([t0, t1], time_ws)
    _copy_into([lin_in, lin_t1, lin_mid, lin_t2, lin_out, lin_skip],
               [in_w, t1_w, mid_w, t2_w, out_w, skip_w])
    mods = [t0, t1, lin_in, lin_t1, lin_mid, lin_t2, lin_out, lin_skip]
    opt = _adam_like(cfg, [p for m in mods for p in m.parameters()],
                     cfg.g_lr)
    silu = torch.nn.SiLU()
    betas = np.linspace(cfg.ddpm_beta_start, cfg.ddpm_beta_end, T)
    abar = np.cumprod(1.0 - betas).astype(np.float32)
    half = TD // 2
    freqs = np.exp(-np.log(1e4) * np.arange(half)
                   / max(half - 1, 1)).astype(np.float32)

    t_l = []
    for k in range(STEPS):
        x0 = 2.0 * torch.from_numpy(xs[k]) - 1.0
        a = torch.from_numpy(abar[ts[k]])[:, None]
        e = torch.from_numpy(eps[k])
        xt = a.sqrt() * x0 + (1 - a).sqrt() * e
        args = torch.from_numpy(
            ts[k][:, None].astype(np.float32) * freqs[None, :])
        emb = t1(silu(t0(torch.cat([args.sin(), args.cos()], -1))))
        h = silu(lin_in(xt) + lin_t1(emb))
        h = silu(lin_mid(h) + lin_t2(emb))
        pred = lin_out(h) + lin_skip(xt)
        loss = ((pred - e) ** 2).mean()
        opt.zero_grad(); loss.backward(); opt.step()
        t_l.append(loss.item())

    train_step = step_lib.build_step(spec, cfg)
    j_l = []
    for k in range(STEPS):
        batch = {"image": jnp.asarray(xs[k][None]),
                 "label": jnp.zeros((1, B), jnp.int32)}
        state, m_ = train_step(state, batch)
        j_l.append(float(m_["loss"]))
    _assert_curves(j_l, t_l)


def test_flow_50_step_trajectory_matches_torch():
    """Flow matching (round 4, 16th variant): same weights, same
    replayed (t, x0) draws, same Adam — the rectified-flow loss curve
    matches an independent torch replica step-for-step. The net is the
    shared ddpm_net MLP; out/skip get RANDOM weights (overriding the
    zero-init policy) so every layer trains from step 0."""
    TD = 16
    rng = np.random.default_rng(23)
    time_ws = [_np_linear(rng, TD, TD), _np_linear(rng, TD, TD)]
    in_w = _np_linear(rng, XD, H)
    t1_w = _np_linear(rng, TD, H)
    mid_w = _np_linear(rng, H, H)
    t2_w = _np_linear(rng, TD, H)
    out_w = _np_linear(rng, H, XD)
    skip_w = _np_linear(rng, XD, XD)
    xs = rng.random((STEPS, B, XD), dtype=np.float32)

    cfg = variant_config("flow", batch_size=B, hidden_dim=H,
                         ddpm_time_dim=TD)
    assert cfg.d_steps == 0 and cfg.adam_b1 == 0.9
    spec = get_variant("flow")
    state = step_lib.init_state(spec, cfg, jax.random.PRNGKey(0))
    state["params"] = {
        "time": {"l": _jx_params(time_ws)},
        "in": _jx_params([in_w])[0], "t1": _jx_params([t1_w])[0],
        "mid": _jx_params([mid_w])[0], "t2": _jx_params([t2_w])[0],
        "out": _jx_params([out_w])[0], "skip": _jx_params([skip_w])[0],
    }
    state["opt"] = make_tx(cfg, cfg.g_lr).init(state["params"])
    if "ema" in state:
        state["ema"] = state["params"]

    # replay the single-model step's rng chain: split per step, then
    # the loss's 3-way split -> (t uniform, x0 normal, label-drop)
    ts = np.zeros((STEPS, B), np.float32)
    x0s = np.zeros((STEPS, B, XD), np.float32)
    r = state["rng"]
    for k in range(STEPS):
        r, key = jax.random.split(r)
        tk, xk, _ = jax.random.split(key, 3)
        ts[k] = np.asarray(jax.random.uniform(tk, (B,)))
        x0s[k] = np.asarray(jax.random.normal(xk, (B, XD)))

    # torch replica (paper formulas: Liu 2022 Eq. 1 straight bridge)
    t0 = torch.nn.Linear(TD, TD); t1 = torch.nn.Linear(TD, TD)
    lin_in = torch.nn.Linear(XD, H); lin_t1 = torch.nn.Linear(TD, H)
    lin_mid = torch.nn.Linear(H, H); lin_t2 = torch.nn.Linear(TD, H)
    lin_out = torch.nn.Linear(H, XD); lin_skip = torch.nn.Linear(XD, XD)
    _copy_into([t0, t1], time_ws)
    _copy_into([lin_in, lin_t1, lin_mid, lin_t2, lin_out, lin_skip],
               [in_w, t1_w, mid_w, t2_w, out_w, skip_w])
    mods = [t0, t1, lin_in, lin_t1, lin_mid, lin_t2, lin_out, lin_skip]
    opt = _adam_like(cfg, [p for m in mods for p in m.parameters()],
                     cfg.g_lr)
    silu = torch.nn.SiLU()
    half = TD // 2
    freqs = np.exp(-np.log(1e4) * np.arange(half)
                   / max(half - 1, 1)).astype(np.float32)

    t_l = []
    for k in range(STEPS):
        x1 = 2.0 * torch.from_numpy(xs[k]) - 1.0
        t = torch.from_numpy(ts[k])
        x0 = torch.from_numpy(x0s[k])
        xt = (1.0 - t)[:, None] * x0 + t[:, None] * x1
        args = torch.from_numpy(
            (ts[k] * 1000.0)[:, None] * freqs[None, :])
        emb = t1(silu(t0(torch.cat([args.sin(), args.cos()], -1))))
        h = silu(lin_in(xt) + lin_t1(emb))
        h = silu(lin_mid(h) + lin_t2(emb))
        pred = lin_out(h) + lin_skip(xt)
        loss = ((pred - (x1 - x0)) ** 2).mean()
        opt.zero_grad(); loss.backward(); opt.step()
        t_l.append(loss.item())

    train_step = step_lib.build_step(spec, cfg)
    j_l = []
    for k in range(STEPS):
        batch = {"image": jnp.asarray(xs[k][None]),
                 "label": jnp.zeros((1, B), jnp.int32)}
        state, m_ = train_step(state, batch)
        j_l.append(float(m_["loss"]))
    _assert_curves(j_l, t_l)


def _vq_cfg_and_weights(variant):
    HV, L, D, K = 32, 4, 8, 16
    rng = np.random.default_rng(29)
    enc_ws = [_np_linear(rng, XD, HV), _np_linear(rng, HV, L * D)]
    dec_ws = [_np_linear(rng, L * D, HV), _np_linear(rng, HV, XD)]
    book = (rng.normal(size=(K, D)) * 0.35).astype(np.float32)
    xs = rng.random((STEPS, B, XD), dtype=np.float32)
    cfg = variant_config(variant, batch_size=B, vae_hidden_dim=HV,
                         vq_tokens=L, vq_code_dim=D, vq_codebook_size=K,
                         vq_prior_width=16, vq_prior_layers=1,
                         vq_prior_heads=2)
    assert cfg.d_steps == 0 and cfg.adam_b1 == 0.9
    vq_params = {"encoder": {"trunk": _jx_params(enc_ws)},
                 "decoder": {"trunk": _jx_params(dec_ws)},
                 "codebook": jnp.asarray(book)}
    return cfg, vq_params, (enc_ws, dec_ws, book), xs, (HV, L, D, K)


def _torch_vq_modules(enc_ws, dec_ws, book):
    enc1 = torch.nn.Linear(*[s for s in enc_ws[0][0].shape])
    enc2 = torch.nn.Linear(*[s for s in enc_ws[1][0].shape])
    dec1 = torch.nn.Linear(*[s for s in dec_ws[0][0].shape])
    dec2 = torch.nn.Linear(*[s for s in dec_ws[1][0].shape])
    _copy_into([enc1, enc2], enc_ws)
    _copy_into([dec1, dec2], dec_ws)
    book_t = torch.nn.Parameter(torch.from_numpy(book).clone())
    return enc1, enc2, dec1, dec2, book_t


def _torch_vq_loss(mods, xb, L, D, beta):
    enc1, enc2, dec1, dec2, book_t = mods
    z = enc2(torch.relu(enc1(xb))).view(-1, L, D)
    d2 = (book_t ** 2).sum(-1) - 2.0 * z @ book_t.t()
    idx = d2.argmin(-1)
    zq = book_t[idx]
    zst = z + (zq - z).detach()
    recon = F.binary_cross_entropy_with_logits(
        dec2(torch.relu(dec1(zst.flatten(1)))), xb,
        reduction="none").sum(1).mean()
    codebook = ((z.detach() - zq) ** 2).sum((1, 2)).mean()
    commit = ((z - zq.detach()) ** 2).sum((1, 2)).mean()
    return recon + codebook + beta * commit, idx


def test_vqvae_50_step_trajectory_matches_torch():
    """VQ-VAE (round 4, 17th variant): same weights, same batches, same
    Adam — the Oord Eq. 3 trajectory matches an eager torch replica
    step-for-step. Fully deterministic (no rng in the loss), so no
    noise replay is needed; the pin covers the straight-through
    estimator's gradient flow and the codebook's scatter-style updates
    over 50 steps of drifting assignments."""
    cfg, vq_params, (enc_ws, dec_ws, book), xs, (HV, L, D, K) = (
        _vq_cfg_and_weights("vqvae"))
    spec = get_variant("vqvae")
    state = step_lib.init_state(spec, cfg, jax.random.PRNGKey(0))
    state["params"] = vq_params
    state["opt"] = make_tx(cfg, cfg.g_lr).init(state["params"])

    mods = _torch_vq_modules(enc_ws, dec_ws, book)
    params_t = [*mods[0].parameters(), *mods[1].parameters(),
                *mods[2].parameters(), *mods[3].parameters(), mods[4]]
    opt = _adam_like(cfg, params_t, cfg.g_lr)
    t_l = []
    for k in range(STEPS):
        loss, _ = _torch_vq_loss(mods, torch.from_numpy(xs[k]), L, D,
                                 cfg.vq_beta)
        opt.zero_grad(); loss.backward(); opt.step()
        t_l.append(loss.item())

    train_step = step_lib.build_step(spec, cfg)
    j_l = []
    for k in range(STEPS):
        batch = {"image": jnp.asarray(xs[k][None]),
                 "label": jnp.zeros((1, B), jnp.int32)}
        state, m_ = train_step(state, batch)
        j_l.append(float(m_["loss"]))
    _assert_curves(j_l, t_l)


def test_vqprior_joint_50_step_trajectory_matches_torch():
    """VQ prior, joint mode (round 4, 18th variant): tokenizer + causal
    transformer under one Adam, pinned against torch's OWN transformer
    stack (nn.TransformerEncoderLayer, pre-LN, tanh-GELU) — 50
    deterministic steps where the prior chases the tokenizer's moving
    token targets. The head gets RANDOM weights (overriding zero-init)
    so the transformer body trains from step 0."""
    cfg, vq_params, (enc_ws, dec_ws, book), xs, (HV, L, D, K) = (
        _vq_cfg_and_weights("vqprior"))
    W = cfg.vq_prior_width
    rng = np.random.default_rng(31)
    tok = (rng.normal(size=(K + 1, W)) * 0.5).astype(np.float32)
    pos = (rng.normal(size=(L, W)) * 0.5).astype(np.float32)
    qkv_w = _np_linear(rng, W, 3 * W)
    proj_w = _np_linear(rng, W, W)
    fc1_w = _np_linear(rng, W, 4 * W)
    fc2_w = _np_linear(rng, 4 * W, W)
    head_w = _np_linear(rng, W, K)
    ones_w = jnp.ones((W,), jnp.float32)
    zeros_w = jnp.zeros((W,), jnp.float32)
    prior = {
        "tok": jnp.asarray(tok), "pos": jnp.asarray(pos),
        "blocks": [{
            "ln1": {"scale": ones_w, "bias": zeros_w},
            "qkv": _jx_params([qkv_w])[0],
            "proj": _jx_params([proj_w])[0],
            "ln2": {"scale": ones_w, "bias": zeros_w},
            "fc1": _jx_params([fc1_w])[0],
            "fc2": _jx_params([fc2_w])[0],
        }],
        "ln_f": {"scale": ones_w, "bias": zeros_w},
        "head": _jx_params([head_w])[0],
    }
    spec = get_variant("vqprior")
    state = step_lib.init_state(spec, cfg, jax.random.PRNGKey(0))
    state["params"] = {"prior": prior, "vqvae": vq_params}
    state["opt"] = make_tx(cfg, cfg.g_lr).init(state["params"])

    # torch replica
    mods = _torch_vq_modules(enc_ws, dec_ws, book)
    tok_emb = torch.nn.Embedding(K + 1, W)
    with torch.no_grad():
        tok_emb.weight.copy_(torch.from_numpy(tok))
    pos_t = torch.nn.Parameter(torch.from_numpy(pos).clone())
    layer = torch.nn.TransformerEncoderLayer(
        W, cfg.vq_prior_heads, dim_feedforward=4 * W, dropout=0.0,
        activation=lambda t: F.gelu(t, approximate="tanh"),
        batch_first=True, norm_first=True)
    with torch.no_grad():
        layer.self_attn.in_proj_weight.copy_(torch.from_numpy(qkv_w[0].T))
        layer.self_attn.in_proj_bias.copy_(torch.from_numpy(qkv_w[1]))
        layer.self_attn.out_proj.weight.copy_(torch.from_numpy(proj_w[0].T))
        layer.self_attn.out_proj.bias.copy_(torch.from_numpy(proj_w[1]))
        layer.linear1.weight.copy_(torch.from_numpy(fc1_w[0].T))
        layer.linear1.bias.copy_(torch.from_numpy(fc1_w[1]))
        layer.linear2.weight.copy_(torch.from_numpy(fc2_w[0].T))
        layer.linear2.bias.copy_(torch.from_numpy(fc2_w[1]))
        layer.norm1.weight.fill_(1.0); layer.norm1.bias.zero_()
        layer.norm2.weight.fill_(1.0); layer.norm2.bias.zero_()
    ln_f = torch.nn.LayerNorm(W)
    head = torch.nn.Linear(W, K)
    with torch.no_grad():
        ln_f.weight.fill_(1.0); ln_f.bias.zero_()
        head.weight.copy_(torch.from_numpy(head_w[0].T))
        head.bias.copy_(torch.from_numpy(head_w[1]))
    mask = torch.nn.Transformer.generate_square_subsequent_mask(L)
    params_t = [*mods[0].parameters(), *mods[1].parameters(),
                *mods[2].parameters(), *mods[3].parameters(), mods[4],
                *tok_emb.parameters(), pos_t, *layer.parameters(),
                *ln_f.parameters(), *head.parameters()]
    opt = _adam_like(cfg, params_t, cfg.g_lr)
    t_l = []
    for k in range(STEPS):
        xb = torch.from_numpy(xs[k])
        vq_loss, idx = _torch_vq_loss(mods, xb, L, D, cfg.vq_beta)
        toks = idx.detach()
        inp = torch.cat([torch.full((B, 1), K), toks[:, :-1]], 1)
        h = layer(tok_emb(inp) + pos_t[None], src_mask=mask)
        ce = F.cross_entropy(head(ln_f(h)).reshape(B * L, K),
                             toks.reshape(-1))
        loss = vq_loss + ce
        opt.zero_grad(); loss.backward(); opt.step()
        t_l.append(loss.item())

    train_step = step_lib.build_step(spec, cfg)
    j_l = []
    for k in range(STEPS):
        batch = {"image": jnp.asarray(xs[k][None]),
                 "label": jnp.zeros((1, B), jnp.int32)}
        state, m_ = train_step(state, batch)
        j_l.append(float(m_["loss"]))
    _assert_curves(j_l, t_l)
