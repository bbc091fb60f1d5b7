"""Torch-oracle parity, second batch: BEGAN, RaGAN, DRAGAN (penalty
double-backward), f-GAN (per divergence). Same protocol as
test_torch_oracle.py: identical weights/inputs, paper-formula torch
replica, losses AND gradients to fp32 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from generative_models_tpu.config import variant_config
from generative_models_tpu.losses import began as began_mod
from generative_models_tpu.losses import dragan as dragan_mod
from generative_models_tpu.losses import fgan as fgan_mod
from generative_models_tpu.losses import ragan as ragan_mod
from generative_models_tpu.losses.registry import get_variant
from tests.test_torch_oracle import (
    B, ZD, H, XD,
    assert_tree_close,
    make_weights,
    np_linear,
    to_jax_params,
    torch_d,
    torch_g,
    torch_grads_as_jaxtree,
)

RNG = np.random.default_rng(42)


@pytest.fixture
def fixtures(monkeypatch):
    g_ws, d_ws = make_weights()
    z = RNG.normal(size=(B, ZD)).astype(np.float32)
    x = RNG.random((B, XD), dtype=np.float32)

    def fixed_noise(rng, n, z_dim):
        return jnp.asarray(z[:n])

    for mod in (began_mod, dragan_mod, fgan_mod, ragan_mod):
        monkeypatch.setattr(mod, "compute_noise", fixed_noise)
    return g_ws, d_ws, z, x


def jax_losses(spec, g_ws, d_ws, x, cfg, d_params=None, vstate=None):
    g_params = to_jax_params(g_ws)
    d_params = d_params if d_params is not None else to_jax_params(d_ws)
    vstate = vstate or {}
    batch = {"image": jnp.asarray(x), "label": jnp.zeros((B,), jnp.int32)}
    key = jax.random.PRNGKey(0)
    (d_loss, _), d_grads = jax.value_and_grad(spec.d_loss, has_aux=True)(
        d_params, g_params, batch, key, vstate, cfg)
    (g_loss, _), g_grads = jax.value_and_grad(spec.g_loss, has_aux=True)(
        g_params, d_params, batch, key, vstate, cfg)
    return float(d_loss), d_grads, float(g_loss), g_grads


def test_ragan_parity(fixtures):
    g_ws, d_ws, z, x = fixtures
    cfg = variant_config("ragan", z_dim=ZD, hidden_dim=H, batch_size=B)
    d_loss_j, d_grads_j, g_loss_j, g_grads_j = jax_losses(
        get_variant("ragan"), g_ws, d_ws, x, cfg)

    G, D = torch_g(g_ws), torch_d(d_ws)
    bce = torch.nn.BCEWithLogitsLoss()
    zt, xt = torch.from_numpy(z), torch.from_numpy(x)

    def rel(detach_g):
        fake = G(zt)
        if detach_g:
            fake = fake.detach()
        c_r = D(xt).squeeze(1)
        c_f = D(fake).squeeze(1)
        return c_r - c_f.mean(), c_f - c_r.mean()

    d_r, d_f = rel(detach_g=True)
    d_loss_t = bce(d_r, torch.ones(B)) + bce(d_f, torch.zeros(B))
    d_loss_t.backward()
    np.testing.assert_allclose(d_loss_j, d_loss_t.item(), rtol=1e-5)
    assert_tree_close(d_grads_j, torch_grads_as_jaxtree(D))

    G.zero_grad(); D.zero_grad()
    d_r, d_f = rel(detach_g=False)
    g_loss_t = bce(d_f, torch.ones(B)) + bce(d_r, torch.zeros(B))
    g_loss_t.backward()
    np.testing.assert_allclose(g_loss_j, g_loss_t.item(), rtol=1e-5)
    assert_tree_close(g_grads_j, torch_grads_as_jaxtree(G))


def test_began_parity(fixtures):
    g_ws, _, z, x = fixtures
    rng = np.random.default_rng(7)
    ae1 = np_linear(rng, XD, H)
    ae2 = np_linear(rng, H, XD)
    cfg = variant_config("began", z_dim=ZD, hidden_dim=H,
                         began_ae_hidden=H, batch_size=B)
    d_params = [{"w": jnp.asarray(w), "b": jnp.asarray(b)}
                for w, b in (ae1, ae2)]
    k = 0.37
    vstate = {"k": jnp.asarray(k, jnp.float32)}
    d_loss_j, d_grads_j, g_loss_j, g_grads_j = jax_losses(
        get_variant("began"), g_ws, None, x, cfg, d_params=d_params,
        vstate=vstate)

    G = torch_g(g_ws)
    AE = torch.nn.Sequential(torch.nn.Linear(XD, H),
                             torch.nn.LeakyReLU(0.2),
                             torch.nn.Linear(H, XD), torch.nn.Sigmoid())
    with torch.no_grad():
        for m, (w, b) in zip([AE[0], AE[2]], [ae1, ae2]):
            m.weight.copy_(torch.from_numpy(w.T))
            m.bias.copy_(torch.from_numpy(b))
    zt, xt = torch.from_numpy(z), torch.from_numpy(x)

    fake = G(zt).detach()
    l_real = (xt - AE(xt)).abs().mean()
    l_fake = (fake - AE(fake)).abs().mean()
    d_loss_t = l_real - k * l_fake
    d_loss_t.backward()
    np.testing.assert_allclose(d_loss_j, d_loss_t.item(), rtol=1e-5)
    assert_tree_close(d_grads_j, torch_grads_as_jaxtree(AE))

    G.zero_grad(); AE.zero_grad()
    fake = G(zt)
    g_loss_t = (fake - AE(fake)).abs().mean()
    g_loss_t.backward()
    np.testing.assert_allclose(g_loss_j, g_loss_t.item(), rtol=1e-5)
    assert_tree_close(g_grads_j, torch_grads_as_jaxtree(G))


def test_dragan_parity_including_double_backward(fixtures, monkeypatch):
    g_ws, d_ws, z, x = fixtures
    u = RNG.random((B, XD), dtype=np.float32)
    std = float(np.std(x))
    monkeypatch.setattr(
        dragan_mod, "perturb_real",
        lambda rng, real, scale: real + scale * jnp.std(real)
        * jnp.asarray(u))
    cfg = variant_config("dragan", z_dim=ZD, hidden_dim=H, batch_size=B)
    d_loss_j, d_grads_j, _, _ = jax_losses(
        get_variant("dragan"), g_ws, d_ws, x, cfg)

    G, D = torch_g(g_ws), torch_d(d_ws)
    bce = torch.nn.BCEWithLogitsLoss()
    zt, xt = torch.from_numpy(z), torch.from_numpy(x)
    fake = G(zt).detach()
    bce_part = bce(D(xt).squeeze(1), torch.ones(B)) + \
        bce(D(fake).squeeze(1), torch.zeros(B))
    x_hat = (xt + cfg.dragan_noise_scale * std
             * torch.from_numpy(u)).requires_grad_(True)
    grads = torch.autograd.grad(D(x_hat).sum(), x_hat,
                                create_graph=True)[0]
    norms = torch.sqrt((grads ** 2).sum(dim=1) + 1e-12)
    gp = cfg.gp_lambda * ((norms - 1.0) ** 2).mean()
    d_loss_t = bce_part + gp
    d_loss_t.backward()
    np.testing.assert_allclose(d_loss_j, d_loss_t.item(), rtol=1e-4)
    assert_tree_close(d_grads_j, torch_grads_as_jaxtree(D), rtol=5e-4,
                      atol=5e-6)


@pytest.mark.parametrize("div", ["jensen_shannon", "pearson",
                                 "squared_hellinger", "total_variation"])
def test_fgan_parity(fixtures, div):
    g_ws, d_ws, z, x = fixtures
    cfg = variant_config("fgan", z_dim=ZD, hidden_dim=H, batch_size=B,
                         fgan_divergence=div)
    d_loss_j, d_grads_j, g_loss_j, g_grads_j = jax_losses(
        get_variant("fgan"), g_ws, d_ws, x, cfg)

    G, D = torch_g(g_ws), torch_d(d_ws)
    zt, xt = torch.from_numpy(z), torch.from_numpy(x)

    def g_f(v):
        if div == "jensen_shannon":
            return np.log(2.0) - torch.nn.functional.softplus(-v)
        if div == "pearson":
            return v
        if div == "squared_hellinger":
            return 1.0 - torch.exp(-v)
        if div == "total_variation":
            return 0.5 * torch.tanh(v)

    def conj(t):
        if div == "jensen_shannon":
            return -torch.log(2.0 - torch.exp(t))
        if div == "pearson":
            return 0.25 * t * t + t
        if div == "squared_hellinger":
            return t / (1.0 - t)
        if div == "total_variation":
            return t

    fake = G(zt)
    d_loss_t = -(g_f(D(xt).squeeze(1)).mean()
                 - conj(g_f(D(fake.detach()).squeeze(1))).mean())
    d_loss_t.backward()
    np.testing.assert_allclose(d_loss_j, d_loss_t.item(), rtol=1e-4,
                               atol=1e-6)
    assert_tree_close(d_grads_j, torch_grads_as_jaxtree(D), rtol=5e-4,
                      atol=5e-6)

    G.zero_grad(); D.zero_grad()
    g_loss_t = -conj(g_f(D(G(zt)).squeeze(1))).mean()
    g_loss_t.backward()
    np.testing.assert_allclose(g_loss_j, g_loss_t.item(), rtol=1e-4,
                               atol=1e-6)
    assert_tree_close(g_grads_j, torch_grads_as_jaxtree(G), rtol=5e-4,
                      atol=5e-6)
