"""Torch-oracle parity (SURVEY.md §5): the same weights and inputs run
through (a) this framework's actual loss heads and (b) a minimal
PyTorch-CPU replica of each paper formula (written from the papers, NOT
ported reference code — the mount is empty). Losses AND parameter
gradients must agree to fp32 tolerance. This is the practical meaning
of "comparable loss trajectories" vs the PyTorch reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from generative_models_tpu.config import variant_config
from generative_models_tpu.losses import lsgan as lsgan_mod
from generative_models_tpu.losses import minimax as minimax_mod
from generative_models_tpu.losses import wgan as wgan_mod
from generative_models_tpu.losses import wgangp as wgangp_mod
from generative_models_tpu.losses import vae as vae_mod
from generative_models_tpu.losses.registry import get_variant

B, ZD, H, XD = 8, 6, 16, 784
CFG = variant_config("nsgan", z_dim=ZD, hidden_dim=H, batch_size=B)
RNG = np.random.default_rng(0)


def np_linear(rng, i, o):
    b = 1 / np.sqrt(i)
    return (rng.uniform(-b, b, size=(i, o)).astype(np.float32),
            rng.uniform(-b, b, size=(o,)).astype(np.float32))


def make_weights():
    gw1, gb1 = np_linear(RNG, ZD, H)
    gw2, gb2 = np_linear(RNG, H, XD)
    dw1, db1 = np_linear(RNG, XD, H)
    dw2, db2 = np_linear(RNG, H, 1)
    return (gw1, gb1, gw2, gb2), (dw1, db1, dw2, db2)


def to_jax_params(ws):
    w1, b1, w2, b2 = ws
    return [{"w": jnp.asarray(w1), "b": jnp.asarray(b1)},
            {"w": jnp.asarray(w2), "b": jnp.asarray(b2)}]


def torch_g(ws):
    w1, b1, w2, b2 = ws
    m = torch.nn.Sequential(torch.nn.Linear(ZD, H), torch.nn.ReLU(),
                            torch.nn.Linear(H, XD), torch.nn.Sigmoid())
    with torch.no_grad():
        m[0].weight.copy_(torch.from_numpy(w1.T))
        m[0].bias.copy_(torch.from_numpy(b1))
        m[2].weight.copy_(torch.from_numpy(w2.T))
        m[2].bias.copy_(torch.from_numpy(b2))
    return m


def torch_d(ws):
    w1, b1, w2, b2 = ws
    m = torch.nn.Sequential(torch.nn.Linear(XD, H), torch.nn.LeakyReLU(0.2),
                            torch.nn.Linear(H, 1))
    with torch.no_grad():
        m[0].weight.copy_(torch.from_numpy(w1.T))
        m[0].bias.copy_(torch.from_numpy(b1))
        m[2].weight.copy_(torch.from_numpy(w2.T))
        m[2].bias.copy_(torch.from_numpy(b2))
    return m


def torch_grads_as_jaxtree(model):
    """[(w [in,out], b)] per linear layer, matching the jax layout."""
    layers = [m for m in model if isinstance(m, torch.nn.Linear)]
    return [{"w": l.weight.grad.numpy().T, "b": l.bias.grad.numpy()}
            for l in layers]


def assert_tree_close(jtree, ttree, rtol=2e-4, atol=2e-6):
    for jl, tl in zip(jtree, ttree):
        np.testing.assert_allclose(np.asarray(jl["w"]), tl["w"],
                                   rtol=rtol, atol=atol)
        np.testing.assert_allclose(np.asarray(jl["b"]), tl["b"],
                                   rtol=rtol, atol=atol)


@pytest.fixture
def fixtures(monkeypatch):
    g_ws, d_ws = make_weights()
    z = RNG.normal(size=(B, ZD)).astype(np.float32)
    x = RNG.random((B, XD), dtype=np.float32)

    def fixed_noise(rng, n, z_dim):
        return jnp.asarray(z[:n])

    for mod in (minimax_mod, lsgan_mod, wgan_mod, wgangp_mod):
        monkeypatch.setattr(mod, "compute_noise", fixed_noise)
    return g_ws, d_ws, z, x


def jax_losses(spec, g_ws, d_ws, x, cfg):
    g_params, d_params = to_jax_params(g_ws), to_jax_params(d_ws)
    batch = {"image": jnp.asarray(x), "label": jnp.zeros((B,), jnp.int32)}
    key = jax.random.PRNGKey(0)
    (d_loss, _), d_grads = jax.value_and_grad(spec.d_loss, has_aux=True)(
        d_params, g_params, batch, key, {}, cfg)
    (g_loss, _), g_grads = jax.value_and_grad(spec.g_loss, has_aux=True)(
        g_params, d_params, batch, key, {}, cfg)
    return float(d_loss), d_grads, float(g_loss), g_grads


def test_nsgan_parity(fixtures):
    g_ws, d_ws, z, x = fixtures
    spec = get_variant("nsgan")
    d_loss_j, d_grads_j, g_loss_j, g_grads_j = jax_losses(
        spec, g_ws, d_ws, x, CFG)

    G, D = torch_g(g_ws), torch_d(d_ws)
    bce = torch.nn.BCEWithLogitsLoss()
    zt, xt = torch.from_numpy(z), torch.from_numpy(x)

    fake = G(zt)
    d_loss_t = bce(D(xt).squeeze(1), torch.ones(B)) + \
        bce(D(fake.detach()).squeeze(1), torch.zeros(B))
    d_loss_t.backward()
    np.testing.assert_allclose(d_loss_j, d_loss_t.item(), rtol=1e-5)
    assert_tree_close(d_grads_j, torch_grads_as_jaxtree(D))

    G.zero_grad(); D.zero_grad()
    g_loss_t = bce(D(G(zt)).squeeze(1), torch.ones(B))
    g_loss_t.backward()
    np.testing.assert_allclose(g_loss_j, g_loss_t.item(), rtol=1e-5)
    assert_tree_close(g_grads_j, torch_grads_as_jaxtree(G))


def test_lsgan_parity(fixtures):
    g_ws, d_ws, z, x = fixtures
    spec = get_variant("lsgan")
    cfg = variant_config("lsgan", z_dim=ZD, hidden_dim=H, batch_size=B)
    d_loss_j, d_grads_j, g_loss_j, g_grads_j = jax_losses(
        spec, g_ws, d_ws, x, cfg)

    G, D = torch_g(g_ws), torch_d(d_ws)
    zt, xt = torch.from_numpy(z), torch.from_numpy(x)
    fake = G(zt)
    d_loss_t = 0.5 * ((D(xt).squeeze(1) - 1) ** 2).mean() + \
        0.5 * (D(fake.detach()).squeeze(1) ** 2).mean()
    d_loss_t.backward()
    np.testing.assert_allclose(d_loss_j, d_loss_t.item(), rtol=1e-5)
    assert_tree_close(d_grads_j, torch_grads_as_jaxtree(D))

    G.zero_grad(); D.zero_grad()
    g_loss_t = 0.5 * ((D(G(zt)).squeeze(1) - 1) ** 2).mean()
    g_loss_t.backward()
    np.testing.assert_allclose(g_loss_j, g_loss_t.item(), rtol=1e-5)
    assert_tree_close(g_grads_j, torch_grads_as_jaxtree(G))


def test_wgan_parity(fixtures):
    g_ws, d_ws, z, x = fixtures
    spec = get_variant("wgan")
    cfg = variant_config("wgan", z_dim=ZD, hidden_dim=H, batch_size=B)
    d_loss_j, d_grads_j, g_loss_j, g_grads_j = jax_losses(
        spec, g_ws, d_ws, x, cfg)

    G, D = torch_g(g_ws), torch_d(d_ws)
    zt, xt = torch.from_numpy(z), torch.from_numpy(x)
    fake = G(zt)
    d_loss_t = D(fake.detach()).mean() - D(xt).mean()
    d_loss_t.backward()
    np.testing.assert_allclose(d_loss_j, d_loss_t.item(), rtol=1e-5,
                               atol=1e-7)
    assert_tree_close(d_grads_j, torch_grads_as_jaxtree(D))

    G.zero_grad(); D.zero_grad()
    g_loss_t = -D(G(zt)).mean()
    g_loss_t.backward()
    np.testing.assert_allclose(g_loss_j, g_loss_t.item(), rtol=1e-5,
                               atol=1e-7)
    assert_tree_close(g_grads_j, torch_grads_as_jaxtree(G))


def test_wgangp_parity_including_double_backward(fixtures, monkeypatch):
    """The gradient-penalty path: parity of the FULL critic loss and its
    parameter gradients, which requires grad-of-grad on both sides."""
    g_ws, d_ws, z, x = fixtures
    eps = RNG.random((B, 1), dtype=np.float32)
    monkeypatch.setattr(wgangp_mod, "interpolate",
                        lambda rng, real, fake: jnp.asarray(eps) * real
                        + (1 - jnp.asarray(eps)) * fake)
    spec = get_variant("wgangp")
    cfg = variant_config("wgangp", z_dim=ZD, hidden_dim=H, batch_size=B)
    d_loss_j, d_grads_j, _, _ = jax_losses(spec, g_ws, d_ws, x, cfg)

    G, D = torch_g(g_ws), torch_d(d_ws)
    zt, xt = torch.from_numpy(z), torch.from_numpy(x)
    fake = G(zt).detach()
    et = torch.from_numpy(eps)
    x_hat = (et * xt + (1 - et) * fake).requires_grad_(True)
    d_hat = D(x_hat)
    grads = torch.autograd.grad(d_hat.sum(), x_hat, create_graph=True)[0]
    norms = torch.sqrt((grads ** 2).sum(dim=1) + 1e-12)
    gp = cfg.gp_lambda * ((norms - 1.0) ** 2).mean()
    d_loss_t = D(fake).mean() - D(xt).mean() + gp
    d_loss_t.backward()
    np.testing.assert_allclose(d_loss_j, d_loss_t.item(), rtol=1e-4)
    assert_tree_close(d_grads_j, torch_grads_as_jaxtree(D), rtol=5e-4,
                      atol=5e-6)


def test_vae_parity(monkeypatch):
    """VAE loss + grads with eps pinned to 0 (z = mu) on both sides."""
    cfg = variant_config("vae", vae_hidden_dim=H, latent_dim=4)
    rng = np.random.default_rng(1)
    ew, eb = np_linear(rng, XD, H)
    mw, mb = np_linear(rng, H, 4)
    lw, lb = np_linear(rng, H, 4)
    d1w, d1b = np_linear(rng, 4, H)
    d2w, d2b = np_linear(rng, H, XD)
    x = rng.random((B, XD), dtype=np.float32)

    params = {
        "encoder": {"trunk": [{"w": jnp.asarray(ew), "b": jnp.asarray(eb)}],
                    "mu": {"w": jnp.asarray(mw), "b": jnp.asarray(mb)},
                    "logvar": {"w": jnp.asarray(lw), "b": jnp.asarray(lb)}},
        "decoder": [{"w": jnp.asarray(d1w), "b": jnp.asarray(d1b)},
                    {"w": jnp.asarray(d2w), "b": jnp.asarray(d2b)}],
    }
    from generative_models_tpu.ops.reparam import kl_gaussian_xla
    monkeypatch.setattr(vae_mod, "reparam_and_kl",
                        lambda mu, logvar, rng: (mu,
                                                 kl_gaussian_xla(mu, logvar)))
    batch = {"image": jnp.asarray(x), "label": jnp.zeros((B,), jnp.int32)}
    (loss_j, _), grads_j = jax.value_and_grad(vae_mod.loss, has_aux=True)(
        params, batch, jax.random.PRNGKey(0), cfg)

    # torch replica
    lin = lambda i, o, w, b: _t_lin(i, o, w, b)

    def _t_lin(i, o, w, b):
        m = torch.nn.Linear(i, o)
        with torch.no_grad():
            m.weight.copy_(torch.from_numpy(w.T))
            m.bias.copy_(torch.from_numpy(b))
        return m

    te, tm, tl = lin(XD, H, ew, eb), lin(H, 4, mw, mb), lin(H, 4, lw, lb)
    td1, td2 = lin(4, H, d1w, d1b), lin(H, XD, d2w, d2b)
    xt = torch.from_numpy(x)
    h = torch.relu(te(xt))
    mu, logvar = tm(h), tl(h)
    zt = mu  # eps = 0
    logits = td2(torch.relu(td1(zt)))
    recon = torch.nn.functional.binary_cross_entropy_with_logits(
        logits, xt, reduction="none").sum(dim=1)
    kl = -0.5 * (1 + logvar - mu ** 2 - logvar.exp()).sum(dim=1)
    loss_t = (recon + kl).mean()
    loss_t.backward()
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads_j["encoder"]["trunk"][0]["w"]),
        te.weight.grad.numpy().T, rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(grads_j["decoder"][1]["w"]),
        td2.weight.grad.numpy().T, rtol=2e-4, atol=2e-6)
