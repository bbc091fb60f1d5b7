"""Torch-oracle parity, third batch — closes single-step loss+grad
oracle coverage to ALL 14 variants and all 7 f-divergences:
MMGAN (saturating G), CGAN (label concat), InfoGAN (shared-trunk Q,
cat CE + Gaussian NLL), BIR-VAE (unit-power BN + fixed channel),
FisherGAN (augmented Lagrangian at lambda != 0), f-GAN kl/reverse_kl/gan
pairs. Protocol as in test_torch_oracle.py: identical weights/inputs,
paper-formula torch replica, losses AND parameter grads to fp32
tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from generative_models_tpu.config import variant_config
from generative_models_tpu.losses import birvae as birvae_mod
from generative_models_tpu.losses import cgan as cgan_mod
from generative_models_tpu.losses import fgan as fgan_mod
from generative_models_tpu.losses import fishergan as fisher_mod
from generative_models_tpu.losses import infogan as infogan_mod
from generative_models_tpu.losses import minimax as minimax_mod
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

RNG = np.random.default_rng(123)


def _copy(linear, w, b):
    with torch.no_grad():
        linear.weight.copy_(torch.from_numpy(w.T))
        linear.bias.copy_(torch.from_numpy(b))


@pytest.fixture
def fixtures(monkeypatch):
    g_ws, d_ws = make_weights()
    z = RNG.normal(size=(B, ZD)).astype(np.float32)
    x = RNG.random((B, XD), dtype=np.float32)

    def fixed_noise(rng, n, z_dim):
        return jnp.asarray(z[:n])

    for mod in (minimax_mod, cgan_mod, fgan_mod, fisher_mod, infogan_mod):
        monkeypatch.setattr(mod, "compute_noise", fixed_noise)
    return g_ws, d_ws, z, x


def jax_losses(spec, g_params, d_params, batch, cfg, vstate=None):
    vstate = vstate or {}
    key = jax.random.PRNGKey(0)
    (d_loss, _), d_grads = jax.value_and_grad(spec.d_loss, has_aux=True)(
        d_params, g_params, batch, key, vstate, cfg)
    (g_loss, _), g_grads = jax.value_and_grad(spec.g_loss, has_aux=True)(
        g_params, d_params, batch, key, vstate, cfg)
    return float(d_loss), d_grads, float(g_loss), g_grads


def test_mmgan_saturating_g_parity(fixtures):
    g_ws, d_ws, z, x = fixtures
    cfg = variant_config("mmgan", z_dim=ZD, hidden_dim=H, batch_size=B)
    batch = {"image": jnp.asarray(x), "label": jnp.zeros((B,), jnp.int32)}
    d_loss_j, d_grads_j, g_loss_j, g_grads_j = jax_losses(
        get_variant("mmgan"), to_jax_params(g_ws), to_jax_params(d_ws),
        batch, cfg)

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
    # saturating: min E[log(1 - D(G(z)))] = -BCE(l_fake, 0)
    g_loss_t = -bce(D(G(zt)).squeeze(1), torch.zeros(B))
    g_loss_t.backward()
    np.testing.assert_allclose(g_loss_j, g_loss_t.item(), rtol=1e-5)
    assert_tree_close(g_grads_j, torch_grads_as_jaxtree(G))


def test_cgan_label_concat_parity(fixtures):
    _, _, z, x = fixtures
    NC = 10
    cfg = variant_config("cgan", z_dim=ZD, hidden_dim=H, batch_size=B,
                         num_classes=NC)
    y = RNG.integers(0, NC, size=B).astype(np.int32)
    rng = np.random.default_rng(5)
    g_ws = (*np_linear(rng, ZD + NC, H), *np_linear(rng, H, XD))
    d_ws = (*np_linear(rng, XD + NC, H), *np_linear(rng, H, 1))
    batch = {"image": jnp.asarray(x), "label": jnp.asarray(y)}
    d_loss_j, d_grads_j, g_loss_j, g_grads_j = jax_losses(
        get_variant("cgan"), to_jax_params(g_ws), to_jax_params(d_ws),
        batch, cfg)

    G = torch.nn.Sequential(torch.nn.Linear(ZD + NC, H), torch.nn.ReLU(),
                            torch.nn.Linear(H, XD), torch.nn.Sigmoid())
    D = torch.nn.Sequential(torch.nn.Linear(XD + NC, H),
                            torch.nn.LeakyReLU(0.2), torch.nn.Linear(H, 1))
    _copy(G[0], g_ws[0], g_ws[1]); _copy(G[2], g_ws[2], g_ws[3])
    _copy(D[0], d_ws[0], d_ws[1]); _copy(D[2], d_ws[2], d_ws[3])
    bce = torch.nn.BCEWithLogitsLoss()
    oh = torch.nn.functional.one_hot(
        torch.from_numpy(y.astype(np.int64)), NC).float()
    zt, xt = torch.from_numpy(z), torch.from_numpy(x)

    fake = G(torch.cat([zt, oh], 1))
    d_loss_t = bce(D(torch.cat([xt, oh], 1)).squeeze(1), torch.ones(B)) + \
        bce(D(torch.cat([fake.detach(), oh], 1)).squeeze(1), torch.zeros(B))
    d_loss_t.backward()
    np.testing.assert_allclose(d_loss_j, d_loss_t.item(), rtol=1e-5)
    assert_tree_close(d_grads_j, torch_grads_as_jaxtree(D))

    G.zero_grad(); D.zero_grad()
    fake = G(torch.cat([zt, oh], 1))
    g_loss_t = bce(D(torch.cat([fake, oh], 1)).squeeze(1), torch.ones(B))
    g_loss_t.backward()
    np.testing.assert_allclose(g_loss_j, g_loss_t.item(), rtol=1e-5)
    assert_tree_close(g_grads_j, torch_grads_as_jaxtree(G))


def test_fishergan_lagrangian_parity(fixtures):
    g_ws, d_ws, z, x = fixtures
    cfg = variant_config("fishergan", z_dim=ZD, hidden_dim=H, batch_size=B)
    lam = 0.3
    batch = {"image": jnp.asarray(x), "label": jnp.zeros((B,), jnp.int32)}
    d_loss_j, d_grads_j, g_loss_j, g_grads_j = jax_losses(
        get_variant("fishergan"), to_jax_params(g_ws), to_jax_params(d_ws),
        batch, cfg, vstate={"lam": jnp.asarray(lam, jnp.float32)})

    G, D = torch_g(g_ws), torch_d(d_ws)
    zt, xt = torch.from_numpy(z), torch.from_numpy(x)
    fake = G(zt).detach()
    f_r, f_f = D(xt).squeeze(1), D(fake).squeeze(1)
    ipm = f_r.mean() - f_f.mean()
    omega = 0.5 * (f_r ** 2).mean() + 0.5 * (f_f ** 2).mean()
    con = 1.0 - omega
    d_loss_t = -(ipm + lam * con - 0.5 * cfg.fisher_rho * con ** 2)
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


@pytest.mark.parametrize("fixed_var", [False, True])
def test_infogan_mi_bound_parity(fixtures, monkeypatch, fixed_var):
    _, _, z, x = fixtures
    CAT, CONT = 10, 2
    cfg = variant_config("infogan", z_dim=ZD, hidden_dim=H, batch_size=B,
                         info_cat_dim=CAT, info_cont_dim=CONT,
                         info_cont_fixed_var=fixed_var)
    rng = np.random.default_rng(6)
    g_ws = (*np_linear(rng, ZD + CAT + CONT, H), *np_linear(rng, H, XD))
    trunk_w = np_linear(rng, XD, H)
    dh_w = np_linear(rng, H, 1)
    qh_w = np_linear(rng, H, CAT + 2 * CONT)
    cat = RNG.integers(0, CAT, size=B)
    cont = (RNG.random((B, CONT), dtype=np.float32) * 2 - 1)

    monkeypatch.setattr(
        infogan_mod, "_sample_codes",
        lambda r, n, c: (jnp.asarray(z[:n]), jnp.asarray(cat),
                         jax.nn.one_hot(jnp.asarray(cat), CAT),
                         jnp.asarray(cont)))

    g_params = to_jax_params(g_ws)
    d_params = {
        "trunk": [dict(w=jnp.asarray(trunk_w[0]), b=jnp.asarray(trunk_w[1]))],
        "d_head": dict(w=jnp.asarray(dh_w[0]), b=jnp.asarray(dh_w[1])),
        "q_head": dict(w=jnp.asarray(qh_w[0]), b=jnp.asarray(qh_w[1])),
    }
    batch = {"image": jnp.asarray(x), "label": jnp.zeros((B,), jnp.int32)}
    d_loss_j, d_grads_j, g_loss_j, g_grads_j = jax_losses(
        get_variant("infogan"), g_params, d_params, batch, cfg)

    G = torch.nn.Sequential(torch.nn.Linear(ZD + CAT + CONT, H),
                            torch.nn.ReLU(),
                            torch.nn.Linear(H, XD), torch.nn.Sigmoid())
    trunk = torch.nn.Sequential(torch.nn.Linear(XD, H),
                                torch.nn.LeakyReLU(0.2))
    d_head, q_head = torch.nn.Linear(H, 1), torch.nn.Linear(
        H, CAT + 2 * CONT)
    _copy(G[0], g_ws[0], g_ws[1]); _copy(G[2], g_ws[2], g_ws[3])
    _copy(trunk[0], *trunk_w); _copy(d_head, *dh_w); _copy(q_head, *qh_w)
    bce = torch.nn.BCEWithLogitsLoss()
    ce = torch.nn.CrossEntropyLoss()
    zt, xt = torch.from_numpy(z), torch.from_numpy(x)
    cat_t = torch.from_numpy(cat.astype(np.int64))
    cont_t = torch.from_numpy(cont)
    oh = torch.nn.functional.one_hot(cat_t, CAT).float()
    zc = torch.cat([zt, oh, cont_t], 1)

    def mi(fake):
        q = q_head(trunk(fake))
        q_mu, q_lv = q[:, CAT:CAT + CONT], q[:, CAT + CONT:]
        # same NLL forms as losses/infogan.py (1/2 log 2pi constant
        # dropped on both sides — parameter-independent)
        if fixed_var:
            nll = (0.5 * (cont_t - q_mu) ** 2).mean()
        else:
            nll = (0.5 * (q_lv + (cont_t - q_mu) ** 2 / q_lv.exp())).mean()
        return ce(q[:, :CAT], cat_t) + nll

    fake = G(zc).detach()
    d_loss_t = (bce(d_head(trunk(xt)).squeeze(1), torch.ones(B))
                + bce(d_head(trunk(fake)).squeeze(1), torch.zeros(B))
                + cfg.info_lambda * mi(fake))
    d_loss_t.backward()
    np.testing.assert_allclose(d_loss_j, d_loss_t.item(), rtol=1e-5)
    d_grads_t = {
        "trunk": [dict(w=trunk[0].weight.grad.numpy().T,
                       b=trunk[0].bias.grad.numpy())],
        "d_head": dict(w=d_head.weight.grad.numpy().T,
                       b=d_head.bias.grad.numpy()),
        "q_head": dict(w=q_head.weight.grad.numpy().T,
                       b=q_head.bias.grad.numpy()),
    }
    for jl, tl in zip(jax.tree.leaves(d_grads_j),
                      jax.tree.leaves(d_grads_t)):
        np.testing.assert_allclose(np.asarray(jl), tl, rtol=2e-4, atol=2e-6)

    for m in (G, trunk, d_head, q_head):
        m.zero_grad()
    fake = G(zc)
    g_loss_t = bce(d_head(trunk(fake)).squeeze(1), torch.ones(B)) + \
        cfg.info_lambda * mi(fake)
    g_loss_t.backward()
    np.testing.assert_allclose(g_loss_j, g_loss_t.item(), rtol=1e-5)
    assert_tree_close(g_grads_j, torch_grads_as_jaxtree(G))


def test_birvae_parity(monkeypatch):
    LD, HV = 6, 16
    cfg = variant_config("birvae", latent_dim=LD, vae_hidden_dim=HV,
                         batch_size=B)
    assert cfg.vae_recon == "mse"
    rng = np.random.default_rng(9)
    trunk_w = np_linear(rng, XD, HV)
    mu_w = np_linear(rng, HV, LD)
    dec_ws = (*np_linear(rng, LD, HV), *np_linear(rng, HV, XD))
    # self-seeded (not the shared module RNG): inputs must not depend on
    # which tests ran before this one
    x = rng.random((B, XD), dtype=np.float32)
    eps = rng.normal(size=(B, LD)).astype(np.float32)

    real_normal = jax.random.normal
    monkeypatch.setattr(
        birvae_mod.jax.random, "normal",
        lambda r, shape, dtype=jnp.float32: jnp.asarray(eps))
    try:
        params = {
            "enc_trunk": [dict(w=jnp.asarray(trunk_w[0]),
                               b=jnp.asarray(trunk_w[1]))],
            "enc_mu": dict(w=jnp.asarray(mu_w[0]), b=jnp.asarray(mu_w[1])),
            "decoder": to_jax_params(dec_ws),
        }
        batch = {"image": jnp.asarray(x),
                 "label": jnp.zeros((B,), jnp.int32)}
        spec = get_variant("birvae")
        (loss_j, _), grads_j = jax.value_and_grad(spec.loss, has_aux=True)(
            params, batch, jax.random.PRNGKey(0), cfg)
    finally:
        monkeypatch.setattr(birvae_mod.jax.random, "normal", real_normal)

    trunk = torch.nn.Sequential(torch.nn.Linear(XD, HV), torch.nn.ReLU())
    mu_l = torch.nn.Linear(HV, LD)
    dec = torch.nn.Sequential(torch.nn.Linear(LD, HV), torch.nn.ReLU(),
                              torch.nn.Linear(HV, XD), torch.nn.Sigmoid())
    _copy(trunk[0], *trunk_w); _copy(mu_l, *mu_w)
    _copy(dec[0], dec_ws[0], dec_ws[1]); _copy(dec[2], dec_ws[2], dec_ws[3])
    xt = torch.from_numpy(x)
    sigma = float(4.0 ** (-cfg.birvae_bits / LD)) ** 0.5

    mu = mu_l(trunk(xt))
    mu_hat = (mu - mu.mean(0, keepdim=True)) * torch.rsqrt(
        mu.var(0, unbiased=False, keepdim=True) + 1e-5)
    zt = mu_hat + sigma * torch.from_numpy(eps)
    loss_t = ((dec(zt) - xt) ** 2).sum(dim=1).mean()
    loss_t.backward()
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=1e-5)

    grads_t = {
        "enc_trunk": [dict(w=trunk[0].weight.grad.numpy().T,
                           b=trunk[0].bias.grad.numpy())],
        "enc_mu": dict(w=mu_l.weight.grad.numpy().T,
                       b=mu_l.bias.grad.numpy()),
        "decoder": torch_grads_as_jaxtree(dec),
    }
    # atol covers analytically-ZERO grads (enc_mu bias: a constant mu
    # shift cancels in the batch-norm mean subtraction) where both
    # backends produce only fp dust at the 1e-5 scale; real grads are
    # O(1e-2)+ and guarded by rtol
    for jl, tl in zip(jax.tree.leaves(grads_j), jax.tree.leaves(grads_t)):
        np.testing.assert_allclose(np.asarray(jl), tl, rtol=5e-4, atol=1e-4)


@pytest.mark.parametrize("div", ["kl", "reverse_kl", "gan"])
def test_fgan_remaining_divergences_parity(fixtures, div):
    g_ws, d_ws, z, x = fixtures
    cfg = variant_config("fgan", z_dim=ZD, hidden_dim=H, batch_size=B,
                         fgan_divergence=div)
    batch = {"image": jnp.asarray(x), "label": jnp.zeros((B,), jnp.int32)}
    d_loss_j, d_grads_j, g_loss_j, g_grads_j = jax_losses(
        get_variant("fgan"), to_jax_params(g_ws), to_jax_params(d_ws),
        batch, cfg)

    G, D = torch_g(g_ws), torch_d(d_ws)
    zt, xt = torch.from_numpy(z), torch.from_numpy(x)

    def g_f(v):
        if div == "kl":
            return v
        if div == "reverse_kl":
            return -torch.exp(-v)
        return -torch.nn.functional.softplus(-v)    # gan

    def conj(t):
        if div == "kl":
            return torch.exp(t - 1.0)
        if div == "reverse_kl":
            return -1.0 - torch.log(-t)
        return -torch.log(1.0 - torch.exp(t))        # gan

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


# ----- VQ-VAE family (round 4; deterministic losses, no rng coupling) --

VQ_KW = dict(vae_hidden_dim=16, vq_tokens=3, vq_code_dim=4,
             vq_codebook_size=5, batch_size=8, vq_prior_width=8,
             vq_prior_layers=1, vq_prior_heads=2)
HV, L, D, K, W = 16, 3, 4, 5, 8


def _vq_jax_params(rng):
    ew1, eb1 = np_linear(rng, XD, HV)
    ew2, eb2 = np_linear(rng, HV, L * D)
    dw1, db1 = np_linear(rng, L * D, HV)
    dw2, db2 = np_linear(rng, HV, XD)
    book = (rng.normal(size=(K, D)) * 0.5).astype(np.float32)
    params = {
        "encoder": {"trunk": to_jax_params((ew1, eb1, ew2, eb2))},
        "decoder": {"trunk": to_jax_params((dw1, db1, dw2, db2))},
        "codebook": jnp.asarray(book),
    }
    raw = dict(ew1=ew1, eb1=eb1, ew2=ew2, eb2=eb2, dw1=dw1, db1=db1,
               dw2=dw2, db2=db2, book=book)
    return params, raw


def _torch_vq_terms(raw, xt, beta):
    enc1, enc2 = torch.nn.Linear(XD, HV), torch.nn.Linear(HV, L * D)
    dec1, dec2 = torch.nn.Linear(L * D, HV), torch.nn.Linear(HV, XD)
    _copy(enc1, raw["ew1"], raw["eb1"]); _copy(enc2, raw["ew2"], raw["eb2"])
    _copy(dec1, raw["dw1"], raw["db1"]); _copy(dec2, raw["dw2"], raw["db2"])
    book = torch.nn.Parameter(torch.from_numpy(raw["book"]).clone())
    z = enc2(torch.relu(enc1(xt))).view(-1, L, D)
    d2 = (book ** 2).sum(-1) - 2.0 * z @ book.t()
    idx = d2.argmin(-1)
    zq = book[idx]
    zst = z + (zq - z).detach()
    logits = dec2(torch.relu(dec1(zst.flatten(1))))
    recon = torch.nn.functional.binary_cross_entropy_with_logits(
        logits, xt, reduction="none").sum(1).mean()
    codebook = ((z.detach() - zq) ** 2).sum((1, 2)).mean()
    commit = ((z - zq.detach()) ** 2).sum((1, 2)).mean()
    total = recon + codebook + beta * commit
    return total, idx, dict(enc1=enc1, enc2=enc2, dec1=dec1, dec2=dec2,
                            book=book)


def _assert_vq_grads(j_grads, mods, rtol=5e-4, atol=5e-6):
    pairs = [
        (j_grads["encoder"]["trunk"][0], mods["enc1"]),
        (j_grads["encoder"]["trunk"][1], mods["enc2"]),
        (j_grads["decoder"]["trunk"][0], mods["dec1"]),
        (j_grads["decoder"]["trunk"][1], mods["dec2"]),
    ]
    for jl, tl in pairs:
        np.testing.assert_allclose(np.asarray(jl["w"]),
                                   tl.weight.grad.numpy().T,
                                   rtol=rtol, atol=atol)
        np.testing.assert_allclose(np.asarray(jl["b"]),
                                   tl.bias.grad.numpy(),
                                   rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(j_grads["codebook"]),
                               mods["book"].grad.numpy(),
                               rtol=rtol, atol=atol)


def test_vqvae_parity():
    """Oord Eq. 3 (recon + codebook + beta*commit with straight-through)
    against an eager torch replica: loss and ALL parameter grads,
    including the codebook's scatter-style gradient."""
    from generative_models_tpu.losses import vqvae as vq_mod

    rng = np.random.default_rng(11)
    cfg = variant_config("vqvae", **VQ_KW)
    params, raw = _vq_jax_params(rng)
    x = rng.random((8, XD), dtype=np.float32)

    (loss_j, m), grads_j = jax.value_and_grad(
        lambda p: vq_mod.loss(p, {"image": jnp.asarray(x)},
                              jax.random.PRNGKey(0), cfg),
        has_aux=True)(params)

    xt = torch.from_numpy(x)
    loss_t, idx_t, mods = _torch_vq_terms(raw, xt, cfg.vq_beta)
    loss_t.backward()
    # the two frameworks pick the same nearest codes
    from generative_models_tpu.models import vq_net
    from generative_models_tpu.ops import vq as vq_ops
    z = vq_net.encoder_apply(params["encoder"], jnp.asarray(x), cfg)
    idx_j, _ = vq_ops.quantize(z, params["codebook"])
    np.testing.assert_array_equal(np.asarray(idx_j), idx_t.numpy())
    assert np.isfinite(float(m["perplexity"]))
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=1e-5,
                               atol=1e-6)
    _assert_vq_grads(grads_j, mods)


def test_vqprior_joint_parity():
    """The joint vqprior loss (vq terms + prior CE) against torch's OWN
    transformer stack (nn.TransformerEncoderLayer, pre-LN, tanh-GELU,
    torch's MultiheadAttention with a causal mask) — an independent
    implementation of the causal block models/ar_prior.py hand-rolls.
    Loss + grads on tokenizer, codebook, embeddings, attention, MLP and
    head parameters."""
    from generative_models_tpu.losses import vqprior as vqp_mod

    rng = np.random.default_rng(13)
    cfg = variant_config("vqprior", **VQ_KW)
    params, raw = _vq_jax_params(rng)

    tok = rng.normal(size=(K + 1, W)).astype(np.float32)
    pos = rng.normal(size=(L, W)).astype(np.float32)
    qkv_w, qkv_b = np_linear(rng, W, 3 * W)
    proj_w, proj_b = np_linear(rng, W, W)
    fc1_w, fc1_b = np_linear(rng, W, 4 * W)
    fc2_w, fc2_b = np_linear(rng, 4 * W, W)
    head_w, head_b = np_linear(rng, W, K)  # nonzero: exercise the body
    ones_w, zeros_w = np.ones(W, np.float32), np.zeros(W, np.float32)
    prior = {
        "tok": jnp.asarray(tok), "pos": jnp.asarray(pos),
        "blocks": [{
            "ln1": {"scale": jnp.asarray(ones_w), "bias": jnp.asarray(zeros_w)},
            "qkv": {"w": jnp.asarray(qkv_w), "b": jnp.asarray(qkv_b)},
            "proj": {"w": jnp.asarray(proj_w), "b": jnp.asarray(proj_b)},
            "ln2": {"scale": jnp.asarray(ones_w), "bias": jnp.asarray(zeros_w)},
            "fc1": {"w": jnp.asarray(fc1_w), "b": jnp.asarray(fc1_b)},
            "fc2": {"w": jnp.asarray(fc2_w), "b": jnp.asarray(fc2_b)},
        }],
        "ln_f": {"scale": jnp.asarray(ones_w), "bias": jnp.asarray(zeros_w)},
        "head": {"w": jnp.asarray(head_w), "b": jnp.asarray(head_b)},
    }
    jparams = {"prior": prior, "vqvae": params}
    x = rng.random((8, XD), dtype=np.float32)

    (loss_j, m_j), grads_j = jax.value_and_grad(
        lambda p: vqp_mod.loss(p, {"image": jnp.asarray(x)},
                               jax.random.PRNGKey(0), cfg),
        has_aux=True)(jparams)

    # ----- torch side ------------------------------------------------
    xt = torch.from_numpy(x)
    vq_loss_t, idx_t, mods = _torch_vq_terms(raw, xt, cfg.vq_beta)
    toks = idx_t.detach()
    tok_emb = torch.nn.Embedding(K + 1, W)
    with torch.no_grad():
        tok_emb.weight.copy_(torch.from_numpy(tok))
    pos_t = torch.nn.Parameter(torch.from_numpy(pos).clone())
    layer = torch.nn.TransformerEncoderLayer(
        W, 2, dim_feedforward=4 * W, dropout=0.0,
        activation=lambda t: torch.nn.functional.gelu(
            t, approximate="tanh"),
        batch_first=True, norm_first=True)
    with torch.no_grad():
        layer.self_attn.in_proj_weight.copy_(torch.from_numpy(qkv_w.T))
        layer.self_attn.in_proj_bias.copy_(torch.from_numpy(qkv_b))
        layer.self_attn.out_proj.weight.copy_(torch.from_numpy(proj_w.T))
        layer.self_attn.out_proj.bias.copy_(torch.from_numpy(proj_b))
        layer.linear1.weight.copy_(torch.from_numpy(fc1_w.T))
        layer.linear1.bias.copy_(torch.from_numpy(fc1_b))
        layer.linear2.weight.copy_(torch.from_numpy(fc2_w.T))
        layer.linear2.bias.copy_(torch.from_numpy(fc2_b))
        layer.norm1.weight.fill_(1.0); layer.norm1.bias.zero_()
        layer.norm2.weight.fill_(1.0); layer.norm2.bias.zero_()
    ln_f = torch.nn.LayerNorm(W)
    head = torch.nn.Linear(W, K)
    _copy(head, head_w, head_b)
    with torch.no_grad():
        ln_f.weight.fill_(1.0); ln_f.bias.zero_()

    inp = torch.cat([torch.full((8, 1), K), toks[:, :-1]], 1)
    mask = torch.nn.Transformer.generate_square_subsequent_mask(L)
    h = layer(tok_emb(inp) + pos_t[None], src_mask=mask)
    logits = head(ln_f(h))
    ce_t = torch.nn.functional.cross_entropy(
        logits.reshape(8 * L, K), toks.reshape(-1))
    total_t = vq_loss_t + ce_t
    total_t.backward()

    np.testing.assert_allclose(float(loss_j), total_t.item(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(float(m_j["prior_loss"]), ce_t.item(),
                               rtol=1e-5, atol=1e-6)
    _assert_vq_grads(grads_j["vqvae"], mods)
    gp = grads_j["prior"]
    blk = gp["blocks"][0]
    checks = [
        (gp["tok"], tok_emb.weight.grad.numpy()),
        (gp["pos"], pos_t.grad.numpy()),
        (blk["qkv"]["w"], layer.self_attn.in_proj_weight.grad.numpy().T),
        (blk["qkv"]["b"], layer.self_attn.in_proj_bias.grad.numpy()),
        (blk["proj"]["w"], layer.self_attn.out_proj.weight.grad.numpy().T),
        (blk["fc1"]["w"], layer.linear1.weight.grad.numpy().T),
        (blk["fc2"]["w"], layer.linear2.weight.grad.numpy().T),
        (blk["ln1"]["scale"], layer.norm1.weight.grad.numpy()),
        (blk["ln2"]["scale"], layer.norm2.weight.grad.numpy()),
        (gp["ln_f"]["scale"], ln_f.weight.grad.numpy()),
        (gp["head"]["w"], head.weight.grad.numpy().T),
        (gp["head"]["b"], head.bias.grad.numpy()),
    ]
    for jg, tg in checks:
        np.testing.assert_allclose(np.asarray(jg), tg, rtol=5e-4,
                                   atol=5e-6)
