"""Per-variant loss-head unit and property tests (SURVEY.md §5):
golden small-tensor values against the paper formulas, and invariants
(KL >= 0, GP zero at unit grad norm, k_t clamping, Fenchel domain
checks, multiplier update sign)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_models_tpu.config import variant_config
from generative_models_tpu.losses import began as began_mod
from generative_models_tpu.losses import fgan as fgan_mod
from generative_models_tpu.losses import fishergan as fisher_mod
from generative_models_tpu.losses.common import bce_logits, compute_noise
from generative_models_tpu.losses.wgan import _clip as wgan_clip
from generative_models_tpu.ops.penalty import (
    gradient_penalty,
    interpolate,
    perturb_real,
)
from generative_models_tpu.ops.reparam import kl_gaussian_xla, reparam_and_kl


def test_bce_logits_matches_naive():
    logits = np.linspace(-5, 5, 21).astype(np.float32)
    targets = (np.arange(21) % 2).astype(np.float32)
    got = np.asarray(bce_logits(jnp.asarray(logits), jnp.asarray(targets)))
    p = 1 / (1 + np.exp(-logits))
    want = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_kl_gaussian_golden_and_nonneg():
    # KL(N(0,1) || N(0,1)) = 0
    zero = np.asarray(kl_gaussian_xla(jnp.zeros((1, 3)), jnp.zeros((1, 3))))
    np.testing.assert_allclose(zero, 0.0, atol=1e-7)
    # KL(N(mu, s^2)||N(0,1)) = 0.5*(mu^2 + s^2 - log s^2 - 1) per dim
    mu, logvar = 0.7, -0.4
    got = float(kl_gaussian_xla(jnp.full((1, 1), mu),
                                jnp.full((1, 1), logvar))[0])
    want = 0.5 * (mu ** 2 + np.exp(logvar) - logvar - 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # nonnegativity on random inputs
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))
    lv = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))
    assert np.all(np.asarray(kl_gaussian_xla(m, lv)) >= -1e-6)


def test_reparam_statistics():
    mu = jnp.full((20000, 2), 1.5)
    logvar = jnp.full((20000, 2), np.log(0.25).astype(np.float32))
    z, kl = reparam_and_kl(mu, logvar, jax.random.PRNGKey(0))
    assert abs(float(jnp.mean(z)) - 1.5) < 0.02
    assert abs(float(jnp.std(z)) - 0.5) < 0.02
    np.testing.assert_allclose(np.asarray(kl), np.asarray(
        kl_gaussian_xla(mu, logvar)), rtol=1e-6)


def test_gradient_penalty_zero_iff_unit_norm():
    # Linear critic D(x) = x @ w: input grad is w for every sample.
    w = np.zeros((4,), np.float32)
    w[0] = 1.0  # ||w|| = 1
    d_apply = lambda params, x: x @ params
    x = jnp.asarray(np.random.default_rng(1).random((8, 4), np.float32))
    gp, norm = gradient_penalty(d_apply, jnp.asarray(w), x, lam=10.0)
    assert float(gp) < 1e-6
    np.testing.assert_allclose(float(norm), 1.0, rtol=1e-5)
    # ||w|| = 2 -> penalty = 10 * (2-1)^2 = 10
    gp2, _ = gradient_penalty(d_apply, jnp.asarray(2 * w), x, lam=10.0)
    np.testing.assert_allclose(float(gp2), 10.0, rtol=1e-4)


def test_gradient_penalty_differentiable_wrt_params():
    d_apply = lambda params, x: jnp.tanh(x @ params["w"]) @ params["v"]
    rng = np.random.default_rng(2)
    params = {"w": jnp.asarray(rng.normal(size=(6, 5)).astype(np.float32)),
              "v": jnp.asarray(rng.normal(size=(5,)).astype(np.float32))}
    x = jnp.asarray(rng.random((7, 6), np.float32))

    def pen(p):
        gp, _ = gradient_penalty(d_apply, p, x, lam=10.0)
        return gp

    grads = jax.grad(pen)(params)
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree.leaves(grads))
    assert any(np.any(np.asarray(g) != 0) for g in jax.tree.leaves(grads))


def test_interpolate_and_perturb():
    rng = jax.random.PRNGKey(0)
    real = jnp.zeros((16, 4))
    fake = jnp.ones((16, 4))
    x_hat = interpolate(rng, real, fake)
    a = np.asarray(x_hat)
    assert a.min() >= 0.0 and a.max() <= 1.0
    # each row uses ONE eps: row-wise constant
    assert np.allclose(a.std(axis=1), 0.0, atol=1e-7)

    real2 = jnp.asarray(np.random.default_rng(3).normal(
        size=(64, 8)).astype(np.float32))
    pert = perturb_real(rng, real2, 0.5)
    delta = np.asarray(pert - real2)
    assert delta.min() >= 0.0  # U(0,1) noise is nonnegative
    assert delta.max() <= 0.5 * float(jnp.std(real2)) + 1e-6


def test_wgan_clip():
    params = [{"w": jnp.asarray([[0.5, -0.5]]), "b": jnp.asarray([0.005])}]
    cfg = variant_config("wgan")
    clipped = wgan_clip(params, cfg)
    np.testing.assert_allclose(np.asarray(clipped[0]["w"]),
                               [[0.01, -0.01]])
    np.testing.assert_allclose(np.asarray(clipped[0]["b"]), [0.005])


def test_began_kt_update_and_clamp():
    cfg = variant_config("began", began_gamma=0.5, began_lambda_k=0.1)
    vstate = {"k": jnp.asarray(0.0), "m": jnp.asarray(0.0)}
    d_metrics = {"began_l_real": jnp.asarray(1.0)}
    g_metrics = {"began_l_fake_g": jnp.asarray(0.2)}
    out = began_mod._step_state_update(vstate, d_metrics, g_metrics, cfg)
    # k + 0.1*(0.5*1.0 - 0.2) = 0.03 ; M = 1.0 + |0.3| = 1.3
    np.testing.assert_allclose(float(out["k"]), 0.03, rtol=1e-6)
    np.testing.assert_allclose(float(out["m"]), 1.3, rtol=1e-6)
    # clamp below 0
    g_metrics = {"began_l_fake_g": jnp.asarray(50.0)}
    out = began_mod._step_state_update(vstate, d_metrics, g_metrics, cfg)
    assert float(out["k"]) == 0.0


def test_fisher_lambda_update_sign():
    cfg = variant_config("fishergan", fisher_rho=1e-3)
    vstate = {"lam": jnp.asarray(0.0)}
    # Omega < 1 (weak critic) -> constraint > 0 -> lam decreases
    out = fisher_mod._d_state_update(
        vstate, {"constraint": jnp.asarray(0.5)}, cfg)
    assert float(out["lam"]) == pytest.approx(-5e-4)
    # Omega > 1 -> lam increases
    out = fisher_mod._d_state_update(
        vstate, {"constraint": jnp.asarray(-0.5)}, cfg)
    assert float(out["lam"]) == pytest.approx(5e-4)


@pytest.mark.parametrize("name", sorted(fgan_mod.DIVERGENCES))
def test_fgan_conjugate_domain_and_convexity(name):
    """g_f's range must lie in dom(f*), and f* must be convex (checked
    by midpoint convexity on the mapped range)."""
    div = fgan_mod.DIVERGENCES[name]
    v = jnp.asarray(np.linspace(-4, 4, 101).astype(np.float32))
    t = div.g_f(v)
    ft = div.conjugate(t)
    assert np.all(np.isfinite(np.asarray(ft))), f"{name}: f* not finite"
    ts = np.sort(np.asarray(t))
    mid = div.conjugate(jnp.asarray((ts[:-1] + ts[1:]) / 2))
    chord = (np.asarray(div.conjugate(jnp.asarray(ts[:-1])))
             + np.asarray(div.conjugate(jnp.asarray(ts[1:])))) / 2
    assert np.all(np.asarray(mid) <= chord + 1e-4), f"{name}: f* not convex"


def test_fgan_js_reduces_to_gan_family():
    """At v=0, JS g_f = log2 - softplus(0) = log2 - log2... sanity pin
    of the activation values."""
    js = fgan_mod.DIVERGENCES["jensen_shannon"]
    v0 = float(js.g_f(jnp.asarray(0.0)))
    assert v0 == pytest.approx(np.log(2.0) - np.log(2.0), abs=1e-7)


def test_compute_noise_stats():
    z = compute_noise(jax.random.PRNGKey(0), 20000, 4)
    assert abs(float(jnp.mean(z))) < 0.02
    assert abs(float(jnp.std(z)) - 1.0) < 0.02


def test_fgan_nonsaturating_g_loss():
    """cfg.fgan_g_loss="nonsaturating" switches L_G from
    -E[f*(g_f(V))] to -E[g_f(V)] (Nowozin §3.2); both computed against
    the registry's own pieces on a pinned fake batch."""
    import jax

    from generative_models_tpu.config import variant_config
    from generative_models_tpu.losses import fgan as fgan_mod
    from generative_models_tpu.losses.fgan import FGAN, get_divergence
    from generative_models_tpu.models import nets

    # (not total_variation: its conjugate is the identity, so the two
    # G forms coincide there by construction)
    for div_name in ("jensen_shannon", "kl"):
        cfg_sat = variant_config("fgan", fgan_divergence=div_name,
                                 hidden_dim=16, z_dim=8, batch_size=4)
        cfg_ns = cfg_sat.replace(fgan_g_loss="nonsaturating")
        rng = jax.random.PRNGKey(0)
        g = FGAN.init_g(jax.random.PRNGKey(1), cfg_sat)
        d = FGAN.init_d(jax.random.PRNGKey(2), cfg_sat)
        batch = {"image": jax.random.uniform(rng, (4, cfg_sat.image_dim)),
                 "label": jnp.zeros((4,), jnp.int32)}
        l_sat, _ = FGAN.g_loss(g, d, batch, rng, {}, cfg_sat)
        l_ns, _ = FGAN.g_loss(g, d, batch, rng, {}, cfg_ns)
        # reconstruct both forms directly from the divergence pieces
        div = get_divergence(div_name)
        z = fgan_mod.compute_noise(rng, 4, cfg_sat.z_dim)
        t_fake = div.g_f(nets.discriminator_apply(
            d, nets.generator_apply(g, z, cfg_sat), cfg_sat))
        np.testing.assert_allclose(float(l_sat),
                                   float(-jnp.mean(div.conjugate(t_fake))),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(l_ns),
                                   float(-jnp.mean(t_fake)), rtol=1e-6)
        assert not np.isclose(float(l_sat), float(l_ns))


def test_fgan_g_loss_flag_validated():
    from generative_models_tpu.config import variant_config
    with pytest.raises(ValueError, match="fgan_g_loss"):
        variant_config("fgan", fgan_g_loss="bogus")
