"""Model-stack unit tests: shapes, init distribution (torch parity),
head structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_models_tpu.config import variant_config
from generative_models_tpu.models import nets
from generative_models_tpu.models.mlp import linear_init, mlp_apply, mlp_init

CFG = variant_config("nsgan", hidden_dim=32, z_dim=8)


def test_linear_init_matches_torch_default():
    # torch.nn.Linear: W, b ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in))
    rng = jax.random.PRNGKey(0)
    p = linear_init(rng, 400, 64)
    bound = 1 / np.sqrt(400)
    for leaf in (p["w"], p["b"]):
        a = np.asarray(leaf)
        assert a.min() >= -bound and a.max() <= bound
    # roughly uniform: std of U(-b, b) is b/sqrt(3)
    assert np.abs(np.std(np.asarray(p["w"])) - bound / np.sqrt(3)) < 0.1 * bound


def test_generator_discriminator_shapes():
    rng = jax.random.PRNGKey(1)
    g = nets.generator_init(rng, CFG)
    d = nets.discriminator_init(rng, CFG)
    z = jax.random.normal(rng, (5, CFG.z_dim))
    x = nets.generator_apply(g, z, CFG)
    assert x.shape == (5, 784)
    assert float(jnp.min(x)) >= 0.0 and float(jnp.max(x)) <= 1.0
    logits = nets.discriminator_apply(d, x, CFG)
    assert logits.shape == (5,)


def test_conditional_nets():
    rng = jax.random.PRNGKey(2)
    g = nets.cond_generator_init(rng, CFG)
    d = nets.cond_discriminator_init(rng, CFG)
    z = jax.random.normal(rng, (7, CFG.z_dim))
    y = jnp.arange(7) % 10
    x = nets.cond_generator_apply(g, z, y, CFG)
    assert x.shape == (7, 784)
    logits = nets.cond_discriminator_apply(d, x, y, CFG)
    assert logits.shape == (7,)


def test_vae_nets():
    cfg = variant_config("vae", vae_hidden_dim=32, latent_dim=4)
    rng = jax.random.PRNGKey(3)
    enc = nets.encoder_init(rng, cfg)
    dec = nets.decoder_init(rng, cfg)
    x = jax.random.uniform(rng, (3, 784))
    mu, logvar = nets.encoder_apply(enc, x, cfg)
    assert mu.shape == (3, 4) and logvar.shape == (3, 4)
    recon = nets.decoder_apply(dec, mu, cfg)
    assert recon.shape == (3, 784)
    logits = nets.decoder_apply(dec, mu, cfg, logits=True)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(logits)),
                               np.asarray(recon), atol=1e-6)


def test_began_autoencoder_d():
    cfg = variant_config("began", hidden_dim=32, began_ae_hidden=32)
    rng = jax.random.PRNGKey(4)
    d = nets.began_d_init(rng, cfg)
    x = jax.random.uniform(rng, (6, 784))
    out = nets.began_d_apply(d, x, cfg)
    assert out.shape == (6, 784)


def test_infogan_heads():
    cfg = variant_config("infogan", hidden_dim=32, z_dim=8)
    rng = jax.random.PRNGKey(5)
    d = nets.infogan_d_init(rng, cfg)
    g = nets.infogan_g_init(rng, cfg)
    z = jax.random.normal(rng, (4, cfg.z_dim))
    c_cat = jax.nn.one_hot(jnp.arange(4) % 10, cfg.info_cat_dim)
    c_cont = jax.random.uniform(rng, (4, cfg.info_cont_dim), minval=-1,
                                maxval=1)
    x = nets.infogan_g_apply(g, z, c_cat, c_cont, cfg)
    assert x.shape == (4, 784)
    d_logit, q_cat, q_mu, q_logvar = nets.infogan_d_apply(d, x, cfg)
    assert d_logit.shape == (4,)
    assert q_cat.shape == (4, cfg.info_cat_dim)
    assert q_mu.shape == (4, cfg.info_cont_dim)
    assert q_logvar.shape == (4, cfg.info_cont_dim)


def test_mlp_second_order_differentiable():
    """The GP variants need grad-of-grad through the D stack."""
    rng = jax.random.PRNGKey(6)
    layers = mlp_init(rng, [16, 8, 1])
    x = jax.random.normal(rng, (4, 16))

    def d_out(params, xx):
        return mlp_apply(params, xx, hidden_act="leaky_relu",
                         out_act="none")[..., 0]

    def penalty(params):
        g = jax.vmap(jax.grad(lambda xx: d_out(params, xx[None])[0]))(x)
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    grads = jax.grad(penalty)(layers)
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(np.any(np.asarray(g) != 0) for g in flat)
