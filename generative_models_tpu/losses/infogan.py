"""InfoGAN (Chen et al. 2016).

Reference: `src/info_gan.py` (SURVEY.md §3.2 row 11; mount empty, math
paper-pinned). Latent input = noise z ⊕ structured code c, with
c = (c_cat ~ Cat(10), c_cont ~ U(-1,1)^2)  (code shape TO-VERIFY).
The Q network SHARES ITS TRUNK with D (models/nets.infogan_d_*); the
variational MI lower bound

    L_I = E[ CE(q_cat(G(z,c)), c_cat) + GaussNLL(c_cont; q_mu, q_var) ]

is ADDED (weight lambda=1) to BOTH the D/Q update and the G update —
Q-head params live inside d_params, so adding L_I to both losses
reproduces the reference's three-way optimization exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.losses.base import AdversarialSpec
from generative_models_tpu.losses.common import bce_logits_mean, compute_noise
from generative_models_tpu.models import nets


def _sample_codes(rng, n, cfg):
    r1, r2, r3 = jax.random.split(rng, 3)
    z = compute_noise(r1, n, cfg.z_dim)
    cat = jax.random.randint(r2, (n,), 0, cfg.info_cat_dim)
    cat_onehot = jax.nn.one_hot(cat, cfg.info_cat_dim)
    cont = jax.random.uniform(r3, (n, cfg.info_cont_dim), minval=-1.0,
                              maxval=1.0)
    return z, cat, cat_onehot, cont


def _mi_lower_bound(d_params, fake, cat, cont, cfg):
    _, q_cat, q_mu, q_logvar = nets.infogan_d_apply(d_params, fake, cfg)
    ce = -jnp.mean(jnp.take_along_axis(
        jax.nn.log_softmax(q_cat, axis=-1), cat[:, None], axis=1))
    if cfg.info_cont_dim > 0:
        if cfg.info_cont_fixed_var:
            # fixed unit variance: NLL ∝ ½(c − μ)². The common public
            # implementation choice — the learned-variance head's
            # exp(-logvar) factor is the measured destabilizer of this
            # variant (IS 1.0 collapsed vs 4.9+ stable; see
            # docs/variants/infogan.md "stability ablation")
            nll = jnp.mean(0.5 * (cont - q_mu) ** 2)
        else:
            nll = jnp.mean(0.5 * (q_logvar + (cont - q_mu) ** 2
                                  / jnp.exp(q_logvar)))
    else:
        nll = 0.0
    return ce + nll


def _d_loss(d_params, g_params, batch, rng, vstate, cfg):
    x = batch["image"]
    code_rng, _ = jax.random.split(rng)
    z, cat, cat_1h, cont = _sample_codes(code_rng, x.shape[0], cfg)
    fake = nets.infogan_g_apply(g_params, z, cat_1h, cont, cfg)
    l_real, _, _, _ = nets.infogan_d_apply(d_params, x, cfg)
    l_fake, _, _, _ = nets.infogan_d_apply(d_params, fake, cfg)
    bce = bce_logits_mean(l_real, jnp.ones_like(l_real)) + \
        bce_logits_mean(l_fake, jnp.zeros_like(l_fake))
    mi = _mi_lower_bound(d_params, fake, cat, cont, cfg)
    loss = bce + cfg.info_lambda * mi
    return loss, {"d_loss": loss, "mi_loss": mi}


def _g_loss(g_params, d_params, batch, rng, vstate, cfg):
    code_rng, _ = jax.random.split(rng)
    z, cat, cat_1h, cont = _sample_codes(code_rng, batch["image"].shape[0],
                                         cfg)
    fake = nets.infogan_g_apply(g_params, z, cat_1h, cont, cfg)
    l_fake, _, _, _ = nets.infogan_d_apply(d_params, fake, cfg)
    mi = _mi_lower_bound(d_params, fake, cat, cont, cfg)
    loss = bce_logits_mean(l_fake, jnp.ones_like(l_fake)) + \
        cfg.info_lambda * mi
    return loss, {"g_loss": loss, "g_mi_loss": mi}


def _sample(g_params, rng, n, cfg):
    """Grid sampling: one column per categorical code (the notebooks'
    'vary c, fix z' visualization)."""
    r1, r2 = jax.random.split(rng)
    z = compute_noise(r1, n, cfg.z_dim)
    cat = jnp.arange(n) % cfg.info_cat_dim
    cat_1h = jax.nn.one_hot(cat, cfg.info_cat_dim)
    cont = jnp.zeros((n, cfg.info_cont_dim))
    return nets.infogan_g_apply(g_params, z, cat_1h, cont, cfg)


INFOGAN = AdversarialSpec(
    name="infogan",
    init_g=nets.infogan_g_init,
    init_d=nets.infogan_d_init,
    d_loss=_d_loss,
    g_loss=_g_loss,
    sample=_sample,
)
