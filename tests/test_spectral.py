"""Spectral weight projection (ops/spectral.py, Config.spectral_projection)."""

import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.ops.spectral import (
    project_spectral, spectral_sigma,
)
from generative_models_tpu.train.trainer import Trainer
from tests.conftest import tiny_cfg


def _svd_sigma(w):
    return float(np.linalg.svd(np.asarray(w).reshape(-1, w.shape[-1]),
                               compute_uv=False)[0])


def test_power_iteration_matches_svd():
    w = jax.random.normal(jax.random.PRNGKey(0), (37, 53)) * 1.7
    assert np.isclose(float(spectral_sigma(w, iters=50)), _svd_sigma(w), rtol=1e-4)
    # the fast default tracks within a few percent
    assert np.isclose(float(spectral_sigma(w)), _svd_sigma(w), rtol=0.05)


def test_power_iteration_conv_kernel():
    k = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 3, 16))
    got = float(spectral_sigma(k.reshape(-1, 16), iters=50))
    assert np.isclose(got, _svd_sigma(k), rtol=1e-4)


def test_projection_enforces_ball_and_passes_small_weights():
    big = jax.random.normal(jax.random.PRNGKey(2), (20, 30)) * 5.0
    small = jax.random.normal(jax.random.PRNGKey(3), (20, 30)) * 0.01
    params = [{"w": big, "b": jnp.ones(30)},
              {"w": small, "b": jnp.ones(30)}]
    out = project_spectral(params, target=1.0, iters=50)
    assert _svd_sigma(out[0]["w"]) <= 1.0 + 1e-4
    np.testing.assert_array_equal(out[1]["w"], small)   # inside the ball
    np.testing.assert_array_equal(out[0]["b"], params[0]["b"])  # biases


def _max_sigma(tree):
    sigmas = []
    def visit(path, leaf):
        last = path[-1]
        if (isinstance(last, jax.tree_util.DictKey) and last.key == "w"
                and leaf.ndim >= 2):
            sigmas.append(_svd_sigma(leaf))
        return leaf
    jax.tree_util.tree_map_with_path(visit, tree)
    return max(sigmas)


def test_trainer_projects_critic_only(tiny_data):
    cfg = tiny_cfg("nsgan", spectral_projection=True)
    t = Trainer(config=cfg, data=tiny_data)
    hist = t.train(steps=6)
    assert np.all(np.isfinite(hist["d_loss"]))
    # every critic weight inside the ball; generator untouched by the
    # projection (its weights exceed sigma=1 already at init: 784-dim
    # outputs make init sigma > 1 with near-certainty)
    assert _max_sigma(t.state["d_params"]) <= 1.0 + 0.06
    assert _max_sigma(t.state["g_params"]) > 1.0


def test_composes_with_ema_and_conv(tiny_data):
    """All three cross-cutting mechanisms at once on the conv stacks:
    spectral projection (d_post), generator EMA (carried state), and
    the conv architecture — the framework's hooks must not interfere."""
    cfg = tiny_cfg("nsgan", spectral_projection=True, ema_decay=0.99,
                   arch="conv", conv_channels=4, latent_dim=4)
    t = Trainer(config=cfg, data=tiny_data)
    hist = t.train(steps=4)
    assert np.all(np.isfinite(hist["d_loss"]))
    assert _max_sigma(t.state["d_params"]) <= 1.0 + 0.06
    assert "g_ema" in t.state  # EMA carried alongside the projection
    imgs = t.sample(4)         # samples from the EMA weights
    assert np.isfinite(imgs).all()


def test_composes_with_wgan_clip(tiny_data):
    cfg = tiny_cfg("wgan", spectral_projection=True, d_steps=2)
    t = Trainer(config=cfg, data=tiny_data)
    hist = t.train(steps=4)
    assert np.all(np.isfinite(hist["d_loss"]))
    d = t.state["d_params"]
    assert _max_sigma(d) <= 1.0 + 0.06
    flat, _ = jax.flatten_util.ravel_pytree(d)
    assert float(jnp.abs(flat).max()) <= cfg.wgan_clip + 1e-6  # clip held
