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


# ------------------------------------------------------------------
# Amortized (Miyato) estimator — round-2 additions
# ------------------------------------------------------------------

def test_amortized_converges_on_fixed_matrix():
    """Repeated single-pair refinement on a FIXED over-the-ball matrix
    drives it inside the ball: the carried-v sigma estimate converges
    to the true top singular value (power iteration), so the projected
    weight's true sigma approaches the target from above."""
    from generative_models_tpu.ops.spectral import (
        init_sn_vectors, project_spectral_amortized,
    )
    params = [{"w": jax.random.normal(jax.random.PRNGKey(4), (40, 24)) * 3.0,
               "b": jnp.zeros(24)}]
    vs = init_sn_vectors(params, iters=1)   # deliberately cold start
    for _ in range(25):
        params, vs = project_spectral_amortized(params, vs, target=1.0)
    assert _svd_sigma(params[0]["w"]) <= 1.0 + 1e-3
    np.testing.assert_array_equal(params[0]["b"], jnp.zeros(24))


def test_amortized_burn_in_matches_fresh_estimate():
    """init_sn_vectors(iters=k) + one amortized pair gives the same
    sigma estimate neighborhood as the fresh k-iteration estimator."""
    from generative_models_tpu.ops.spectral import (
        init_sn_vectors, project_spectral_amortized,
    )
    w = jax.random.normal(jax.random.PRNGKey(5), (64, 48)) * 2.0
    params = [{"w": w, "b": jnp.zeros(48)}]
    vs = init_sn_vectors(params, iters=10)
    out, _ = project_spectral_amortized(params, vs, target=1.0)
    # fresh 10-iter projection of the same weight
    ref = project_spectral(params, target=1.0, iters=10)
    np.testing.assert_allclose(np.asarray(out[0]["w"]),
                               np.asarray(ref[0]["w"]), rtol=2e-3)


def test_trainer_amortized_default_carries_sn_v(tiny_data):
    """sn_mode defaults to "amortized": the trainer carries sn_v in the
    TrainState, the constraint holds after training, and the carried
    vectors are finite unit-norm for every weight leaf."""
    cfg = tiny_cfg("nsgan", spectral_projection=True)
    assert cfg.sn_mode == "amortized"
    t = Trainer(config=cfg, data=tiny_data)
    hist = t.train(steps=8)
    assert np.all(np.isfinite(hist["d_loss"]))
    assert "sn_v" in t.state
    assert _max_sigma(t.state["d_params"]) <= 1.0 + 0.06

    def check(path, leaf):
        if leaf.ndim == 1 and leaf.shape[0] > 0:
            assert np.isclose(float(jnp.linalg.norm(leaf)), 1.0, atol=1e-4)
        return leaf
    jax.tree_util.tree_map_with_path(check, t.state["sn_v"])


def test_fresh_mode_still_selectable(tiny_data):
    cfg = tiny_cfg("nsgan", spectral_projection=True, sn_mode="fresh")
    t = Trainer(config=cfg, data=tiny_data)
    t.train(steps=4)
    assert "sn_v" not in t.state
    assert _max_sigma(t.state["d_params"]) <= 1.0 + 0.06


def test_spectral_on_single_model_variant_refused():
    """ADVICE r1: the flag would be a silent no-op on the VAE family
    (no critic, no d_post hook) — it must be refused at config time."""
    import pytest
    with pytest.raises(ValueError, match="no critic|d_post"):
        tiny_cfg("vae", spectral_projection=True)


def test_amortized_resume_roundtrip(tiny_data, tmp_path):
    """sn_v is part of the TrainState: checkpoint + resume reproduces
    the exact same continued trajectory as uninterrupted training."""
    cfg = tiny_cfg("nsgan", spectral_projection=True)
    t1 = Trainer(config=cfg, data=tiny_data)
    t1.train(steps=6)
    h_straight = t1.train(steps=4)

    t2 = Trainer(config=cfg, data=tiny_data)
    t2.train(steps=6)
    ck = str(tmp_path / "ck_sn")
    t2.save_model(ck)
    t3 = Trainer(config=cfg, data=tiny_data)
    t3.load_model(ck)
    assert "sn_v" in t3.state
    h_resumed = t3.train(steps=4)
    np.testing.assert_allclose(np.asarray(h_straight["d_loss"]),
                               np.asarray(h_resumed["d_loss"]), rtol=1e-6)
