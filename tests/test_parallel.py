"""Data-parallel correctness on the 8-virtual-CPU-device mesh
(SURVEY.md §5 "distributed without a cluster").

- jit path: plain jit with batch sharding constraints is semantically
  IDENTICAL to single-device (XLA partitions one global computation),
  so trajectories must match to fp tolerance.
- shard_map path: explicit per-device gather + lax.pmean grad reduce.
  With noise pinned (zeros), per-device gathers cover exactly the
  global batch, so grads — and hence trajectories — must match the
  single-device run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_models_tpu.losses import minimax as minimax_mod
from generative_models_tpu.train.trainer import Trainer
from generative_models_tpu.parallel.mesh import make_mesh
from tests.conftest import tiny_cfg

pytestmark = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs 8 virtual cpu devices")


def cpu_mesh(n):
    return make_mesh(devices=jax.devices("cpu")[:n])


def run_losses(tiny_data, mesh=None, dp_impl="jit", steps=6, variant="nsgan"):
    cfg = tiny_cfg(variant, dp_impl=dp_impl)
    t = Trainer(config=cfg, data=tiny_data, mesh=mesh)
    hist = t.train(steps=steps)
    return np.array(hist["d_loss"]), np.array(hist["g_loss"]), t


def test_jit_dp_matches_single_device(tiny_data):
    d1, g1, _ = run_losses(tiny_data, mesh=None)
    d8, g8, _ = run_losses(tiny_data, mesh=cpu_mesh(8))
    np.testing.assert_allclose(d1, d8, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(g1, g8, rtol=2e-4, atol=1e-5)


def test_shard_map_dp_matches_single_device_with_pinned_noise(
        tiny_data, monkeypatch):
    # pin the generator noise so per-device draws cannot differ
    monkeypatch.setattr(minimax_mod, "compute_noise",
                        lambda rng, n, z_dim: jnp.ones((n, z_dim)) * 0.1)
    d1, g1, _ = run_losses(tiny_data, mesh=None)
    d8, g8, _ = run_losses(tiny_data, mesh=cpu_mesh(8), dp_impl="shard_map")
    np.testing.assert_allclose(d1, d8, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(g1, g8, rtol=2e-4, atol=1e-5)


def test_shard_map_dp_trains_with_real_noise(tiny_data):
    d8, g8, t = run_losses(tiny_data, mesh=cpu_mesh(4), dp_impl="shard_map")
    assert np.all(np.isfinite(d8)) and np.all(np.isfinite(g8))
    assert int(t.state["step"]) == 6
    # state stays replicated-consistent: sampling works from the
    # replicated params
    imgs = t.sample(8)
    assert np.isfinite(imgs).all()


def test_shard_map_batch_not_divisible_raises(tiny_data):
    from generative_models_tpu.parallel.dp import build_shard_map_many_steps
    from generative_models_tpu.losses.registry import get_variant
    cfg = tiny_cfg("nsgan", batch_size=10)
    with pytest.raises(ValueError, match="not divisible"):
        build_shard_map_many_steps(get_variant("nsgan"), cfg, 4, cpu_mesh(8))


def test_vae_shard_map_trains(tiny_data):
    cfg = tiny_cfg("vae", dp_impl="shard_map")
    t = Trainer(config=cfg, data=tiny_data, mesh=cpu_mesh(8))
    hist = t.train(steps=6)
    assert np.all(np.isfinite(hist["loss"]))
    # loss should broadly decrease from a cold start
    assert hist["loss"][-1] < hist["loss"][0]
