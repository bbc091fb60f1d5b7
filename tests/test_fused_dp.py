"""Fused-kernel DP composition (ops/pallas_dp.py) — trajectory
equivalence vs the shard_map XLA path on the 8-virtual-CPU-device mesh,
the same bar tests/test_fused_step.py sets for the single-device chunk
kernel (VERDICT r2 next #1). Kernels run in interpret mode under
shard_map; the collective boundaries (lax.pmean) are real."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_models_tpu.losses import get_variant
from generative_models_tpu.ops.pallas_dp import (
    FUSED_DP_VARIANTS,
    build_fused_dp_many_steps,
    fused_dp_supported,
)
from generative_models_tpu.parallel.dp import build_shard_map_many_steps
from generative_models_tpu.parallel.mesh import make_mesh
from generative_models_tpu.train import step as step_lib
from generative_models_tpu.train.trainer import Trainer
from tests.conftest import tiny_cfg

pytestmark = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs 8 virtual cpu devices")

RTOL, ATOL = 2e-4, 2e-5


def cpu_mesh(n):
    return make_mesh(devices=jax.devices("cpu")[:n])


def _data_arrays(tiny_data):
    x = jnp.asarray(tiny_data["x_train"].reshape(
        tiny_data["x_train"].shape[0], -1))
    y = jnp.asarray(tiny_data["y_train"])
    return x, y


def _assert_trees_close(a, b, what):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for xa, xb in zip(la, lb):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=RTOL, atol=ATOL, err_msg=what)


def _run_pair(tiny_data, variant, steps=6, n_dev=8, **kw):
    cfg = tiny_cfg(variant, **kw)
    spec = get_variant(variant)
    ok, reason = fused_dp_supported(spec, cfg)
    assert ok, reason
    x, y = _data_arrays(tiny_data)
    i_rng, p_rng, _ = jax.random.split(jax.random.PRNGKey(cfg.seed), 3)
    state = step_lib.init_state(spec, cfg, i_rng)
    nb = step_lib.batches_per_step(spec, cfg)
    spe = x.shape[0] // (nb * cfg.batch_size)
    perm = jax.vmap(lambda e: jax.random.permutation(
        jax.random.fold_in(p_rng, e), x.shape[0]))(jnp.arange(2))
    rel = jnp.arange(steps, dtype=jnp.int32) * nb * cfg.batch_size
    mesh = cpu_mesh(n_dev)
    ref = build_shard_map_many_steps(spec, cfg, spe, mesh)
    fused = build_fused_dp_many_steps(spec, cfg, spe, mesh,
                                      interpret=True)
    s1, m1 = jax.block_until_ready(ref(state, x, y, perm, rel))
    s2, m2 = jax.block_until_ready(fused(state, x, y, perm, rel))
    return s1, m1, s2, m2


_FAST = ("nsgan", "wgan")  # headline + the ds=5/clip/rmsprop member
_CASES = [v if v in _FAST else pytest.param(v, marks=pytest.mark.slow)
          for v in FUSED_DP_VARIANTS]


@pytest.mark.parametrize("variant", _CASES)
def test_fused_dp_matches_shard_map_xla(tiny_data, variant):
    s1, m1, s2, m2 = _run_pair(tiny_data, variant)
    _assert_trees_close(s1["g_params"], s2["g_params"], "g_params")
    _assert_trees_close(s1["d_params"], s2["d_params"], "d_params")
    _assert_trees_close(s1["g_opt"], s2["g_opt"], "g_opt")
    _assert_trees_close(s1["d_opt"], s2["d_opt"], "d_opt")
    _assert_trees_close(s1["vstate"], s2["vstate"], "vstate")
    _assert_trees_close(m1, m2, "metrics")
    # identical rng chain, not just close
    np.testing.assert_array_equal(np.asarray(s1["rng"]),
                                  np.asarray(s2["rng"]))


@pytest.mark.slow
def test_fused_dp_ema_matches(tiny_data):
    s1, _, s2, _ = _run_pair(tiny_data, "nsgan", ema_decay=0.99)
    _assert_trees_close(s1["g_ema"], s2["g_ema"], "g_ema")


def test_fused_dp_unsupported_reasons():
    for variant, frag in (("ragan", "batch"), ("fishergan", "batch"),
                          ("vae", "single-model"),
                          ("birvae", "single-model")):
        cfg = tiny_cfg(variant)
        ok, reason = fused_dp_supported(get_variant(variant), cfg)
        assert not ok and frag in reason


def test_trainer_fused_dp_matches_xla_trainer(tiny_data):
    """End-to-end through the Trainer: fused_step=True + a data mesh
    routes to the fused-DP builder and reproduces the shard_map XLA
    trainer's trajectory."""
    mesh = cpu_mesh(4)
    t_ref = Trainer(config=tiny_cfg("nsgan", dp_impl="shard_map"),
                    data=tiny_data, mesh=mesh)
    h_ref = t_ref.train(steps=6)
    t_fused = Trainer(config=tiny_cfg("nsgan", fused_step=True),
                      data=tiny_data, mesh=cpu_mesh(4))
    h_fused = t_fused.train(steps=6)
    np.testing.assert_allclose(np.array(h_ref["d_loss"]),
                               np.array(h_fused["d_loss"]),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.array(h_ref["g_loss"]),
                               np.array(h_fused["g_loss"]),
                               rtol=RTOL, atol=ATOL)
    assert int(t_fused.state["step"]) == 6


def test_trainer_fused_dp_reachable_with_cfg_dp(tiny_data):
    """The CLI route sets cfg.dp = N (not just a mesh): --dp 4
    --fused-step must reach the fused-DP builder, not be rejected by
    the single-device kernel's own dp>1 guard (round-3 review: the
    delegation made the documented composition unreachable)."""
    from generative_models_tpu.losses.registry import get_variant
    from generative_models_tpu.ops.pallas_dp import fused_dp_supported
    cfg = tiny_cfg("nsgan", fused_step=True, dp=4)
    ok, reason = fused_dp_supported(get_variant("nsgan"), cfg)
    assert ok, reason
    t = Trainer(config=cfg, data=tiny_data, mesh=cpu_mesh(4))
    hist = t.train(steps=4)
    assert np.all(np.isfinite(hist["d_loss"]))
    assert int(t.state["step"]) == 4


def test_trainer_fused_dp_tp_refused(tiny_data):
    from generative_models_tpu.parallel.tp import make_mesh_2d
    mesh = make_mesh_2d(2, 4, devices=jax.devices("cpu")[:8])
    with pytest.raises(ValueError, match="tensor parallelism"):
        Trainer(config=tiny_cfg("nsgan", fused_step=True, tp=4),
                data=tiny_data, mesh=mesh)


def test_trainer_fused_dp_unsupported_variant_refused(tiny_data):
    with pytest.raises(ValueError, match="batch"):
        Trainer(config=tiny_cfg("ragan", fused_step=True),
                data=tiny_data, mesh=cpu_mesh(4))
