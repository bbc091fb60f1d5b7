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


def test_shard_map_batch_coupled_losses_match_single_device(
        tiny_data, monkeypatch):
    """RaGAN / FisherGAN / BIR-VAE couple samples through batch
    statistics (relativistic means, omega constraint, batch norm). With
    the statistics pmean'd inside the loss (batch_coupled specs), the
    shard_map trajectory must EQUAL the single-device one — without the
    pmean the per-shard statistics would silently train a different
    objective (ADVICE r1, medium)."""
    from generative_models_tpu.losses import fishergan as fisher_mod
    from generative_models_tpu.losses import ragan as ragan_mod

    pin = lambda rng, n, z_dim: jnp.ones((n, z_dim)) * 0.1
    monkeypatch.setattr(ragan_mod, "compute_noise", pin)
    monkeypatch.setattr(fisher_mod, "compute_noise", pin)

    for variant, keys in (("ragan", ("d_loss", "g_loss")),
                          ("fishergan", ("d_loss", "g_loss"))):
        cfg1 = tiny_cfg(variant)
        t1 = Trainer(config=cfg1, data=tiny_data)
        h1 = t1.train(steps=6)
        cfg8 = tiny_cfg(variant, dp_impl="shard_map")
        t8 = Trainer(config=cfg8, data=tiny_data, mesh=cpu_mesh(8))
        h8 = t8.train(steps=6)
        for k in keys:
            # step 0 must agree tightly (identical objective); later
            # steps drift by reorder-fp amplified through the lambda
            # carry / squared omega terms
            np.testing.assert_allclose(
                h1[k][0], h8[k][0], rtol=2e-4, atol=1e-5,
                err_msg=f"{variant}:{k} step0 shard_map != single-device")
            np.testing.assert_allclose(
                h1[k], h8[k], rtol=5e-3, atol=5e-4,
                err_msg=f"{variant}:{k} shard_map != single-device")


def test_shard_map_birvae_batchnorm_matches_single_device(
        tiny_data, monkeypatch):
    from generative_models_tpu.losses import birvae as birvae_mod

    # pin the channel noise (it enters additively after the batch norm)
    real_normal = jax.random.normal
    monkeypatch.setattr(
        birvae_mod.jax.random, "normal",
        lambda rng, shape, dtype=jnp.float32: jnp.zeros(shape, dtype))
    try:
        t1 = Trainer(config=tiny_cfg("birvae"), data=tiny_data)
        h1 = t1.train(steps=6)
        t8 = Trainer(config=tiny_cfg("birvae", dp_impl="shard_map"),
                     data=tiny_data, mesh=cpu_mesh(8))
        h8 = t8.train(steps=6)
    finally:
        monkeypatch.setattr(birvae_mod.jax.random, "normal", real_normal)
    np.testing.assert_allclose(h1["loss"], h8["loss"], rtol=2e-4,
                               atol=1e-5)


def test_shard_map_real_noise_grads_reduce_correctly(tiny_data):
    """With REAL per-shard noise (rng folded by device rank), the
    pmean'd shard grads must equal the host-side average of the
    per-shard grads computed independently — 'runs' vs 'reduces
    correctly' (VERDICT r1 weak #6)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from generative_models_tpu.losses.registry import get_variant
    from generative_models_tpu.parallel.mesh import DATA_AXIS
    from generative_models_tpu.train import step as step_lib

    n_dev = 8
    mesh = cpu_mesh(n_dev)
    cfg = tiny_cfg("nsgan", batch_size=32)
    spec = get_variant("nsgan")
    state = step_lib.init_state(spec, cfg, jax.random.PRNGKey(7))
    local_b = cfg.batch_size // n_dev
    x = jax.random.uniform(jax.random.PRNGKey(8),
                           (cfg.batch_size, cfg.image_dim))
    key = jax.random.PRNGKey(9)

    def local_grads(d_params, g_params, x_shard):
        r = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        batch = {"image": x_shard,
                 "label": jnp.zeros((x_shard.shape[0],), jnp.int32)}
        (_, _), grads = jax.value_and_grad(spec.d_loss, has_aux=True)(
            d_params, g_params, batch, r, {}, cfg)
        return jax.lax.pmean(grads, DATA_AXIS)

    sm = jax.jit(shard_map(
        local_grads, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    ))
    g_sm = sm(state["d_params"], state["g_params"], x)

    # host-side: same per-shard rng and rows, averaged
    accum = None
    for p in range(n_dev):
        r = jax.random.fold_in(key, p)
        sl = x[p * local_b:(p + 1) * local_b]
        batch = {"image": sl, "label": jnp.zeros((local_b,), jnp.int32)}
        (_, _), g = jax.value_and_grad(spec.d_loss, has_aux=True)(
            state["d_params"], state["g_params"], batch, r, {}, cfg)
        accum = g if accum is None else jax.tree.map(jnp.add, accum, g)
    g_ref = jax.tree.map(lambda a: a / n_dev, accum)

    for a, b in zip(jax.tree.leaves(g_sm), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_vae_shard_map_trains(tiny_data):
    cfg = tiny_cfg("vae", dp_impl="shard_map")
    t = Trainer(config=cfg, data=tiny_data, mesh=cpu_mesh(8))
    hist = t.train(steps=6)
    assert np.all(np.isfinite(hist["loss"]))
    # loss should broadly decrease from a cold start
    assert hist["loss"][-1] < hist["loss"][0]


def test_ddpm_jit_dp_matches_single_device(tiny_data):
    """The diffusion family is batch-decoupled (per-sample t/eps draws,
    mean loss): jit-DP over 8 devices must reproduce the single-device
    trajectory like every other variant."""
    outs = []
    for mesh in (None, cpu_mesh(8)):
        cfg = tiny_cfg("ddpm")
        t = Trainer(config=cfg, data=tiny_data, mesh=mesh)
        outs.append(np.array(t.train(steps=6)["loss"]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=1e-5)


def test_ddpm_shard_map_trains_and_samples(tiny_data):
    cfg = tiny_cfg("ddpm", dp_impl="shard_map")
    t = Trainer(config=cfg, data=tiny_data, mesh=cpu_mesh(8))
    hist = t.train(steps=6)
    assert np.all(np.isfinite(hist["loss"]))
    imgs = t.sample(8)
    assert imgs.shape == (8, 784) and np.isfinite(imgs).all()


def test_flow_jit_dp_matches_single_device(tiny_data):
    """Flow matching is batch-decoupled like DDPM (per-sample t/x0
    draws, mean loss): jit-DP over 8 devices must reproduce the
    single-device trajectory."""
    outs = []
    for mesh in (None, cpu_mesh(8)):
        cfg = tiny_cfg("flow")
        t = Trainer(config=cfg, data=tiny_data, mesh=mesh)
        outs.append(np.array(t.train(steps=6)["loss"]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=1e-5)


def test_flow_shard_map_trains_and_samples(tiny_data):
    cfg = tiny_cfg("flow", dp_impl="shard_map")
    t = Trainer(config=cfg, data=tiny_data, mesh=cpu_mesh(8))
    hist = t.train(steps=6)
    assert np.all(np.isfinite(hist["loss"]))
    imgs = t.sample(8)
    assert imgs.shape == (8, 784) and np.isfinite(imgs).all()


def test_vqprior_jit_dp_matches_single_device(tiny_data):
    """The VQ family's loss terms are all per-sample means (recon /
    codebook / commitment sums per row, token CE per position) — the
    joint vqprior trajectory under jit-DP must reproduce single-device.
    (The perplexity METRIC is a batch statistic; under shard_map it is
    a pmean of shard perplexities — diagnostics only, never in the
    gradient.)"""
    outs = []
    for mesh in (None, cpu_mesh(8)):
        cfg = tiny_cfg("vqprior", vq_codebook_size=8, vq_code_dim=4,
                       vq_tokens=4, vq_prior_width=16,
                       vq_prior_layers=1, vq_prior_heads=2)
        t = Trainer(config=cfg, data=tiny_data, mesh=mesh)
        outs.append(np.array(t.train(steps=6)["loss"]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=1e-5)


def test_vqprior_shard_map_trains_and_samples(tiny_data):
    cfg = tiny_cfg("vqprior", dp_impl="shard_map", vq_codebook_size=8,
                   vq_code_dim=4, vq_tokens=4, vq_prior_width=16,
                   vq_prior_layers=1, vq_prior_heads=2)
    t = Trainer(config=cfg, data=tiny_data, mesh=cpu_mesh(8))
    hist = t.train(steps=6)
    assert np.all(np.isfinite(hist["loss"]))
    imgs = t.sample(8)
    assert imgs.shape == (8, 784) and np.isfinite(imgs).all()


def test_shard_map_uint8_storage_bitwise_matches_f32(tiny_data):
    """The shard_map gather's post-gather u8 decode (parallel/dp.py)
    is the same multiply as the host conversion — storage dtype must
    not change the shard_map trajectory at all."""
    cfg32 = tiny_cfg("nsgan", dp_impl="shard_map")
    cfgu8 = tiny_cfg("nsgan", dp_impl="shard_map", data_storage="uint8")
    outs = []
    for cfg in (cfg32, cfgu8):
        t = Trainer(config=cfg, data=tiny_data, mesh=cpu_mesh(4))
        t.train(steps=6, sample_every=-1)
        outs.append(jax.device_get(
            {"g": t.state["g_params"], "d": t.state["d_params"]}))
    jax.tree.map(np.testing.assert_array_equal, outs[0], outs[1])
