"""Reflow / 2-rectified flow (train/reflow.py + losses/flow.py
flow_reflow branch) — beyond-reference capability tests: pair-dataset
contracts (stored couplings reproduce the teacher ODE exactly), the
paired-x0 loss branch pinned against hand math, config/Trainer guards,
teacher checkpoint loading, and the end-to-end distillation loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generative_models_tpu.losses.flow import (
    FLOW,
    _integrate,
    generate_pairs,
    loss,
)
from generative_models_tpu.train.reflow import (
    build_reflow_data,
    init_student,
    load_teacher_params,
)
from generative_models_tpu.train.trainer import Trainer
from tests.conftest import tiny_cfg


def test_config_validation():
    with pytest.raises(ValueError, match="flow variant only"):
        tiny_cfg("ddpm", flow_reflow=True)
    with pytest.raises(ValueError, match="unconditional"):
        tiny_cfg("flow", flow_reflow=True, ddpm_cond=True)
    with pytest.raises(ValueError, match="uint8"):
        tiny_cfg("flow", flow_reflow=True, data_storage="uint8")
    tiny_cfg("flow", flow_reflow=True)  # valid combination


def test_generate_pairs_contract():
    """Rows are [x1_hat in [0,1] | x0 raw] of width 2*image_dim;
    re-integrating the stored x0 through the teacher reproduces the
    stored x1_hat bit-for-bit (same clip encoding sample() uses) —
    across the chunked host loop, including a trimmed last chunk."""
    cfg = tiny_cfg("flow", flow_sample_steps=4)
    params = FLOW.init_params(jax.random.PRNGKey(0), cfg)
    d = cfg.image_dim
    n = 10  # batch_size=4 -> chunks of 4, 4, 2(trimmed)
    pairs = np.asarray(generate_pairs(params, jax.random.PRNGKey(1), n,
                                      cfg, batch_size=4))
    assert pairs.shape == (n, 2 * d)
    x1, x0 = pairs[:, :d], pairs[:, d:]
    assert x1.min() >= 0.0 and x1.max() <= 1.0
    # x0 is a raw prior draw, not [0,1]-encoded
    assert x0.min() < -0.5 and x0.max() > 0.5
    re = jnp.clip((_integrate(params, jnp.asarray(x0), cfg) + 1.0) * 0.5,
                  0.0, 1.0)
    np.testing.assert_array_equal(np.asarray(re), x1)

    # determinism per key, fresh draws per fresh key
    again = np.asarray(generate_pairs(params, jax.random.PRNGKey(1), n,
                                      cfg, batch_size=4))
    np.testing.assert_array_equal(pairs, again)
    other = np.asarray(generate_pairs(params, jax.random.PRNGKey(2), n,
                                      cfg, batch_size=4))
    assert np.abs(pairs[:, d:] - other[:, d:]).max() > 0


def test_reflow_loss_uses_paired_x0():
    """With the zero-init net (prediction exactly 0) the reflow loss is
    the PAIRED bridge energy mean((2*x1-1 - x0)^2) — computed from the
    batch's stored columns, independent of the rng (the x0 draw that
    dominates the non-reflow branch is ignored)."""
    cfg = tiny_cfg("flow", flow_reflow=True)
    params = FLOW.init_params(jax.random.PRNGKey(0), cfg)
    d = cfg.image_dim
    rs = np.random.RandomState(3)
    x1 = rs.rand(32, d).astype(np.float32)
    x0 = rs.randn(32, d).astype(np.float32)
    batch = {"image": jnp.asarray(np.concatenate([x1, x0], 1))}
    expected = float(np.mean((2.0 * x1 - 1.0 - x0) ** 2))
    v1, _ = loss(params, batch, jax.random.PRNGKey(1), cfg)
    v2, _ = loss(params, batch, jax.random.PRNGKey(2), cfg)
    np.testing.assert_allclose(float(v1), expected, rtol=1e-6)
    np.testing.assert_allclose(float(v2), expected, rtol=1e-6)


def test_trainer_rejects_unpaired_data(tiny_data):
    cfg = tiny_cfg("flow", flow_reflow=True)
    with pytest.raises(ValueError, match="2\\*image_dim"):
        Trainer(config=cfg, data=tiny_data)


def test_load_teacher_params_prefers_ema(tmp_path, tiny_data):
    cfg = tiny_cfg("flow")
    t = Trainer(config=cfg, data=tiny_data)
    t.train(steps=2, sample_every=-1)
    path = t.save_model(str(tmp_path / "teacher"))
    loaded = load_teacher_params(path, cfg)
    ref = jax.tree_util.tree_leaves(t.state["ema"])
    got = jax.tree_util.tree_leaves(loaded)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reflow_end_to_end(tiny_data):
    """The full distillation loop: teacher -> couplings -> student
    (teacher-init, fresh optimizer) -> training reduces the coupling
    regression loss -> 1-step sampling stays finite and in range."""
    cfg = tiny_cfg("flow", batch_size=32, scan_steps=5)
    teacher = Trainer(config=cfg, data=tiny_data)
    teacher.train(steps=20, sample_every=-1)
    tp = teacher.state["ema"]

    data = build_reflow_data(tp, cfg, n_train=256, n_test=64,
                             gen_steps=4, gen_solver="euler",
                             batch_size=128)
    assert data["x_train"].shape == (256, 2 * cfg.image_dim)
    assert data["x_test"].shape == (64, 2 * cfg.image_dim)

    scfg = cfg.replace(flow_reflow=True)
    student = Trainer(config=scfg, data=data)
    init_student(student, tp)
    # teacher-init: the student's params start AT the teacher weights
    for a, b in zip(jax.tree_util.tree_leaves(student.state["params"]),
                    jax.tree_util.tree_leaves(tp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    hist = student.train(steps=60, sample_every=-1)
    losses = np.asarray(hist["loss"])
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-10:]) < np.mean(losses[:5])
    # held-out teacher couplings evaluate (the distillation val loss)
    ev = student.evaluate("test", max_batches=1)
    assert np.isfinite(ev["loss"])
    # the reflow payoff path: 1-step Euler sampling
    one = np.asarray(
        FLOW.sample(student.state["ema"], jax.random.PRNGKey(5), 8,
                    scfg.replace(flow_sample_steps=1)))
    assert one.shape == (8, cfg.image_dim)
    assert np.isfinite(one).all()
    assert one.min() >= 0.0 and one.max() <= 1.0
