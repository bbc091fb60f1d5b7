"""Held-out evaluation (Trainer.evaluate): no state mutation, sane
metrics, works for adversarial and single-model variants."""

import copy

import jax
import numpy as np

from generative_models_tpu.train.trainer import Trainer
from tests.conftest import tiny_cfg


def test_evaluate_vae(tiny_data):
    t = Trainer(config=tiny_cfg("vae"), data=tiny_data)
    t.train(steps=10)
    before = jax.tree.map(lambda a: np.asarray(a).copy(), t.state["params"])
    m = t.evaluate("test")
    assert "loss" in m and np.isfinite(m["loss"])
    after = jax.tree.leaves(t.state["params"])
    for x, y in zip(jax.tree.leaves(before), after):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # eval loss should improve with more training
    t.train(steps=200)
    m2 = t.evaluate("test")
    assert m2["loss"] < m["loss"]


def test_evaluate_gan(tiny_data):
    t = Trainer(config=tiny_cfg("nsgan"), data=tiny_data)
    t.train(steps=10)
    m = t.evaluate("test", max_batches=2)
    assert "d_loss" in m and "g_loss" in m
    assert np.isfinite(m["d_loss"]) and np.isfinite(m["g_loss"])


def test_evaluate_train_split(tiny_data):
    t = Trainer(config=tiny_cfg("nsgan"), data=tiny_data)
    t.train(steps=5)
    m = t.evaluate("train", max_batches=2)
    assert np.isfinite(m["d_loss"])
