"""End-to-end smoke: the minimum slice (SURVEY.md §9.2) on the tiny
synthetic dataset — losses finite, state advances, sampling and
checkpoint round-trip work."""

import os

import numpy as np
import pytest

from generative_models_tpu.train.trainer import Trainer
from tests.conftest import tiny_cfg


def make_trainer(variant, tiny_data, **kw):
    cfg = tiny_cfg(variant, **kw)
    return Trainer(config=cfg, data=tiny_data)


def test_nsgan_smoke(tiny_data, tmp_path):
    t = make_trainer("nsgan", tiny_data)
    hist = t.train(steps=12)
    assert len(hist["d_loss"]) == 12
    assert np.all(np.isfinite(hist["d_loss"]))
    assert np.all(np.isfinite(hist["g_loss"]))
    assert int(t.state["step"]) == 12

    imgs = t.sample(8)
    assert imgs.shape == (8, 784)
    assert np.isfinite(imgs).all()

    path = t.generate_images(tag="test", out_dir=str(tmp_path))
    assert os.path.exists(path) and os.path.getsize(path) > 100


def test_checkpoint_roundtrip(tiny_data, tmp_path):
    t = make_trainer("nsgan", tiny_data)
    t.train(steps=6)
    ckpt = str(tmp_path / "ck")
    t.save_model(ckpt)

    t2 = make_trainer("nsgan", tiny_data)
    t2.load_model(ckpt)
    assert int(t2.state["step"]) == 6
    a = np.asarray(t.state["g_params"][0]["w"])
    b = np.asarray(t2.state["g_params"][0]["w"])
    np.testing.assert_array_equal(a, b)
    # optimizer state restored too (reference only saved params)
    import jax
    for x, y in zip(jax.tree.leaves(t.state["g_opt"]),
                    jax.tree.leaves(t2.state["g_opt"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_determinism_same_seed(tiny_data):
    t1 = make_trainer("nsgan", tiny_data)
    t2 = make_trainer("nsgan", tiny_data)
    h1 = t1.train(steps=5)
    h2 = t2.train(steps=5)
    np.testing.assert_allclose(h1["g_loss"], h2["g_loss"], rtol=1e-6)
    np.testing.assert_allclose(h1["d_loss"], h2["d_loss"], rtol=1e-6)


def test_train_reference_signature(tiny_data):
    """The reference's .train(num_epochs, G_lr, D_lr, D_steps) surface."""
    t = make_trainer("nsgan", tiny_data)
    hist = t.train(num_epochs=1, G_lr=1e-4, D_lr=1e-4, D_steps=2)
    assert t.cfg.d_steps == 2
    # one epoch: 512 rows / (2 batches/step * 16) = 16 steps
    assert len(hist["d_loss"]) == 16
