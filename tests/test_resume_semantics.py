"""Split-run determinism: training 12 steps in one call must equal
6 + 6 across two calls (the data order is a pure function of the
global step via the per-epoch fold_in permutations), and equal a
checkpoint-restore continuation — the exact-resume story. Both
checkpoint backends (npz, orbax) are exercised."""

import numpy as np
import pytest

from generative_models_tpu.train.trainer import Trainer
from tests.conftest import tiny_cfg


def test_split_training_matches_single_run(tiny_data):
    t1 = Trainer(config=tiny_cfg("nsgan"), data=tiny_data)
    h1 = t1.train(steps=12)

    t2 = Trainer(config=tiny_cfg("nsgan"), data=tiny_data)
    a = t2.train(steps=6)
    b = t2.train(steps=6)
    np.testing.assert_allclose(h1["d_loss"], a["d_loss"] + b["d_loss"],
                               rtol=1e-6)
    np.testing.assert_allclose(h1["g_loss"], a["g_loss"] + b["g_loss"],
                               rtol=1e-6)


@pytest.mark.parametrize("backend", ["npz", "orbax"])
def test_checkpoint_resume_continues_trajectory(tiny_data, tmp_path, backend):
    t1 = Trainer(config=tiny_cfg("vae", ckpt_backend=backend),
                 data=tiny_data)
    h1 = t1.train(steps=10)

    t2 = Trainer(config=tiny_cfg("vae", ckpt_backend=backend),
                 data=tiny_data)
    t2.train(steps=5)
    ck = str(tmp_path / "ck")
    t2.save_model(ck)

    t3 = Trainer(config=tiny_cfg("vae", ckpt_backend=backend),
                 data=tiny_data)
    t3.load_model(ck)
    h3 = t3.train(steps=5)
    np.testing.assert_allclose(h1["loss"][5:], h3["loss"], rtol=1e-6)


@pytest.mark.parametrize("backend", ["npz", "orbax"])
def test_checkpoint_roundtrip_adversarial_state(tiny_data, tmp_path, backend):
    """Full-state round-trip for a variant with vstate (BEGAN k_t)."""
    import jax

    t = Trainer(config=tiny_cfg("began", ckpt_backend=backend),
                data=tiny_data)
    t.train(steps=6)
    ck = str(tmp_path / "ck2")
    t.save_model(ck)

    t2 = Trainer(config=tiny_cfg("began", ckpt_backend=backend),
                 data=tiny_data)
    t2.load_model(ck)
    for a, b in zip(jax.tree.leaves(t.state), jax.tree.leaves(t2.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_restore_rejects_shape_mismatch(tiny_data, tmp_path):
    """A checkpoint from a different config must raise, not silently
    reshape/recast (ADVICE r1): hidden_dim 32 vs 16 changes leaf shapes
    but can keep sizes compatible in edge cases — either way it must
    fail loudly with the offending leaf named."""
    t = Trainer(config=tiny_cfg("nsgan"), data=tiny_data)
    ck = str(tmp_path / "ck3")
    t.save_model(ck)

    t2 = Trainer(config=tiny_cfg("nsgan", hidden_dim=16), data=tiny_data)
    with pytest.raises(ValueError, match="shape"):
        t2.load_model(ck)
