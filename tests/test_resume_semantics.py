"""Split-run determinism: training 12 steps in one call must equal
6 + 6 across two calls (the data order is a pure function of the
global step via the per-epoch fold_in permutations), and equal a
checkpoint-restore continuation — the exact-resume story."""

import numpy as np

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


def test_checkpoint_resume_continues_trajectory(tiny_data, tmp_path):
    t1 = Trainer(config=tiny_cfg("vae"), data=tiny_data)
    h1 = t1.train(steps=10)

    t2 = Trainer(config=tiny_cfg("vae"), data=tiny_data)
    t2.train(steps=5)
    ck = str(tmp_path / "ck")
    t2.save_model(ck)

    t3 = Trainer(config=tiny_cfg("vae"), data=tiny_data)
    t3.load_model(ck)
    h3 = t3.train(steps=5)
    np.testing.assert_allclose(h1["loss"][5:], h3["loss"], rtol=1e-6)
