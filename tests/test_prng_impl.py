"""Config.prng_impl = "rbg" (TPU hardware-RNG path, +25% measured step
throughput — benchmarks/step_anatomy.py). Pins: deterministic per seed,
checkpoint round-trip of the typed key, and that the default stays
threefry (bit-stable, required by the torch-parity suite)."""

import jax
import numpy as np

from generative_models_tpu.train.trainer import Trainer
from tests.conftest import tiny_cfg


def _flat(state):
    out = []
    for x in jax.tree.leaves(state):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            x = jax.random.key_data(x)
        out.append(np.asarray(x))
    return out


def test_rbg_deterministic_and_trains(tiny_data):
    cfg = tiny_cfg("nsgan", prng_impl="rbg")
    t1 = Trainer(config=cfg, data=tiny_data)
    t1.train(steps=8)
    t2 = Trainer(config=cfg, data=tiny_data)
    t2.train(steps=8)
    for a, b in zip(_flat(t1.state), _flat(t2.state)):
        np.testing.assert_array_equal(a, b)
    assert int(t1.state["step"]) == 8
    # and it actually drew DIFFERENT noise than threefry (same seed)
    t3 = Trainer(config=tiny_cfg("nsgan"), data=tiny_data)
    t3.train(steps=8)
    w_rbg = np.asarray(t1.state["g_params"][0]["w"])
    w_fry = np.asarray(t3.state["g_params"][0]["w"])
    assert not np.allclose(w_rbg, w_fry)


def test_rbg_checkpoint_roundtrip(tiny_data, tmp_path):
    cfg = tiny_cfg("nsgan", prng_impl="rbg")
    t = Trainer(config=cfg, data=tiny_data)
    t.train(steps=4)
    t.save_model(str(tmp_path / "ck.npz"))
    t2 = Trainer(config=cfg, data=tiny_data)
    t2.load_model(str(tmp_path / "ck.npz"))
    for a, b in zip(_flat(t.state), _flat(t2.state)):
        np.testing.assert_array_equal(a, b)
    # resumed chain continues identically to an unbroken run
    t.train(steps=4)
    t2.train(steps=4)
    for a, b in zip(_flat(t.state), _flat(t2.state)):
        np.testing.assert_array_equal(a, b)


def test_default_impl_is_threefry(tiny_data):
    t = Trainer(config=tiny_cfg("nsgan"), data=tiny_data)
    assert t.state["rng"].dtype == np.uint32  # raw threefry key


def test_rbg_orbax_roundtrip(tiny_data, tmp_path):
    """orbax serializes typed key arrays natively (npz goes through
    key_data/wrap_key_data — both backends must round-trip rbg)."""
    cfg = tiny_cfg("nsgan", prng_impl="rbg", ckpt_backend="orbax")
    t = Trainer(config=cfg, data=tiny_data)
    t.train(steps=4)
    t.save_model(str(tmp_path / "ck"))
    t2 = Trainer(config=cfg, data=tiny_data)
    t2.load_model(str(tmp_path / "ck"))
    assert str(t2.state["rng"].dtype) == "key<rbg>"
    for a, b in zip(_flat(t.state), _flat(t2.state)):
        np.testing.assert_array_equal(a, b)
