"""Data layer tests: loaders, fallback, on-device pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.data.mnist import (
    synthetic_mnist,
    to_flat_float,
)
from generative_models_tpu.data.pipeline import (
    DeviceData,
    gather_batch,
    make_perm,
)


def test_synthetic_shapes_and_determinism():
    a = synthetic_mnist(64, 16, seed=7)
    b = synthetic_mnist(64, 16, seed=7)
    assert a["x_train"].shape == (64, 28, 28)
    assert a["x_train"].dtype == np.uint8
    np.testing.assert_array_equal(a["x_train"], b["x_train"])
    np.testing.assert_array_equal(a["y_train"], b["y_train"])
    # class-conditioned: images of the same digit correlate more with
    # each other than with other digits on average
    assert len(np.unique(a["y_train"])) == 10


def test_to_flat_float():
    arrs = to_flat_float(synthetic_mnist(32, 8, seed=0))
    x = arrs["x_train"]
    assert x.shape == (32, 784) and x.dtype == np.float32
    assert x.min() >= 0.0 and x.max() <= 1.0
    assert arrs["y_train"].dtype == np.int32


def test_gather_batch_matches_numpy(tiny_data):
    arrs = to_flat_float(tiny_data)
    data = DeviceData(images=jnp.asarray(arrs["x_train"]),
                      labels=jnp.asarray(arrs["y_train"]))
    perm = make_perm(jax.random.PRNGKey(0), data.n)
    batch = gather_batch(data, perm, 32, 16)
    idx = np.asarray(perm)[32:48]
    np.testing.assert_allclose(np.asarray(batch["image"]),
                               arrs["x_train"][idx], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(batch["label"]),
                                  arrs["y_train"][idx])


def test_perm_is_permutation():
    perm = make_perm(jax.random.PRNGKey(3), 100)
    assert sorted(np.asarray(perm).tolist()) == list(range(100))


def test_uint8_storage_bitwise_equal_trajectory(tiny_data, make_cfg):
    """uint8-resident storage decodes post-gather with the same f32 ops
    as the host conversion — training must be BIT-identical."""
    from generative_models_tpu.train.trainer import Trainer

    outs = []
    for storage in ("float32", "uint8"):
        t = Trainer(config=make_cfg("nsgan", data_storage=storage,
                                    val_size=64),
                    data=tiny_data)
        assert t.x_train.dtype == (jnp.uint8 if storage == "uint8"
                                   else jnp.float32)
        t.train(steps=8, sample_every=-1)
        outs.append(jax.device_get(
            {"g": t.state["g_params"], "d": t.state["d_params"]}))
        # eval on the train split decodes too
        assert np.isfinite(t.evaluate("train", max_batches=2)["g_loss"])
    jax.tree.map(np.testing.assert_array_equal, outs[0], outs[1])


def test_uint8_storage_rejects_float_source(tiny_data, make_cfg):
    from generative_models_tpu.train.trainer import Trainer

    float_data = {k: (v.astype(np.float32) / 255.0 if k.startswith("x")
                      else v) for k, v in tiny_data.items()}
    import pytest
    with pytest.raises(ValueError, match="uint8"):
        Trainer(config=make_cfg("nsgan", data_storage="uint8"),
                data=float_data)
