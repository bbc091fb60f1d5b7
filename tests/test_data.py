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
