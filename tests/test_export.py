"""Serving export (utils/export.py): the StableHLO sampler artifact is
self-contained, deterministic per seed, and matches the framework's
sampler given the same key."""

import jax
import numpy as np
import pytest

from generative_models_tpu.train.trainer import Trainer
from generative_models_tpu.utils.export import (
    load_sampler, save_sampler,
)
from tests.conftest import tiny_cfg


@pytest.mark.parametrize("variant", ["nsgan", "vae", "cgan", "ddpm",
                                     "flow", "vqprior"])
def test_export_roundtrip(variant, tiny_data, tmp_path):
    """ddpm rides too: its exported artifact bakes the whole reverse
    lax.scan chain (the serving path BASELINE.md's images/s-vs-S curve
    measures), not just one net eval. vqprior bakes the ancestral
    token scan (argmin/one-hot/attention/categorical) + the decoder."""
    extra = ({"ddpm_timesteps": 25, "ddpm_beta_end": 0.3}
             if variant == "ddpm" else
             {"vq_codebook_size": 8, "vq_code_dim": 4, "vq_tokens": 4,
              "vq_prior_width": 16, "vq_prior_layers": 1,
              "vq_prior_heads": 2} if variant == "vqprior" else {})
    t = Trainer(config=tiny_cfg(variant, **extra), data=tiny_data)
    t.train(steps=4)
    params = t.generator_params
    path = str(tmp_path / "sampler.shlo")
    save_sampler(path, t.spec, t.cfg, params, n=8)

    fn = load_sampler(path)
    a = np.asarray(fn(0))
    b = np.asarray(fn(0))
    c = np.asarray(fn(1))
    assert a.shape == (8, t.cfg.image_dim)
    np.testing.assert_array_equal(a, b)          # deterministic per seed
    assert not np.array_equal(a, c)              # seed actually matters
    assert a.min() >= 0.0 and a.max() <= 1.0     # sigmoid/Bernoulli head

    # artifact output == framework sampler under the same key
    ours = np.asarray(t.spec.sample(params, jax.random.PRNGKey(0), 8,
                                    t.cfg))
    np.testing.assert_allclose(a, ours, rtol=1e-5, atol=1e-6)


def test_exported_blob_is_framework_free(tiny_data, tmp_path):
    """Deserialization must need only jax.export — no registry/spec."""
    t = Trainer(config=tiny_cfg("nsgan"), data=tiny_data)
    t.train(steps=2)
    path = str(tmp_path / "s.shlo")
    save_sampler(path, t.spec, t.cfg, t.state["g_params"], n=4)
    from jax import export as jax_export
    import jax.numpy as jnp
    exp = jax_export.deserialize(open(path, "rb").read())
    out = np.asarray(exp.call(jnp.int32(7)))
    assert out.shape == (4, 784) and np.isfinite(out).all()


def test_export_forces_xla_and_restores_backend(tiny_data, tmp_path):
    """Export must trace the XLA path even when the Pallas backend is
    globally active (pallas_call can't lower for the cpu platform of a
    multi-platform artifact), and must restore the backend after
    (code-review r2)."""
    from generative_models_tpu import ops
    t = Trainer(config=tiny_cfg("nsgan"), data=tiny_data)
    t.train(steps=2)
    ops.set_backend("pallas")
    try:
        path = save_sampler(str(tmp_path / "s.shlo"), t.spec, t.cfg,
                            t.generator_params, n=4)
        assert ops.get_backend() == "pallas"  # restored
    finally:
        ops.set_backend("xla")
    out = np.asarray(load_sampler(path)(3))
    assert out.shape == (4, 784) and np.isfinite(out).all()
