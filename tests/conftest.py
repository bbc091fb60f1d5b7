"""Test harness config.

Tests run on CPU with 8 virtual devices (SURVEY.md §5: the JAX analogue
of a fake distributed backend) so the whole suite — including DP
sharding tests — passes without TPU hardware. Pallas kernels are
covered via interpret mode plus their XLA twins; TPU-compiled kernel
runs happen in bench/integration, not here.

The env vars MUST be set before jax initializes, hence before any
import of jax at collection time.

RUN THE FULL SUITE SHARDED: ``pytest tests/ -q -n 4`` (pytest-xdist).
A single process accumulates hundreds of XLA:CPU (LLVM) compilations
over the full suite and the compiler eventually SEGFAULTS in
backend_compile_and_load (reproduced at ~500 tests in, multiple
sessions, different tests each time; every file passes solo).
Worker sharding keeps each process's compilation count in the safe
range — and is ~2x faster. Individual files/tests run fine unsharded.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# the fused-auto micro A/B never fires on the CPU harness (platform
# gate), but tests that fake a TPU platform must not trigger a real
# measurement — static-list fallback unless a test opts in
os.environ.setdefault("GMTPU_FUSED_AB", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Under the axon TPU tunnel, the TPU plugin registers even with
# JAX_PLATFORMS=cpu and stays the default backend; pin the default
# device to a virtual CPU so tests are hermetic and fast.
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from generative_models_tpu.config import variant_config  # noqa: E402
from generative_models_tpu.data.mnist import synthetic_mnist  # noqa: E402


TINY = dict(
    batch_size=16,
    hidden_dim=32,
    z_dim=8,
    latent_dim=4,
    vae_hidden_dim=32,
    began_ae_hidden=32,
    scan_steps=4,
    sample_n=16,
    seed=0,
    # keep the DDPM reverse chain cheap in tests (full default is 1000)
    ddpm_timesteps=50,
    ddpm_sample_steps=10,
    ddpm_time_dim=16,
    # keep the flow ODE cheap in tests (full default is 50)
    flow_sample_steps=8,
)


@pytest.fixture(scope="session")
def tiny_data():
    return synthetic_mnist(n_train=512, n_test=64, seed=0)


def tiny_cfg(variant, **kw):
    merged = dict(TINY)
    merged.update(kw)
    return variant_config(variant, **merged)


@pytest.fixture
def make_cfg():
    return tiny_cfg
