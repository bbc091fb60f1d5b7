"""Backend selection policy: Pallas only where it is measured to win —
small batches (benchmarks/crossover_results.json), first-order variants,
TPU available. Everything else gets the XLA twin."""

import pytest

from generative_models_tpu import ops
from generative_models_tpu.ops import linear as linear_mod
from generative_models_tpu.train.trainer import Trainer
from tests.conftest import tiny_cfg


@pytest.fixture
def fake_tpu(monkeypatch):
    monkeypatch.setattr(linear_mod, "pallas_backend_available", lambda: True)
    yield
    ops.set_backend("xla")


def _backend_for(cfg, tiny_data):
    Trainer(config=cfg, data=tiny_data)
    return ops.get_backend()


def test_pallas_at_zoo_batch(tiny_data, fake_tpu):
    assert _backend_for(tiny_cfg("nsgan", batch_size=100), tiny_data) \
        == "pallas"


def test_pallas_default_at_large_batch(tiny_data, fake_tpu):
    # measured crossover (round 2): Pallas wins or ties at every batch,
    # so the default bound is 0 (no restriction)
    assert _backend_for(tiny_cfg("nsgan", batch_size=512), tiny_data) \
        == "pallas"


def test_user_bound_restricts_pallas(tiny_data, fake_tpu):
    assert _backend_for(
        tiny_cfg("nsgan", batch_size=512, pallas_max_batch=256),
        tiny_data) == "xla"
    assert _backend_for(
        tiny_cfg("nsgan", batch_size=256, pallas_max_batch=256),
        tiny_data) == "pallas"


def test_second_order_variants_pin_xla(tiny_data, fake_tpu):
    # custom_vjp kernels have no forward-mode rule; grad-of-grad
    # variants must stay on the XLA path regardless of batch
    assert _backend_for(tiny_cfg("wgangp", batch_size=100), tiny_data) \
        == "xla"


def test_no_pallas_without_tpu(tiny_data):
    assert _backend_for(tiny_cfg("nsgan", batch_size=100), tiny_data) \
        == "xla"
