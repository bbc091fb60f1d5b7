"""Backend selection policy (data-driven, BASELINE.md crossover):

With VALUE-FETCH-FENCED timing the XLA path wins end-to-end at every
measured batch (the earlier "Pallas everywhere" default was an artifact
of the unreliable block_until_ready fence), so XLA is the default and
Pallas is opt-in via use_pallas — still gated by TPU availability,
first-order variants, and pallas_max_batch."""

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


def test_xla_is_default(tiny_data, fake_tpu):
    # measured: XLA +14% at the headline config, wins 512-8192 too
    assert _backend_for(tiny_cfg("nsgan", batch_size=100), tiny_data) \
        == "xla"


def test_pallas_opt_in(tiny_data, fake_tpu):
    assert _backend_for(
        tiny_cfg("nsgan", batch_size=100, use_pallas=True), tiny_data) \
        == "pallas"
    # bound 0 = no batch restriction once opted in
    assert _backend_for(
        tiny_cfg("nsgan", batch_size=512, use_pallas=True), tiny_data) \
        == "pallas"


def test_user_bound_restricts_pallas(tiny_data, fake_tpu):
    assert _backend_for(
        tiny_cfg("nsgan", batch_size=512, use_pallas=True,
                 pallas_max_batch=256),
        tiny_data) == "xla"
    assert _backend_for(
        tiny_cfg("nsgan", batch_size=256, use_pallas=True,
                 pallas_max_batch=256),
        tiny_data) == "pallas"


def test_second_order_variants_pin_xla(tiny_data, fake_tpu):
    # custom_vjp kernels have no forward-mode rule; grad-of-grad
    # variants must stay on the XLA path regardless of batch
    assert _backend_for(
        tiny_cfg("wgangp", batch_size=100, use_pallas=True), tiny_data) \
        == "xla"


def test_tp_pins_xla(tiny_data, fake_tpu):
    # the whole-MLP kernel is per-device; TP shards weights across
    # devices, so tensor parallelism forces the XLA path
    import jax
    from generative_models_tpu.parallel.tp import make_mesh_2d
    devs = jax.devices("cpu")
    if len(devs) < 2:
        pytest.skip("need 2 devices")
    mesh = make_mesh_2d(1, 2, devices=devs)
    cfg = tiny_cfg("nsgan", batch_size=16, use_pallas=True, tp=2)
    Trainer(config=cfg, data=tiny_data, mesh=mesh)
    assert ops.get_backend() == "xla"


def test_no_pallas_without_tpu(tiny_data):
    assert _backend_for(
        tiny_cfg("nsgan", batch_size=100, use_pallas=True), tiny_data) \
        == "xla"


def test_dtype_auto_policy():
    """Config.dtype="auto" (the default) resolves by the MEASURED conv
    bf16 crossover (VERDICT r2 next #6): f32 for mlp everywhere and for
    conv below the crossover batch / off-TPU; bf16 for conv at or above
    it on a real TPU. Explicit dtypes always win."""
    from generative_models_tpu.config import (
        CONV_BF16_CROSSOVER_BATCH,
        resolve_dtype,
        variant_config,
    )

    assert variant_config("nsgan").dtype == "auto"
    assert resolve_dtype(variant_config("nsgan"), "tpu") == "float32"
    assert resolve_dtype(
        variant_config("nsgan", arch="conv", batch_size=100),
        "tpu") == "float32"
    big = variant_config("nsgan", arch="conv",
                         batch_size=CONV_BF16_CROSSOVER_BATCH)
    assert resolve_dtype(big, "tpu") == "bfloat16"
    assert resolve_dtype(big, "cpu") == "float32"
    assert resolve_dtype(
        variant_config("nsgan", arch="conv", batch_size=4096,
                       dtype="float32"), "tpu") == "float32"
    assert resolve_dtype(
        variant_config("nsgan", dtype="bfloat16"), "cpu") == "bfloat16"


def test_trainer_resolves_auto_dtype(tiny_data, monkeypatch):
    """The Trainer resolves "auto" ONCE at build so every downstream
    consumer sees a concrete dtype."""
    t = Trainer(config=tiny_cfg("nsgan"), data=tiny_data)
    assert t.cfg.dtype == "float32"      # CPU harness

    monkeypatch.setattr(linear_mod, "default_platform", lambda: "tpu")
    t2 = Trainer(config=tiny_cfg("nsgan", arch="conv", batch_size=512,
                                 conv_channels=4, fused_step=False),
                 data=tiny_data)
    assert t2.cfg.dtype == "bfloat16"
    t3 = Trainer(config=tiny_cfg("nsgan", arch="conv", batch_size=512,
                                 conv_channels=4, fused_step=False,
                                 dtype="float32"),
                 data=tiny_data)
    assert t3.cfg.dtype == "float32"


def test_vq_decode_default_follows_measured_ab():
    """Config.vq_decode's default must equal the committed serving
    A/B's winner at the gallery batch for BOTH archs — the
    "defaults follow measurements" rule, made structural (round 5;
    the round-4 default cited this measurement before it existed)."""
    import json
    import os

    from generative_models_tpu.config import Config

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "vq_decode_ab.json")
    with open(path) as f:
        ab = json.load(f)
    winners = {ab["winner_by_arch_batch"][arch]["64"]
               for arch in ("mlp", "conv")}
    assert winners == {Config.vq_decode}, (
        f"measured winners {winners} != shipped default "
        f"{Config.vq_decode!r} — re-run benchmarks/vq_decode_ab.py or "
        f"fix the default")


def test_flow_guidance_default_follows_measured_ablation():
    """Conditional flow's default guidance must equal the committed
    ablation's FID winner, and DDPM must keep 0 (its own ablation
    measured monotone degradation) — the "defaults follow
    measurements" rule for the round-5 guidance findings."""
    import json
    import os

    from generative_models_tpu.config import (
        FLOW_GUIDANCE_DEFAULT, variant_config,
    )

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "flow_guidance.json")
    with open(path) as f:
        ab = json.load(f)
    # winner = scale with the best (lowest) worst-seed FID
    winner = min(ab["ranges_by_scale"].items(),
                 key=lambda kv: kv[1]["fid_range"][1])[0]
    assert float(winner) == FLOW_GUIDANCE_DEFAULT, (
        f"measured winner w={winner} != shipped default "
        f"{FLOW_GUIDANCE_DEFAULT} — re-run the flow guidance ablation "
        f"or fix the default")
    assert variant_config(
        "flow", ddpm_cond=True).ddpm_guidance == FLOW_GUIDANCE_DEFAULT
    # explicit user pin always wins; unconditional flow has no guidance
    assert variant_config("flow", ddpm_cond=True,
                          ddpm_guidance=0.0).ddpm_guidance == 0.0
    assert variant_config("flow").ddpm_guidance == 0.0
    # with label dropout disabled the null token is never trained, so
    # guided extrapolation would mix a random-init branch: default 0,
    # and an EXPLICIT guidance>0 with label_drop=0 is refused outright
    # (Config.__post_init__ — the invariant lives at validation
    # altitude, not just in the default resolver)
    assert variant_config("flow", ddpm_cond=True,
                          ddpm_label_drop=0.0).ddpm_guidance == 0.0
    import pytest

    with pytest.raises(ValueError, match="label_drop"):
        variant_config("flow", ddpm_cond=True, ddpm_label_drop=0.0,
                       ddpm_guidance=0.3)
    # ddpm's own ablation measured the opposite: default stays 0
    assert variant_config("ddpm", ddpm_cond=True).ddpm_guidance == 0.0
