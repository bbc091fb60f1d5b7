"""Tensor-parallelism tests on the 8-virtual-CPU mesh.

The Megatron-style sharding (parallel/tp.py) must be *semantically
invisible*: a dp x tp run is the same computation as single-device,
with XLA inserting the collectives. These tests pin (a) that the
parameters really are sharded (not silently replicated), and (b) that
the trained result matches the single-device trainer to reduction-order
tolerance — which is only possible if the inserted collectives are
correct.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from generative_models_tpu.parallel.tp import (
    MODEL_AXIS, make_mesh_2d, params_pspecs,
)
from generative_models_tpu.train.trainer import Trainer

from conftest import tiny_cfg


def _cpu_mesh(dp, tp):
    devs = jax.devices("cpu")
    if len(devs) < dp * tp:
        pytest.skip(f"need {dp * tp} devices")
    return make_mesh_2d(dp, tp, devices=devs)


def _leaves(tree):
    return jax.tree.leaves(tree)


def _run(variant, tiny_data, mesh=None, steps=8, **kw):
    cfg = tiny_cfg(variant, steps=steps, dp=2, tp=4, use_pallas=False, **kw)
    t = Trainer(config=cfg, data=tiny_data, mesh=mesh)
    t.train(steps=steps)
    return t


@pytest.mark.parametrize("variant", ["nsgan", "vae", "infogan", "began",
                                     "wgan", "cgan"])
def test_tp_matches_single_device(variant, tiny_data):
    """dp=2 x tp=4 trains the same model as one device (same seed)."""
    mesh = _cpu_mesh(2, 4)
    ref = Trainer(config=tiny_cfg(variant, steps=8, use_pallas=False),
                  data=tiny_data)
    ref.train(steps=8)
    t = _run(variant, tiny_data, mesh=mesh)
    # wgan runs torch-convention RMSprop (eps OUTSIDE sqrt,
    # train/optim.py): near-zero grads divide by sqrt(v)≈|g|·0.1, which
    # amplifies the TP-vs-single-device reduction-order fp noise on a
    # handful of (clipped-to-±0.01) leaves — widen atol for it only
    atol = 5e-4 if variant == "wgan" else 1e-5
    for a, b in zip(_leaves(ref.state), _leaves(t.state)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=atol)


def test_tp_params_actually_sharded(tiny_data):
    mesh = _cpu_mesh(2, 4)
    t = _run("nsgan", tiny_data, mesh=mesh)
    w0 = t.state["g_params"][0]["w"]  # [z, h] column-parallel
    w1 = t.state["g_params"][1]["w"]  # [h, 784] row-parallel
    assert w0.sharding.spec == P(None, MODEL_AXIS)
    assert w1.sharding.spec == P(MODEL_AXIS, None)
    assert w0.addressable_shards[0].data.shape[1] * 4 == w0.shape[1]
    assert w1.addressable_shards[0].data.shape[0] * 4 == w1.shape[0]
    # optimizer slots (Adam mu) follow the param sharding — the memory
    # win TP exists for
    mu_leaves = [x for x in jax.tree.leaves(t.state["g_opt"])
                 if getattr(x, "ndim", 0) == 2 and x.shape == w0.shape]
    assert mu_leaves and all(
        m.sharding.spec == P(None, MODEL_AXIS) for m in mu_leaves)


def test_tp_spec_rules():
    """Alternating column/row rules with divisibility guards."""
    rng = jax.random.PRNGKey(0)
    from generative_models_tpu.models.mlp import mlp_init
    # 2-layer net: one Megatron pair
    specs = params_pspecs(mlp_init(rng, [8, 32, 784]), tp=4)
    assert specs[0]["w"] == P(None, MODEL_AXIS)
    assert specs[0]["b"] == P(MODEL_AXIS)
    assert specs[1]["w"] == P(MODEL_AXIS, None)
    assert specs[1]["b"] == P(None)
    # indivisible hidden dim stays replicated end to end
    specs = params_pspecs(mlp_init(rng, [8, 30, 784]), tp=4)
    assert specs[0]["w"] == P(None, None)
    assert specs[1]["w"] == P(None, None)
    # trunk+heads (InfoGAN/encoder shape): trunk ends column-parallel,
    # heads consume the sharded features row-parallel
    from generative_models_tpu.models import nets
    cfg = tiny_cfg("infogan")
    d = nets.infogan_d_init(rng, cfg)
    specs = params_pspecs(d, tp=4)
    assert specs["trunk"][-1]["w"] == P(None, MODEL_AXIS)
    assert specs["d_head"]["w"] == P(MODEL_AXIS, None)
    assert specs["q_head"]["w"] == P(MODEL_AXIS, None)


def test_tp_checkpoint_roundtrip(tiny_data, tmp_path):
    """save -> load under TP keeps values AND re-applies shardings."""
    mesh = _cpu_mesh(2, 4)
    t = _run("nsgan", tiny_data, mesh=mesh)
    path = str(tmp_path / "ck.npz")
    t.save_model(path)
    before = [np.asarray(x) for x in _leaves(t.state)]
    step_before = int(t.state["step"])
    t2 = Trainer(config=t.cfg, data=tiny_data, mesh=mesh)
    t2.load_model(path)
    for a, b in zip(before, _leaves(t2.state)):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert t2.state["g_params"][0]["w"].sharding.spec == P(None, MODEL_AXIS)
    # and training continues from the restored state
    t2.train(steps=4)
    assert int(t2.state["step"]) == step_before + 4


def test_tp_never_silently_dropped(tiny_data):
    """cfg.tp>1 with a mesh lacking the model axis must raise, not
    train pure-DP while the user believes TP is on (code-review r2)."""
    from generative_models_tpu.parallel.mesh import make_mesh
    devs = jax.devices("cpu")
    if len(devs) < 2:
        pytest.skip("need 2 devices")
    mesh_1d = make_mesh(2, devices=devs)
    with pytest.raises(ValueError, match="model"):
        Trainer(config=tiny_cfg("nsgan", tp=2, use_pallas=False),
                data=tiny_data, mesh=mesh_1d)


def test_cli_builds_2d_mesh_for_tp(monkeypatch, tiny_data):
    """--tp routes through make_mesh_2d (the CLI used to always build
    the 1-D data mesh and silently drop tensor parallelism)."""
    import generative_models_tpu.cli as cli
    captured = {}

    import generative_models_tpu.parallel.tp as tp_mod

    def fake_mesh_2d(dp, tp, devices=None):
        captured["dp_tp"] = (dp, tp)
        return make_mesh_2d(dp, tp, devices=jax.devices("cpu"))

    monkeypatch.setattr(tp_mod, "make_mesh_2d", fake_mesh_2d)

    class Stop(Exception):
        pass

    class FakeTrainer:
        def __init__(self, config=None, mesh=None, **kw):
            captured["mesh_axes"] = mesh.axis_names if mesh else None
            raise Stop

    import generative_models_tpu.train.trainer as tr_mod
    monkeypatch.setattr(tr_mod, "Trainer", FakeTrainer)
    with pytest.raises(Stop):
        cli.main(["--variant", "nsgan", "--dp", "2", "--tp", "4",
                  "--dataset", "synthetic"])
    assert captured["dp_tp"] == (2, 4)
    assert captured["mesh_axes"] == ("data", "model")


def test_tp_degree_mismatch_raises(tiny_data):
    """cfg.tp must equal the mesh's model-axis size — a swapped
    dp/tp factorization must not silently train at the wrong degree."""
    mesh_4x2 = _cpu_mesh(4, 2)
    with pytest.raises(ValueError, match="axis size 2"):
        Trainer(config=tiny_cfg("nsgan", dp=2, tp=4, use_pallas=False),
                data=tiny_data, mesh=mesh_4x2)


def test_tp_second_order_and_sampling(tiny_data):
    """WGAN-GP's grad-of-grad penalty composes with GSPMD-sharded
    params (pure XLA path — custom_vjp is pinned off for second-order
    variants), and sampling/evaluate work from a TP-sharded state."""
    mesh = _cpu_mesh(2, 4)
    ref = Trainer(config=tiny_cfg("wgangp", steps=4, use_pallas=False),
                  data=tiny_data)
    ref.train(steps=4)
    t = _run("wgangp", tiny_data, mesh=mesh, steps=4)
    for a, b in zip(_leaves(ref.state), _leaves(t.state)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)
    imgs = t.sample(8)
    assert imgs.shape == (8, 784) and np.isfinite(imgs).all()
    m = t.evaluate("test", max_batches=2)
    assert all(np.isfinite(v) for v in m.values())


def test_model_mesh_with_tp1_raises(tiny_data):
    """The guard fires in BOTH directions: a model-axis mesh passed
    while cfg.tp=1 must raise cleanly, not silently train TP or die
    mid-device_put with a divisibility error (code-review r2, pass 3)."""
    mesh = _cpu_mesh(2, 4)
    with pytest.raises(ValueError, match="axis size 4"):
        Trainer(config=tiny_cfg("nsgan", use_pallas=False),
                data=tiny_data, mesh=mesh)


_TINY_VQ = dict(vq_prior_width=32, vq_prior_layers=1, vq_tokens=4,
                vq_codebook_size=16, vq_code_dim=4)


@pytest.mark.parametrize("variant,extra", [
    ("vqprior", _TINY_VQ),
    ("vqvae", {k: v for k, v in _TINY_VQ.items() if not
               k.startswith("vq_prior")}),
    ("ddpm", {}),
    ("flow", {}),
])
def test_tp_single_model_variants(variant, extra, tiny_data):
    """The SingleModelSpec families run under dp x tp and match the
    single-device trainer (VERDICT r4 weak #2: `--variant vqprior
    --tp 2` used to die with a raw TypeError on the prior's embedding
    arrays). The transformer prior gets real Megatron block rules;
    leaves with no rule (embeddings, codebook, conv kernels) replicate
    — semantically invisible either way."""
    mesh = _cpu_mesh(2, 4)
    ref = Trainer(config=tiny_cfg(variant, steps=8, use_pallas=False,
                                  **extra), data=tiny_data)
    ref.train(steps=8)
    t = _run(variant, tiny_data, mesh=mesh, **extra)
    for a, b in zip(_leaves(ref.state), _leaves(t.state)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)
    imgs = t.sample(8)
    assert imgs.shape == (8, 784) and np.isfinite(np.asarray(imgs)).all()


def test_tp_prior_megatron_rules(tiny_data):
    """vqprior under TP: transformer qkv/fc1 column-parallel, proj/fc2
    row-parallel, embeddings/codebook replicated — and the sharding is
    real on the mesh (addressable shard is 1/tp of the global)."""
    mesh = _cpu_mesh(2, 4)
    t = _run("vqprior", tiny_data, mesh=mesh, **_TINY_VQ)
    blk = t.state["params"]["prior"]["blocks"][0]
    assert blk["qkv"]["w"].sharding.spec == P(None, MODEL_AXIS)
    assert blk["proj"]["w"].sharding.spec == P(MODEL_AXIS, None)
    assert blk["fc1"]["w"].sharding.spec == P(None, MODEL_AXIS)
    assert blk["fc2"]["w"].sharding.spec == P(MODEL_AXIS, None)
    qkv = blk["qkv"]["w"]
    assert qkv.addressable_shards[0].data.shape[1] * 4 == qkv.shape[1]
    # raw array leaves: replicated
    assert t.state["params"]["prior"]["tok"].sharding.spec == P()
    assert t.state["params"]["vqvae"]["codebook"].sharding.spec == P()


def test_tp_prior_width_indivisible_replicates(tiny_data):
    """A prior width that doesn't divide tp must replicate the block
    (never crash, never shard a ragged axis)."""
    from generative_models_tpu.parallel.tp import params_pspecs
    from generative_models_tpu.losses.registry import get_variant
    from generative_models_tpu.train import step as step_lib

    cfg = tiny_cfg("vqprior", vq_prior_width=30, vq_prior_heads=2,
                   vq_prior_layers=1, vq_tokens=4, vq_codebook_size=16,
                   vq_code_dim=4)
    state = step_lib.init_state(get_variant("vqprior"), cfg,
                                jax.random.PRNGKey(0))
    ps = params_pspecs(state["params"], 4)
    blk = ps["prior"]["blocks"][0]
    assert blk["qkv"]["w"] == P(None, None)
    assert blk["fc2"]["w"] == P(None, None)


def test_tp_with_ema_shards_and_trains(tiny_data):
    """EMA weights shard exactly like g_params under TP and the TP run
    still trains (the EMA update is pure elementwise, partitioned by
    the same SPMD rules)."""
    from generative_models_tpu.losses.registry import get_variant
    from generative_models_tpu.parallel.tp import state_pspecs

    cfg = tiny_cfg("nsgan", tp=4, dp=2, ema_decay=0.9)
    spec = get_variant("nsgan")
    mesh = _cpu_mesh(2, 4)
    t = Trainer(config=cfg, data=tiny_data, mesh=mesh)
    ps = state_pspecs(spec, cfg, t.state)
    assert ps["g_ema"] == ps["g_params"]
    t.train(steps=4, sample_every=-1)
    assert "g_ema" in t.state
    imgs = t.sample(4)  # sampling comes from the (sharded) EMA
    assert np.isfinite(imgs).all()
