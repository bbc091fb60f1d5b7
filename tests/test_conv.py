"""The conv (DCGAN-style) architecture option — `Config.arch="conv"`.

The reference is MLP-only; the conv stacks are a capability on top
(models/conv.py). These tests pin the contract that makes it safe: the
conv nets sit behind the SAME flat-tensor signatures, so every loss
head, the GP double-backward, checkpointing, and sampling work
unchanged on either architecture.

Cost note: compiling the full scanned train step for a conv variant
takes ~100 s on the CPU test harness (conv_transpose double-VJP), so
the breadth axis (all 14 variants) is tested at the loss-head level —
eager evaluation, where the small conv ops cache across variants — and
the full jitted scan path is pinned on one representative variant.
A one-off full-matrix jit run of all 14 conv variants was verified at
build time; the 6k-step TPU quality sweep exercises them for real
(docs/gallery.md).
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from generative_models_tpu.config import variant_config
from generative_models_tpu.losses.registry import available_variants, get_variant
from generative_models_tpu.models import conv
from generative_models_tpu.train.trainer import Trainer
from tests.conftest import tiny_cfg

CONV_TINY = dict(arch="conv", conv_channels=4, latent_dim=4)


def conv_cfg(variant, **kw):
    merged = dict(CONV_TINY)
    merged.update(kw)
    return tiny_cfg(variant, **merged)


def _batch(cfg, rng):
    kx, ky = jax.random.split(rng)
    return {"image": jax.random.uniform(kx, (cfg.batch_size, 784)),
            "label": jax.random.randint(ky, (cfg.batch_size,), 0,
                                        cfg.num_classes)}


# fast lane: one representative conv composition; the full matrix is
# minutes of CPU conv autodiff (VERDICT r2 #5)
@pytest.mark.parametrize("variant", [
    v if v == "nsgan" else pytest.param(v, marks=pytest.mark.slow)
    for v in available_variants()])
def test_every_loss_head_composes_on_conv(variant):
    """Breadth axis: every variant's loss fns + grads are finite and
    nonzero on the conv stacks (eager; see the module cost note)."""
    cfg = conv_cfg(variant)
    spec = get_variant(variant)
    rng = jax.random.PRNGKey(0)
    batch = _batch(cfg, rng)
    if spec.adversarial:
        g = spec.init_g(jax.random.PRNGKey(1), cfg)
        d = spec.init_d(jax.random.PRNGKey(2), cfg)
        vstate = spec.init_vstate(cfg)
        (d_loss, _), d_grads = jax.value_and_grad(
            lambda p: spec.d_loss(p, g, batch, rng, vstate, cfg),
            has_aux=True)(d)
        (g_loss, _), g_grads = jax.value_and_grad(
            lambda p: spec.g_loss(p, d, batch, rng, vstate, cfg),
            has_aux=True)(g)
        for name, val, grads in [("d", d_loss, d_grads),
                                 ("g", g_loss, g_grads)]:
            assert np.isfinite(float(val)), f"{variant}:{name}_loss"
            flat, _ = jax.flatten_util.ravel_pytree(grads)
            flat = np.asarray(flat)
            assert np.isfinite(flat).all(), f"{variant}:{name}_grads"
            assert np.abs(flat).max() > 0, f"{variant}:{name}_grads all-zero"
        imgs = spec.sample(g, rng, 4, cfg)
    else:
        p = spec.init_params(jax.random.PRNGKey(1), cfg)
        (loss, _), grads = jax.value_and_grad(
            lambda q: spec.loss(q, batch, rng, cfg), has_aux=True)(p)
        assert np.isfinite(float(loss)), variant
        flat, _ = jax.flatten_util.ravel_pytree(grads)
        assert np.isfinite(np.asarray(flat)).all(), variant
        imgs = spec.sample(p, rng, 4, cfg)
    imgs = np.asarray(imgs)
    assert imgs.shape == (4, 784)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0


def test_nsgan_trains_end_to_end_on_conv(tiny_data):
    """Depth axis: the full jitted scan path (gather -> D step -> G step
    -> metrics) on the conv stacks, plus sampling."""
    t = Trainer(config=conv_cfg("nsgan"), data=tiny_data)
    hist = t.train(steps=4)
    for k, v in hist.items():
        assert np.all(np.isfinite(v)), f"nsgan-conv:{k} non-finite"
    assert int(t.state["step"]) == 4
    imgs = t.sample(8)
    assert imgs.shape == (8, 784)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0


def test_groupnorm_is_per_sample():
    """The design reason GroupNorm replaces DCGAN's BatchNorm: sample i's
    output must not depend on sample j, so shard_map DP semantics equal
    single-device for every variant (losses/base.py batch_coupled
    contract stays MLP-identical)."""
    rng = jax.random.PRNGKey(0)
    params = conv.gn_init(8)
    x = jax.random.normal(rng, (4, 7, 7, 8))
    full = conv.gn_apply(params, x)
    perturbed = x.at[3].set(x[3] * 100.0 + 5.0)
    np.testing.assert_array_equal(
        np.asarray(full[:3]), np.asarray(conv.gn_apply(params, perturbed)[:3]))


def test_conv_critic_is_twice_differentiable():
    """WGAN-GP/DRAGAN need grad-of-grad THROUGH the conv critic."""
    cfg = variant_config("wgangp", arch="conv", conv_channels=4)
    d = conv.discriminator_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 784))

    def penalty(params):
        g = jax.vmap(jax.grad(
            lambda xi: conv.discriminator_apply(params, xi[None], cfg)[0]))(x)
        return jnp.mean((jnp.linalg.norm(g.reshape(2, -1), axis=1) - 1.0) ** 2)

    grads = jax.grad(penalty)(d)
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.abs(flat).max()) > 0.0


def test_conv_bfloat16_compute_path():
    """Regression: layer 2 of a conv stack receives an already-bf16
    input; the kernel must be cast unconditionally or lax.conv raises
    a mixed-dtype TypeError (found by review, confirmed by repro)."""
    cfg = variant_config("began", arch="conv", conv_channels=4,
                         dtype="bfloat16", batch_size=8, z_dim=8)
    d = conv.discriminator_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 784))
    logits = conv.discriminator_apply(d, x, cfg)
    assert logits.shape == (2,) and np.isfinite(np.asarray(logits)).all()
    ae = conv.began_d_init(jax.random.PRNGKey(2), cfg)
    recon = conv.began_d_apply(ae, x, cfg)  # norm-free decoder path
    assert recon.shape == (2, 784)
    g = conv.generator_init(jax.random.PRNGKey(3), cfg)
    imgs = conv.generator_apply(g, jnp.zeros((2, cfg.z_dim)), cfg)
    assert np.isfinite(np.asarray(imgs)).all()
    # the GRAD must also trace: with an explicit f32 conv output the
    # conv transpose mixes an f32 cotangent with the bf16 kernel and
    # raises (second half of the same review finding)
    spec = get_variant("nsgan")
    rng = jax.random.PRNGKey(4)
    batch = _batch(cfg, rng)
    gg = spec.init_g(jax.random.PRNGKey(5), cfg)
    grads = jax.grad(
        lambda p: spec.d_loss(p, gg, batch, rng, {}, cfg)[0])(d)
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert np.isfinite(np.asarray(flat)).all()


def test_conv_init_matches_torch_default_bound():
    """Conv kernels follow the same U(+-1/sqrt(fan_in)) convention the
    dense stack pins against torch (models/mlp.py docstring)."""
    layer = conv.conv_init(jax.random.PRNGKey(0), 4, 4, 3, 16)
    bound = 1.0 / (4 * 4 * 3) ** 0.5
    w = np.asarray(layer["w"])
    assert w.shape == (4, 4, 3, 16)
    assert np.abs(w).max() <= bound
    assert np.abs(w).max() > 0.8 * bound  # actually fills the range


def test_conv_upsample_shapes():
    cfg = variant_config("nsgan", arch="conv", conv_channels=4, z_dim=8)
    g = conv.generator_init(jax.random.PRNGKey(0), cfg)
    out = conv.generator_apply(g, jnp.zeros((3, 8)), cfg)
    assert out.shape == (3, 784)
    d = conv.discriminator_init(jax.random.PRNGKey(1), cfg)
    logits = conv.discriminator_apply(d, out, cfg)
    assert logits.shape == (3,)


def test_conv_loss_is_batch_decoupled_under_shard_map(monkeypatch):
    """The GroupNorm design claim, pinned at the objective level: the
    conv NSGAN d_loss on a full batch equals the pmean of per-shard
    d_losses over a 4-device mesh (same params, same pinned noise) —
    i.e. nothing in the conv stacks couples samples across the batch,
    so shard_map DP trains the same objective as single-device.
    (Kept at the loss level: compiling the full scanned conv trainer
    twice costs minutes on the CPU harness — see the module note.)"""
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from generative_models_tpu.losses import minimax as minimax_mod

    monkeypatch.setattr(minimax_mod, "compute_noise",
                        lambda rng, n, z_dim: jnp.full((n, z_dim), 0.1))
    cfg = variant_config("nsgan", arch="conv", conv_channels=4, z_dim=8,
                         batch_size=16)
    spec = get_variant("nsgan")
    rng = jax.random.PRNGKey(0)
    g = spec.init_g(jax.random.PRNGKey(1), cfg)
    d = spec.init_d(jax.random.PRNGKey(2), cfg)
    batch = _batch(cfg, rng)
    full, _ = spec.d_loss(d, g, batch, rng, {}, cfg)

    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("data",))
    shard = shard_map(
        lambda b: jax.lax.pmean(
            spec.d_loss(d, g, b, rng, {}, cfg)[0], "data"),
        mesh=mesh,
        in_specs=({"image": P("data"), "label": P("data")},),
        out_specs=P())
    np.testing.assert_allclose(float(full), float(shard(batch)),
                               rtol=2e-5)


def test_began_conv_ae_decoder_is_norm_free():
    """Paper-faithful AE critic (Berthelot 2017 uses plain convs): the
    BEGAN conv decoder must carry no GroupNorm params — measured sweep
    in docs/gallery.md; docstring in conv.generator_init."""
    cfg = variant_config("began", arch="conv", conv_channels=4)
    d = conv.began_d_init(jax.random.PRNGKey(0), cfg)
    assert "gn0" not in d["dec"] and "gn1" not in d["dec"]
    out = conv.began_d_apply(d, jnp.zeros((2, 784)), cfg)
    assert out.shape == (2, 784)
    # the GAN generator keeps its norms
    g = conv.generator_init(jax.random.PRNGKey(1), cfg)
    assert "gn0" in g and "gn1" in g


def test_tp_with_conv_refused():
    with pytest.raises(ValueError, match="conv"):
        variant_config("nsgan", arch="conv", tp=2)


def test_conv_sampler_exports_to_stablehlo(tmp_path):
    """The serving artifact (utils/export.py) works for the conv
    generator: export at init (no training needed), reload, and match
    the in-framework sampler under the same key."""
    from generative_models_tpu.utils.export import load_sampler, save_sampler

    cfg = variant_config("nsgan", arch="conv", conv_channels=4, z_dim=8)
    spec = get_variant("nsgan")
    params = spec.init_g(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "conv_sampler.shlo")
    save_sampler(path, spec, cfg, params, n=8)
    fn = load_sampler(path)
    a = np.asarray(fn(0))
    assert a.shape == (8, 784)
    assert a.min() >= 0.0 and a.max() <= 1.0
    ours = np.asarray(spec.sample(
        params, jax.random.key(0, impl="threefry2x32"), 8, cfg))
    np.testing.assert_allclose(a, ours, rtol=1e-5, atol=1e-6)


def test_conv_checkpoint_roundtrip(tmp_path, tiny_data):
    """Conv param pytrees ride the npz keypath/shape/dtype archive
    unchanged (no training needed: save/load at init, compare samples)."""
    cfg = conv_cfg("nsgan", out_dir=str(tmp_path))
    spec = get_variant("nsgan")
    key = jax.random.PRNGKey(3)

    def draw(trainer):
        return np.asarray(spec.sample(trainer.generator_params, key, 4, cfg))

    t = Trainer(config=cfg, data=tiny_data)
    path = t.save_model(str(tmp_path / "ckpt"))
    t2 = Trainer(config=cfg.replace(seed=7), data=tiny_data)
    before = draw(t2)
    t2.load_model(path)
    np.testing.assert_array_equal(draw(t), draw(t2))
    assert not np.array_equal(before, draw(t2))  # load replaced the init
