"""Pipeline-parallelism tests on the 8-virtual-CPU mesh.

The GPipe schedule (parallel/pp.py) must be *semantically invisible*:
logits, loss, and gradients of the pipelined prior must match the
single-device ``ar_prior.prior_apply`` path — the microbatch split is
exact (every op is batch-row independent) and the fill-drain masking
must never leak bubble compute into the outputs. These tests pin that,
plus that the layer stack really is pipe-sharded (the memory win PP
exists for) and that the validation guards refuse bad shapes instead
of mis-pipelining.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from generative_models_tpu.config import Config
from generative_models_tpu.losses.vqprior import _shift
from generative_models_tpu.models import ar_prior
from generative_models_tpu.models.vq_net import num_tokens
from generative_models_tpu.parallel import pp


def _cpu_mesh(dp, n_stages):
    devs = jax.devices("cpu")
    if len(devs) < dp * n_stages:
        pytest.skip(f"need {dp * n_stages} devices")
    return pp.make_mesh_pp(dp, n_stages, devices=devs)


def _tiny_cfg(**kw):
    kw.setdefault("vq_prior_layers", 4)
    kw.setdefault("vq_prior_width", 32)
    kw.setdefault("vq_prior_heads", 4)
    kw.setdefault("vq_codebook_size", 16)
    return Config(variant="vqprior", **kw)


def _setup(cfg, b=8, seed=0):
    params = ar_prior.prior_init(jax.random.PRNGKey(seed), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(seed + 1),
                                (b, num_tokens(cfg)), 0,
                                cfg.vq_codebook_size)
    return params, tokens


def _ce_ref(params, tokens, cfg, y=None):
    logits = ar_prior.prior_apply(params, _shift(tokens, cfg), cfg, y)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, tokens[..., None], -1))


@pytest.mark.parametrize("dp,stages,n_micro", [(2, 4, 4), (1, 4, 8),
                                               (1, 2, 1), (4, 2, 2)])
def test_pp_logits_match_single_device(dp, stages, n_micro):
    """Pipelined forward == prior_apply BIT-EXACTLY for every
    (dp, stages, micro) split, including the n_micro=1 (pure
    model-split) edge — every op is batch-row independent and the
    schedule reorders nothing, so there is no fp tolerance to grant
    (measured max abs diff 0.0 on all four splits; this pin is what
    the docs' bit-exact claim rests on)."""
    cfg = _tiny_cfg()
    params, tokens = _setup(cfg)
    tin = _shift(tokens, cfg)
    ref = ar_prior.prior_apply(params, tin, cfg)
    out = pp.prior_apply_pp(params, tin, cfg, _cpu_mesh(dp, stages),
                            n_micro=n_micro)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_pp_logits_match_conditional():
    """Class-conditional (ddpm_cond) path: the label embedding rides
    the replicated stage-0 injection."""
    cfg = _tiny_cfg(ddpm_cond=True)
    params, tokens = _setup(cfg)
    y = jnp.arange(tokens.shape[0]) % cfg.num_classes
    tin = _shift(tokens, cfg)
    ref = ar_prior.prior_apply(params, tin, cfg, y)
    out = pp.prior_apply_pp(params, tin, cfg, _cpu_mesh(2, 4),
                            n_micro=2, y=y)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-6)


def test_pp_grads_match_single_device():
    """jax.grad through the schedule (scan + ppermute + masking) equals
    single-device grads — pipeline-parallel TRAINING is correct."""
    cfg = _tiny_cfg()
    params, tokens = _setup(cfg)
    mesh = _cpu_mesh(2, 4)
    g_ref = jax.grad(_ce_ref)(params, tokens, cfg)
    g_pp = jax.grad(
        lambda p: pp.prior_ce_pp(p, tokens, cfg, mesh, n_micro=4))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_pp_train_step_matches_single_device():
    """5 jitted pipeline steps track 5 single-device Adam steps on the
    same objective, and the CE starts at exactly log K (the zero-init
    head convention survives the pipeline)."""
    import optax

    from generative_models_tpu.train.optim import make_tx

    cfg = _tiny_cfg()
    params, tokens = _setup(cfg)
    mesh = _cpu_mesh(2, 4)

    jitted, p, opt, tok, y = pp.build_pp_prior_step(
        cfg, mesh, n_micro=4)(params, tokens, None)

    tx = make_tx(cfg, cfg.g_lr)  # the cfg optimizer the PP step uses
    p_ref, opt_ref = params, tx.init(params)

    @jax.jit
    def ref_step(p_ref, opt_ref):
        loss, grads = jax.value_and_grad(_ce_ref)(p_ref, tokens, cfg)
        updates, opt_ref = tx.update(grads, opt_ref, p_ref)
        return optax.apply_updates(p_ref, updates), opt_ref, loss

    losses, ref_losses = [], []
    for _ in range(5):
        p, opt, loss = jitted(p, opt, tok, y)
        p_ref, opt_ref, ref_loss = ref_step(p_ref, opt_ref)
        losses.append(float(loss))
        ref_losses.append(float(ref_loss))
    assert abs(losses[0] - float(np.log(cfg.vq_codebook_size))) < 1e-4
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4)
    assert losses[-1] < losses[0]


def test_pp_blocks_actually_sharded():
    """The layer stack is pipe-sharded (each device holds
    layers/stages blocks), and the Adam slots follow."""
    cfg = _tiny_cfg()
    params, tokens = _setup(cfg)
    mesh = _cpu_mesh(2, 4)
    _, p, opt, _, _ = pp.build_pp_prior_step(
        cfg, mesh, n_micro=4)(params, tokens, None)
    qkv = p["blocks"]["qkv"]["w"]  # [layers, W, 3W]
    assert qkv.sharding.spec == P(pp.PIPE_AXIS)
    assert qkv.addressable_shards[0].data.shape[0] * 4 == qkv.shape[0]
    mu_leaves = [x for x in jax.tree.leaves(opt)
                 if getattr(x, "ndim", 0) == 3 and x.shape == qkv.shape]
    assert mu_leaves and all(
        m.sharding.spec == P(pp.PIPE_AXIS) for m in mu_leaves)
    # embeddings/head stay replicated
    assert p["tok"].sharding.spec == P()


def test_pp_stack_roundtrip():
    cfg = _tiny_cfg()
    params, _ = _setup(cfg)
    stacked = pp.stack_blocks(params["blocks"])
    back = pp.unstack_blocks(stacked, cfg.vq_prior_layers)
    for a, b in zip(jax.tree.leaves(params["blocks"]),
                    jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_validation_errors():
    """Indivisible layer/batch/microbatch splits refuse with a reason
    (the config.py:303 convention: no late shape surprises)."""
    cfg = _tiny_cfg(vq_prior_layers=3)  # 3 layers can't cut into 2
    params, tokens = _setup(cfg)
    mesh = _cpu_mesh(1, 2)
    tin = _shift(tokens, cfg)
    with pytest.raises(ValueError, match="equal stages"):
        pp.prior_apply_pp(params, tin, cfg, mesh, n_micro=2)
    cfg4 = _tiny_cfg()
    params4, tokens4 = _setup(cfg4)
    with pytest.raises(ValueError, match="n_micro"):
        pp.prior_apply_pp(params4, _shift(tokens4, cfg4), cfg4,
                          _cpu_mesh(1, 4), n_micro=3)  # 8 % 3 != 0
    with pytest.raises(ValueError, match="data"):
        pp.prior_apply_pp(params4, _shift(tokens4, cfg4), cfg4,
                          _cpu_mesh(4, 2), n_micro=4)  # micro 2 % dp 4
