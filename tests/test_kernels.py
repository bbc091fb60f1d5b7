"""Pallas kernel tests vs their XLA twins (SURVEY.md §5 "Kernel"):
run in interpret mode on CPU so the suite needs no TPU; the compiled
Mosaic path is exercised by bench/integration on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_models_tpu.models.mlp import mlp_init, mlp_apply_xla
from generative_models_tpu.ops.pallas_mlp import (
    SUPPORTED_ACTS,
    mlp_apply_pallas,
)
from generative_models_tpu.ops.pallas_reparam import reparam_and_kl_pallas
from generative_models_tpu.ops.reparam import kl_gaussian_xla


@pytest.mark.parametrize("dims,b", [
    ([100, 64, 784], 37),     # generator-like, unaligned everywhere
    ([784, 400, 1], 100),     # discriminator-like
    ([784, 400, 784], 16),    # BEGAN AE-like
    ([128, 256], 8),          # single layer
    ([784, 96, 48, 24], 5),   # deeper, tiny, very unaligned
])
@pytest.mark.parametrize("acts", [("relu", "sigmoid"),
                                  ("leaky_relu", "none"),
                                  ("tanh", "tanh")])
def test_mlp_kernel_matches_xla(dims, b, acts):
    hidden_act, out_act = acts
    rng = jax.random.PRNGKey(0)
    layers = mlp_init(rng, dims)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, dims[0]))
    ref = mlp_apply_xla(layers, x, hidden_act, out_act)
    got = mlp_apply_pallas(layers, x, hidden_act, out_act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_mlp_kernel_grads_match_xla():
    rng = jax.random.PRNGKey(2)
    layers = mlp_init(rng, [48, 32, 16])
    x = jax.random.normal(jax.random.PRNGKey(3), (9, 48))

    def lp(l, xx):
        return jnp.sum(mlp_apply_pallas(l, xx, "leaky_relu", "sigmoid") ** 2)

    def lx(l, xx):
        return jnp.sum(mlp_apply_xla(l, xx, "leaky_relu", "sigmoid") ** 2)

    gp = jax.grad(lp, argnums=(0, 1))(layers, x)
    gx = jax.grad(lx, argnums=(0, 1))(layers, x)
    for a, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-5)


def test_mlp_kernel_unsupported_act_falls_back():
    rng = jax.random.PRNGKey(4)
    layers = mlp_init(rng, [16, 8])
    x = jax.random.normal(rng, (4, 16))
    assert "softplus" not in SUPPORTED_ACTS
    out = mlp_apply_pallas(layers, x, "softplus", "softplus")
    ref = mlp_apply_xla(layers, x, "softplus", "softplus")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_reparam_kernel_kl_matches_closed_form():
    rng = np.random.default_rng(0)
    mu = jnp.asarray(rng.normal(size=(50, 20)).astype(np.float32))
    lv = jnp.asarray(rng.normal(size=(50, 20)).astype(np.float32) * 0.3)
    z, kl = reparam_and_kl_pallas(mu, lv, jax.random.PRNGKey(0))
    assert z.shape == mu.shape and kl.shape == (50,)
    np.testing.assert_allclose(np.asarray(kl),
                               np.asarray(kl_gaussian_xla(mu, lv)),
                               rtol=1e-5, atol=1e-5)


def test_reparam_kernel_custom_vjp():
    """Gradients of the fused kernel must follow the analytic formulas:
    with eps frozen by the vjp residuals, dz/dmu=1, dz/dlogvar=(z-mu)/2,
    dKL/dmu=mu, dKL/dlogvar=-(1-e^lv)/2."""
    rng = np.random.default_rng(1)
    mu = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    lv = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32) * 0.2)
    key = jax.random.PRNGKey(7)

    (z, kl), vjp = jax.vjp(
        lambda m, l: reparam_and_kl_pallas(m, l, key), mu, lv)
    dz = jnp.ones_like(z)
    dkl = jnp.zeros_like(kl)
    dmu, dlv = vjp((dz, dkl))
    np.testing.assert_allclose(np.asarray(dmu), np.ones_like(mu), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dlv),
                               np.asarray(0.5 * (z - mu)), rtol=1e-5,
                               atol=1e-6)
    dmu2, dlv2 = vjp((jnp.zeros_like(z), jnp.ones_like(kl)))
    np.testing.assert_allclose(np.asarray(dmu2), np.asarray(mu), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dlv2),
                               np.asarray(-0.5 * (1 - jnp.exp(lv))),
                               rtol=1e-5, atol=1e-6)


def test_mlp_bwd_kernel_multi_tile_accumulation():
    """The fused backward kernel accumulates dW/db across batch-tile
    grid steps (batch 300 > TILE_B=256 -> 2 tiles) and must match the
    XLA twin's grads exactly at padded, non-lane-multiple dims."""
    layers = mlp_init(jax.random.PRNGKey(4), [50, 33, 17])
    x = jax.random.normal(jax.random.PRNGKey(5), (300, 50))
    dyw = jax.random.normal(jax.random.PRNGKey(6), (300, 17))

    def lp(l, xx):
        return jnp.sum(mlp_apply_pallas(l, xx, "relu", "sigmoid") * dyw)

    def lx(l, xx):
        return jnp.sum(mlp_apply_xla(l, xx, "relu", "sigmoid") * dyw)

    gp = jax.grad(lp, argnums=(0, 1))(layers, x)
    gx = jax.grad(lx, argnums=(0, 1))(layers, x)
    for a, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-5)


def test_mlp_bwd_kernel_three_layers():
    """3-layer stack: the bwd kernel's layer loop and residual wiring
    generalize past the zoo's 2-layer default."""
    layers = mlp_init(jax.random.PRNGKey(7), [20, 24, 28, 12])
    x = jax.random.normal(jax.random.PRNGKey(8), (13, 20))

    def lp(l, xx):
        return jnp.sum(mlp_apply_pallas(l, xx, "leaky_relu", "tanh") ** 2)

    def lx(l, xx):
        return jnp.sum(mlp_apply_xla(l, xx, "leaky_relu", "tanh") ** 2)

    gp = jax.grad(lp, argnums=(0, 1))(layers, x)
    gx = jax.grad(lx, argnums=(0, 1))(layers, x)
    for a, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-5)
