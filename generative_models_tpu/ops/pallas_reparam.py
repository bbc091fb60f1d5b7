"""Fused VAE sampling kernel (Pallas, TPU).

One VMEM pass computes, from (mu, logvar):
- eps ~ N(0, I) generated IN-KERNEL from the TPU hardware PRNG
  (pltpu.prng_random_bits -> uniform via mantissa bitcast -> Box-Muller),
  so no random tensor is ever materialized in HBM,
- z = mu + exp(0.5*logvar) * eps,
- the per-sample KL(q || N(0,I)) row-sum.

BASELINE.json: "the VAE reparameterization and KL path is a fused
sampling kernel". XLA twin: ops/reparam.py. The twin uses
jax.random.normal (threefry) — the DISTRIBUTION matches, the draws do
not; tests assert statistics and the KL values exactly.

Backward (custom_vjp, XLA ops):
    dz/dmu = 1,  dz/dlogvar = 0.5 * sigma * eps = 0.5 * (z - mu)
    dKL/dmu = mu,  dKL/dlogvar = -0.5 * (1 - exp(logvar))
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ru(x: int, m: int) -> int:
    return -(-x // m) * m


def _uniform_from_bits(bits):
    """uint32 -> U[0,1) via the [1,2) mantissa trick."""
    mant = jax.lax.shift_right_logical(bits, jnp.uint32(9))
    one_to_two = pltpu.bitcast(
        jax.lax.bitwise_or(mant, jnp.uint32(0x3F800000)), jnp.float32)
    return one_to_two - 1.0


def _reparam_kernel(seed_ref, mu_ref, logvar_ref, z_ref, kl_ref):
    # distinct stream per batch tile
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    mu = mu_ref[:]
    logvar = logvar_ref[:]
    shape = mu.shape
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                          jnp.uint32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                          jnp.uint32))
    # Box-Muller; 1-u1 in (0,1] keeps the log finite
    r = jnp.sqrt(-2.0 * jnp.log1p(-u1))
    eps = r * jnp.cos(2.0 * jnp.pi * u2)
    z_ref[:] = mu + jnp.exp(0.5 * logvar) * eps
    # zero padding contributes 0 to the row-sum: 1 + 0 - 0 - e^0 = 0
    kl_ref[:] = -0.5 * jnp.sum(
        1.0 + logvar - mu * mu - jnp.exp(logvar), axis=-1, keepdims=True)


_TILE_B = 512


def _fwd_impl(mu, logvar, rng, interpret: bool):
    b, l = mu.shape
    bp, lp = _ru(max(b, 8), 8), _ru(l, 128)
    tile_b = min(_TILE_B, bp)
    bp = _ru(bp, tile_b)
    mu_p = jnp.pad(mu, ((0, bp - b), (0, lp - l)))
    lv_p = jnp.pad(logvar, ((0, bp - b), (0, lp - l)))
    seed = jax.random.randint(rng, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    grid = (bp // tile_b,)
    z_p, kl_p = pl.pallas_call(
        _reparam_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, lp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, lp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, lp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, lp), jnp.float32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        ],
        # plain interpret mode lacks the TPU PRNG primitives; the TPU
        # interpreter (InterpretParams) implements them on CPU
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, mu_p, lv_p)
    return z_p[:b, :l], kl_p[:b, 0]


def _interpret_default() -> bool:
    from generative_models_tpu.ops.linear import default_platform
    return default_platform() != "tpu"


@jax.custom_vjp
def reparam_and_kl_pallas(mu, logvar, rng):
    return _fwd_impl(mu, logvar, rng, _interpret_default())


def _vjp_fwd(mu, logvar, rng):
    z, kl = _fwd_impl(mu, logvar, rng, _interpret_default())
    return (z, kl), (mu, logvar, z)


def _vjp_bwd(res, cts):
    mu, logvar, z = res
    dz, dkl = cts
    dmu = dz + dkl[:, None] * mu
    dlogvar = dz * 0.5 * (z - mu) - dkl[:, None] * 0.5 * (
        1.0 - jnp.exp(logvar))
    return dmu, dlogvar, None


reparam_and_kl_pallas.defvjp(_vjp_fwd, _vjp_bwd)
