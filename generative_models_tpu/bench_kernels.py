"""Microbenchmarks: Pallas kernels vs their XLA twins on the attached
accelerator. `python -m generative_models_tpu.bench_kernels`.

Honesty rule (SURVEY.md §9.1 stage 6): the MNIST MLPs are small, so
fusion wins are reported as measured, win or lose, per shape.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from generative_models_tpu.models.mlp import mlp_apply_xla, mlp_init
from generative_models_tpu.ops.pallas_mlp import mlp_apply_pallas
from generative_models_tpu.ops.pallas_reparam import reparam_and_kl_pallas
from generative_models_tpu.ops.reparam import kl_gaussian_xla, reparameterize_xla


def timeit(fn, *args, iters=200, warmup=20):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6  # us


def bench_mlp(dims, b, tag):
    rng = jax.random.PRNGKey(0)
    layers = mlp_init(rng, dims)
    x = jax.random.normal(rng, (b, dims[0]))

    f_xla = jax.jit(lambda l, xx: mlp_apply_xla(l, xx, "relu", "sigmoid"))
    f_pls = jax.jit(lambda l, xx: mlp_apply_pallas(l, xx, "relu", "sigmoid"))

    g_xla = jax.jit(jax.grad(
        lambda l, xx: jnp.sum(mlp_apply_xla(l, xx, "relu", "sigmoid") ** 2)))
    g_pls = jax.jit(jax.grad(
        lambda l, xx: jnp.sum(mlp_apply_pallas(l, xx, "relu", "sigmoid") ** 2)))

    rows = []
    for name, fx, fp in (("fwd", f_xla, f_pls), ("fwd+bwd", g_xla, g_pls)):
        t_x = timeit(fx, layers, x)
        t_p = timeit(fp, layers, x)
        rows.append({"op": f"mlp_{tag}_{name}", "batch": b,
                     "xla_us": round(t_x, 1), "pallas_us": round(t_p, 1),
                     "speedup": round(t_x / t_p, 2)})
    return rows


def bench_reparam(b, l):
    rng = jax.random.PRNGKey(0)
    mu = jax.random.normal(rng, (b, l))
    lv = jax.random.normal(rng, (b, l)) * 0.3
    key = jax.random.PRNGKey(1)

    f_xla = jax.jit(lambda m, v: (reparameterize_xla(m, v, key),
                                  kl_gaussian_xla(m, v)))
    f_pls = jax.jit(lambda m, v: reparam_and_kl_pallas(m, v, key))
    t_x = timeit(f_xla, mu, lv)
    t_p = timeit(f_pls, mu, lv)
    return [{"op": "reparam_kl", "batch": b, "latent": l,
             "xla_us": round(t_x, 1), "pallas_us": round(t_p, 1),
             "speedup": round(t_x / t_p, 2)}]


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    rows = []
    for b in (100, 1000, 4096):
        rows += bench_mlp([128, 400, 784], b, "G")
        rows += bench_mlp([784, 400, 1], b, "D")
    rows += bench_reparam(100, 20)
    rows += bench_reparam(4096, 20)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
