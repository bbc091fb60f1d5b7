"""Decompose the NSGAN train-step cost on the attached chip.

Times scan-fused loops that successively REMOVE pieces of the real
step (optimizer update, backward, RNG draws, data gather) to attribute
the per-step budget. Ablations are approximations of the real step
(same shapes/kernels), built inline; the `full` row is the real
framework step via build_many_steps. Writes
benchmarks/anatomy_results.json and prints one line per row.

Usage: python benchmarks/step_anatomy.py [--scan 8000] [--batch 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402


def timed(fn, state, repeats=3):
    """fn(state) -> (state', scalar-bearing out). Chains state between
    calls (the axon tunnel memoizes bit-identical re-dispatches) and
    fences with a VALUE fetch (block_until_ready can return before
    remote execution completes — BASELINE.md timing-honesty note)."""
    state, out = fn(state)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])  # compile+warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, out = fn(state)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--prng", default=None,
                    help="jax_default_prng_impl override (e.g. rbg)")
    ap.add_argument("--backend", default=None, choices=("xla", "pallas"),
                    help="compute path; default = the framework default "
                         "(Config.use_pallas)")
    args = ap.parse_args()
    if args.prng:
        jax.config.update("jax_default_prng_impl", args.prng)

    from generative_models_tpu.config import variant_config
    from generative_models_tpu.losses.registry import get_variant
    from generative_models_tpu.models import nets
    from generative_models_tpu.train import step as step_lib
    from generative_models_tpu import ops

    cfg = variant_config("nsgan", batch_size=args.batch,
                         scan_steps=args.scan, seed=0)
    from generative_models_tpu.ops.linear import pallas_backend_available
    if args.backend is None:
        # mirror the Trainer's measured-default policy (config.py)
        args.backend = ("pallas" if cfg.use_pallas
                        and pallas_backend_available() else "xla")
    if args.backend == "pallas" and not pallas_backend_available():
        raise SystemExit("pallas backend requested but no TPU available")
    ops.set_backend(args.backend)
    spec = get_variant("nsgan")
    rng = jax.random.PRNGKey(0)
    state = step_lib.init_state(spec, cfg, rng)
    n_rows = 12000
    images = jnp.asarray(
        np.random.default_rng(0).random((n_rows, 784), dtype=np.float32))
    labels = jnp.zeros((n_rows,), jnp.int32)
    steps_per_epoch = n_rows // cfg.batch_size
    perm_win = (cfg.scan_steps * cfg.batch_size - 1) // n_rows + 2
    perm_stack = jnp.stack(
        [jax.random.permutation(jax.random.fold_in(rng, e), n_rows)
         for e in range(perm_win)])
    rel = (jnp.arange(args.scan) * cfg.batch_size).astype(jnp.int32)

    results = {}

    # ---- full framework step --------------------------------------
    many = jax.jit(step_lib.build_many_steps(spec, cfg, steps_per_epoch))
    dt = timed(lambda s: many(s, images, labels, perm_stack, rel), state)
    results["full"] = args.scan / dt

    # ---- ablations (inline replica of the step) ---------------------
    g_tx = optax.adam(cfg.g_lr)
    d_tx = optax.adam(cfg.d_lr)
    bce = lambda lg, y: jnp.mean(  # noqa: E731
        jnp.maximum(lg, 0) - lg * y + jnp.log1p(jnp.exp(-jnp.abs(lg))))

    def make(variant_name, *, gather=True, noise=True, backward=True,
             update=True):
        def one(carry, rel_offset):
            st = carry
            r, k = jax.random.split(st["rng"])
            if gather:
                idx = jax.lax.dynamic_slice(
                    perm_stack, (rel_offset // n_rows, rel_offset % n_rows),
                    (1, cfg.batch_size)).reshape(-1)
                real = jnp.take(images, idx, axis=0)
            else:
                real = jax.lax.dynamic_slice_in_dim(images, 0, cfg.batch_size)
            if noise:
                z1 = jax.random.normal(k, (cfg.batch_size, cfg.z_dim))
                z2 = jax.random.normal(r, (cfg.batch_size, cfg.z_dim))
            else:
                z1 = z2 = jnp.zeros((cfg.batch_size, cfg.z_dim))

            def d_loss_fn(dp):
                fake = nets.generator_apply(st["g_params"], z1, cfg)
                lr_ = nets.discriminator_apply(dp, real, cfg)
                lf = nets.discriminator_apply(dp, fake, cfg)
                return bce(lr_, jnp.ones_like(lr_)) + bce(lf, jnp.zeros_like(lf))

            def g_loss_fn(gp):
                fake = nets.generator_apply(gp, z2, cfg)
                lf = nets.discriminator_apply(st["d_params"], fake, cfg)
                return bce(lf, jnp.ones_like(lf))

            if backward:
                dl, d_grads = jax.value_and_grad(d_loss_fn)(st["d_params"])
                gl, g_grads = jax.value_and_grad(g_loss_fn)(st["g_params"])
            else:
                dl = d_loss_fn(st["d_params"])
                gl = g_loss_fn(st["g_params"])
                d_grads = st["d_params"]
                g_grads = st["g_params"]
            if update:
                du, dos = d_tx.update(d_grads, st["d_opt"], st["d_params"])
                d_params = optax.apply_updates(st["d_params"], du)
                gu, gos = g_tx.update(g_grads, st["g_opt"], st["g_params"])
                g_params = optax.apply_updates(st["g_params"], gu)
            else:
                d_params, dos = st["d_params"], st["d_opt"]
                g_params, gos = st["g_params"], st["g_opt"]
            return {"g_params": g_params, "d_params": d_params,
                    "g_opt": gos, "d_opt": dos, "rng": r}, (dl, gl)

        st0 = {"g_params": state["g_params"], "d_params": state["d_params"],
               "g_opt": g_tx.init(state["g_params"]),
               "d_opt": d_tx.init(state["d_params"]),
               "rng": jax.random.PRNGKey(1)}
        f = jax.jit(lambda s: jax.lax.scan(one, s, rel))
        dt = timed(f, st0)
        results[variant_name] = args.scan / dt

    make("replica")                     # sanity: ≈ full
    make("no_update", update=False)     # - optimizer elementwise
    make("no_backward", backward=False, update=False)  # fwd only
    make("no_noise", noise=False)       # RNG cost
    make("no_gather", gather=False)     # data-gather cost

    for k, v in results.items():
        print(f"{k:12s} {v:10.1f} steps/s")
    out = {"config": {"batch": args.batch, "scan": args.scan,
                      "backend": args.backend,
                      "prng": args.prng or "threefry"},
           "steps_per_sec": {k: round(v, 1) for k, v in results.items()}}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "anatomy_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
