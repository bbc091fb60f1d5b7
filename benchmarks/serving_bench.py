"""Serving-path throughput: generated images/sec from the jitted
sampler, per architecture and batch size, on the attached chip.

The reference's "serving" is calling `generate_images` in a notebook
(SURVEY.md §4.5) — no numbers exist or could. This measures the
framework's inference surface: the SAME jitted sample fn the Trainer,
`--sample-only`, and the StableHLO export artifact wrap.

Timing discipline matches BASELINE.md's "timing honesty" note: the
axon tunnel memoizes identical dispatches and `block_until_ready` can
return early, so every rep draws with a DIFFERENT fold-in of the key
and the clock stops only after fetching a value that data-depends on
the last batch.

    python benchmarks/serving_bench.py [--arch mlp conv] [--batches 64 1024 8192]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_sampler(variant, arch, n, reps=64, **cfg_over):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from generative_models_tpu.config import variant_config
    from generative_models_tpu.losses.registry import get_variant

    cfg = variant_config(variant, arch=arch, **cfg_over)
    # resolve dtype="auto" the way the Trainer does, so serving rows
    # measure the dtype a default-config user actually gets (conv
    # crosses to bf16 at batch >= 512 on a real TPU — config.py)
    from generative_models_tpu.config import resolve_dtype
    cfg = cfg.replace(dtype=resolve_dtype(cfg, jax.devices()[0].platform))
    spec = get_variant(variant)
    params = (spec.init_g if spec.adversarial else spec.init_params)(
        jax.random.PRNGKey(0), cfg)

    # `reps` batches fused into ONE dispatch (lax.scan), so the axon
    # tunnel's ~100 ms/dispatch latency is amortized exactly like the
    # trainer's scan_steps — this measures the DEVICE serving rate.
    # The carry sums EVERY pixel of each batch: a single-element carry
    # would let XLA slice the sampler chain down to one batch row and
    # inflate the rate (the reduction's cost is negligible vs the
    # generator itself).
    @jax.jit
    def many(key):
        def body(acc, i):
            imgs = spec.sample(params, jax.random.fold_in(key, i), n, cfg)
            return acc + imgs.sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return acc

    float(many(jax.random.PRNGKey(1)))   # compile + warmup, fenced
    t0 = time.perf_counter()
    float(many(jax.random.PRNGKey(2)))   # value fetch fences the run
    dt = time.perf_counter() - t0
    return reps * n / dt, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="nsgan")
    ap.add_argument("--arch", nargs="*", default=["mlp", "conv"])
    ap.add_argument("--batches", nargs="*", type=int,
                    default=[64, 1024, 8192])
    # batches fused per dispatch; drop for expensive samplers (a DDPM
    # image costs sample_steps net evals, not one)
    ap.add_argument("--reps", type=int, default=64)
    # ddpm/flow only: sweep the reverse-chain / ODE length (the
    # inference-cost dial); each entry is one row
    ap.add_argument("--sample-steps", nargs="*", type=int, default=[None])
    ap.add_argument("--cond", action="store_true",
                    help="class-conditional sampling (ddpm_cond; the "
                         "sample grid's column-cyclic labels)")
    ap.add_argument("--guidance", nargs="*", type=float, default=[None],
                    help="guidance scales to sweep (each is one row; "
                         "None = the variant's measured default — for "
                         "conditional flow that is w=0.3, whose guided "
                         "2n-row net call is the serving cost this "
                         "sweep exists to measure)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from __graft_entry__ import ensure_live_backend
    ensure_live_backend()

    rows = []
    for arch in args.arch:
        for n in args.batches:
            for ss in args.sample_steps:
                for w in args.guidance:
                    ss_field = ("flow_sample_steps"
                                if args.variant == "flow"
                                else "ddpm_sample_steps")
                    over = {} if ss is None else {ss_field: ss}
                    if args.cond:
                        over["ddpm_cond"] = True
                    if w is not None:
                        over["ddpm_guidance"] = w
                    ips, cfg = bench_sampler(args.variant, arch, n,
                                             reps=args.reps, **over)
                    # record the EFFECTIVE guidance (w=None can resolve
                    # to a measured default, e.g. conditional flow's
                    # 0.3 — a ~2x serving cost that must not be
                    # indistinguishable from an unguided row)
                    row = {"variant": args.variant, "arch": arch,
                           "batch": n,
                           **({"sample_steps": ss} if ss is not None
                              else {}),
                           **({"cond": True,
                               "guidance": cfg.ddpm_guidance}
                              if args.cond else {}),
                           "images_per_sec": round(ips, 1)}
                    rows.append(row)
                    print(json.dumps(row), flush=True)

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "serving_results.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)

    print("\n| arch | batch | images/sec |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['arch']} | {r['batch']} | {r['images_per_sec']} |")


if __name__ == "__main__":
    main()
