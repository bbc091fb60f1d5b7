"""Per-variant throughput sweep on the attached TPU chip, with a
PyTorch-eager baseline column per variant (benchmarks/torch_replicas.py)
— the BASELINE.json north star is "≥10x per-chip G+D step throughput"
PER VARIANT, so every row measures both sides.

`python benchmarks/sweep.py [--steps N] [--no-torch]` — trains every
variant at its registry config (batch 100, full-size MLPs), measures
steady-state G+D (or single-model) steps/sec/chip after a warmup chunk,
and writes benchmarks/sweep_results.json + a markdown table to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_torch_variant(variant, cfg, data, steps=60, warmup=5):
    from benchmarks.torch_replicas import make_replica
    step = make_replica(variant, cfg, data["x_train"], data["y_train"])
    for _ in range(warmup):
        step()
    best = 0.0
    for _ in range(2):  # best-of-2, like bench.py: taking the
        #                 baseline's best window is the conservative
        #                 direction for the reported ratio
        t0 = time.perf_counter()
        for _ in range(steps):
            step()
        best = max(best, steps / (time.perf_counter() - t0))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--scan", type=int, default=1000)
    ap.add_argument("--variants", nargs="*", default=None)
    ap.add_argument("--arch", default="mlp", choices=("mlp", "conv"),
                    help="architecture; conv defaults to the headline "
                         "variant (nsgan — the only conv torch replica) "
                         "and writes sweep_results_conv.json")
    ap.add_argument("--no-torch", action="store_true",
                    help="skip the torch-eager baseline column")
    ap.add_argument("--torch-steps", type=int, default=60)
    args = ap.parse_args()
    if args.arch == "conv" and not args.variants:
        args.variants = ["nsgan"]

    from __graft_entry__ import ensure_live_backend
    ensure_live_backend()

    from generative_models_tpu.config import variant_config
    from generative_models_tpu.data.mnist import load_mnist
    from generative_models_tpu.losses.registry import available_variants
    from generative_models_tpu.train.trainer import Trainer

    data = load_mnist(allow_synthetic=True, synthetic_sizes=(12000, 1000))
    results = []
    for variant in (args.variants or available_variants()):
        cfg = variant_config(variant, batch_size=100, scan_steps=args.scan,
                             seed=0, arch=args.arch)
        t = Trainer(config=cfg, data=data)
        # sample_every=-1: no sample grids inside the timed window —
        # the torch replica generates no images either (same rule as
        # bench.py)
        t.train(steps=args.scan, sample_every=-1)   # compile + warmup
        t.train(steps=args.steps, sample_every=-1)
        hist = t.history
        loss_key = "d_loss" if t.spec.adversarial else "loss"
        row = {
            "variant": variant,
            "d_steps": cfg.d_steps,
            "steps_per_sec": round(args.steps / t.wall_time, 1),
            "final_loss": round(float(hist[loss_key][-1]), 4),
            "g_loss": (round(float(hist["g_loss"][-1]), 4)
                       if "g_loss" in hist else None),
        }
        if not args.no_torch:
            try:
                tsps = bench_torch_variant(variant, cfg, data,
                                           steps=args.torch_steps)
            except NotImplementedError as e:
                # conv replicas exist for the headline variant only;
                # keep the (expensive, already-measured) TPU row
                # rather than aborting the sweep
                print(f"# no torch baseline for {variant}: {e}",
                      flush=True)
            else:
                row["torch_steps_per_sec"] = round(tsps, 2)
                row["ratio"] = round(row["steps_per_sec"] / tsps, 1)
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "sweep_results.json" if args.arch == "mlp"
                       else "sweep_results_conv.json")
    if args.variants and os.path.isfile(out):
        # partial sweep: merge by variant instead of clobbering the
        # rows that didn't run (same rule as quality_sweep.py). NOTE:
        # merged rows keep their own session's torch/JAX pairing — the
        # ratio column is honest per row, not cross-comparable.
        with open(out) as f:
            old = {r["variant"]: r for r in json.load(f)}
        old.update({r["variant"]: r for r in results})
        results = sorted(old.values(), key=lambda r: r["variant"])
    with open(out, "w") as f:
        json.dump(results, f, indent=1)

    cols = "| variant | d_steps | steps/sec/chip | torch-eager | ratio | " \
           "final D/loss | final G |"
    print("\n" + cols)
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['variant']} | {r['d_steps']} | {r['steps_per_sec']} "
              f"| {r.get('torch_steps_per_sec', '-')} "
              f"| {r.get('ratio', '-')} "
              f"| {r['final_loss']} | {r['g_loss']} |")


if __name__ == "__main__":
    main()
