"""Per-variant throughput sweep on the attached TPU chip.

`python benchmarks/sweep.py [--steps N]` — trains every variant at its
registry config (batch 100, full-size MLPs), measures steady-state
G+D (or single-model) steps/sec/chip after a warmup chunk, and writes
benchmarks/sweep_results.json + a markdown table to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--scan", type=int, default=1000)
    ap.add_argument("--variants", nargs="*", default=None)
    args = ap.parse_args()

    from generative_models_tpu.config import variant_config
    from generative_models_tpu.data.mnist import load_mnist
    from generative_models_tpu.losses.registry import available_variants
    from generative_models_tpu.train.trainer import Trainer

    data = load_mnist(allow_synthetic=True, synthetic_sizes=(12000, 1000))
    results = []
    for variant in (args.variants or available_variants()):
        cfg = variant_config(variant, batch_size=100, scan_steps=args.scan,
                             seed=0)
        t = Trainer(config=cfg, data=data)
        t.train(steps=args.scan)            # compile + warmup
        t.train(steps=args.steps)
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
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "sweep_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)

    print("\n| variant | d_steps | steps/sec/chip | final D/loss | final G |")
    print("|---|---|---|---|---|")
    for r in results:
        print(f"| {r['variant']} | {r['d_steps']} | {r['steps_per_sec']} "
              f"| {r['final_loss']} | {r['g_loss']} |")


if __name__ == "__main__":
    main()
