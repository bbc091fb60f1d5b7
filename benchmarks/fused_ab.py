#!/usr/bin/env python
"""Fenced A/B: fused whole-chunk kernel (Config.fused_step) vs the XLA
default step at the headline NSGAN config (VERDICT r1 next #1's "done"
criterion: a fenced A/B at batch 100 / scan 16000 showing the Pallas
path vs the 35.9k XLA default).

Timing discipline matches bench.py/BASELINE.md: Trainer.wall_time is
fenced by a value fetch (block_until_ready is unreliable over the axon
tunnel), compile excluded by a full warmup chunk, best-of-2 steady
state. Both arms share prng_impl so the comparison isolates the step
implementation.

Usage: python benchmarks/fused_ab.py [--scan N] [--steps-mult M]
Writes benchmarks/fused_ab.json and prints one JSON line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, HIDDEN, Z_DIM = 100, 400, 128


def run_arm(data, scan, steps_mult, **cfg_kw):
    from generative_models_tpu.config import variant_config
    from generative_models_tpu.train.trainer import Trainer

    cfg = variant_config(
        "nsgan", batch_size=BATCH, hidden_dim=HIDDEN, z_dim=Z_DIM,
        scan_steps=scan, seed=0, adam_b1=0.9, **cfg_kw)
    t = Trainer(config=cfg, data=data)
    t.train(steps=scan, sample_every=-1)          # compile + warmup
    best = 0.0
    for _ in range(2):
        t.train(steps=steps_mult * scan, sample_every=-1)
        best = max(best, steps_mult * scan / t.wall_time)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=16000)
    ap.add_argument("--steps-mult", type=int, default=5)
    ap.add_argument("--prng", default="rbg",
                    help="prng_impl for BOTH arms (rbg = headline)")
    args = ap.parse_args()

    from __graft_entry__ import ensure_live_backend
    alive = ensure_live_backend()

    from generative_models_tpu.data.mnist import load_mnist
    data = load_mnist(allow_synthetic=True, synthetic_sizes=(12000, 1000))

    arms = {
        "xla_f32": {},
        "fused_f32": {"fused_step": True},
        "xla_bf16": {"dtype": "bfloat16"},
        "fused_bf16": {"fused_step": True, "dtype": "bfloat16"},
    }
    rates = {}
    for name, kw in arms.items():
        rates[name] = run_arm(data, args.scan, args.steps_mult,
                              prng_impl=args.prng, **kw)
        print(json.dumps({name: round(rates[name], 1)}), flush=True)
    out = {
        "config": {"batch": BATCH, "hidden": HIDDEN, "z": Z_DIM,
                   "scan": args.scan, "prng": args.prng,
                   "backend_alive": alive},
        "steps_per_sec": {k: round(v, 1) for k, v in rates.items()},
        "fused_over_xla_f32": round(rates["fused_f32"] / rates["xla_f32"],
                                    3),
        "best_over_xla_f32": round(max(rates.values()) / rates["xla_f32"],
                                   3),
        "best_arm": max(rates, key=rates.get),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fused_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
