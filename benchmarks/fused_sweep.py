#!/usr/bin/env python
"""Per-variant fenced A/B: fused whole-chunk kernel vs the XLA default
step for EVERY variant in the fused family (all 14 — the round-2
completion of VERDICT r1 next #1), at the headline MLP config.

Same timing discipline as benchmarks/fused_ab.py: value-fetch fence,
compile excluded by a warmup chunk, best-of-2 steady state, shared
prng_impl across arms. WGAN runs its reference d_steps=5 critic loop
in both arms (so its steps/s is G+5D steps).

Usage: python benchmarks/fused_sweep.py [--scan N] [--steps-mult M]
       [--variants a,b,c]
Writes benchmarks/fused_sweep.json and prints one JSON line per arm.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, HIDDEN, Z_DIM = 100, 400, 128


def run_arm(data, variant, scan, steps_mult, **cfg_kw):
    from generative_models_tpu.config import variant_config
    from generative_models_tpu.train.trainer import Trainer

    cfg = variant_config(
        variant, batch_size=BATCH, hidden_dim=HIDDEN, z_dim=Z_DIM,
        scan_steps=scan, seed=0, **cfg_kw)
    t = Trainer(config=cfg, data=data)
    t.train(steps=scan, sample_every=-1)          # compile + warmup
    best = 0.0
    for _ in range(2):
        t.train(steps=steps_mult * scan, sample_every=-1)
        best = max(best, steps_mult * scan / t.wall_time)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=4000)
    ap.add_argument("--steps-mult", type=int, default=4)
    ap.add_argument("--prng", default="rbg")
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    from __graft_entry__ import ensure_live_backend
    alive = ensure_live_backend()

    from generative_models_tpu.config import VARIANTS
    from generative_models_tpu.data.mnist import load_mnist
    data = load_mnist(allow_synthetic=True, synthetic_sizes=(12000, 1000))

    variants = (args.variants.split(",") if args.variants
                else list(VARIANTS))
    results = {}
    for v in variants:
        row = {}
        for arm, kw in (("xla", {}), ("fused", {"fused_step": True})):
            # wgan's 5-critic loop: shorter scan keeps wall time sane
            scan = args.scan // 4 if v == "wgan" else args.scan
            row[arm] = run_arm(data, v, scan, args.steps_mult,
                               prng_impl=args.prng, **kw)
            print(json.dumps({f"{v}.{arm}": round(row[arm], 1)}),
                  flush=True)
        row["ratio"] = round(row["fused"] / row["xla"], 3)
        results[v] = {k: round(val, 3) if k == "ratio" else round(val, 1)
                      for k, val in row.items()}
        # per-row provenance: a later --variants subset merge must not
        # imply the surviving rows were measured under ITS run config
        # (ADVICE r2)
        results[v]["measured_under"] = {
            "scan": args.scan, "prng": args.prng, "backend_alive": alive}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fused_sweep.json")
    # a --variants subset MERGES into the existing table (a single
    # re-measured variant must not erase the other 13 rows)
    if os.path.isfile(path) and len(results) < len(VARIANTS):
        with open(path) as f:
            prev = json.load(f).get("variants", {})
        prev.update(results)
        results = prev
    out = {
        # top-level config = the LATEST run; rows carry their own
        # measured_under provenance when a subset merge mixes sessions
        "config": {"batch": BATCH, "hidden": HIDDEN, "z": Z_DIM,
                   "scan": args.scan, "prng": args.prng,
                   "backend_alive": alive},
        "variants": results,
        "geomean_ratio": round(
            float(__import__("numpy").exp(__import__("numpy").mean(
                [__import__("numpy").log(r["ratio"])
                 for r in results.values()]))), 3),
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
