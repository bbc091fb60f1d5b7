#!/usr/bin/env python
"""Throughput cost of the spectral projection, fresh vs amortized
(VERDICT r1 next #2 "done" criterion: amortized cost ≤10% on the MLP
headline — fresh was −59% — and ≤5% on conv — fresh was −20%).

Three arms per architecture: off / sn_mode=fresh / sn_mode=amortized,
all other settings the headline's. Fencing per BASELINE.md (value-fetch
wall_time, warmup chunk excluded, best-of-2).

Usage: python benchmarks/spectral_cost.py [--arch mlp|conv|both]
Writes benchmarks/spectral_cost.json and prints one JSON line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(data, arch, scan, mult, **kw):
    from generative_models_tpu.config import variant_config
    from generative_models_tpu.train.trainer import Trainer

    base = dict(batch_size=100, hidden_dim=400, z_dim=128, seed=0,
                scan_steps=scan, prng_impl="rbg")
    if arch == "conv":
        base.update(arch="conv")
    cfg = variant_config("nsgan", **base, **kw)
    t = Trainer(config=cfg, data=data)
    t.train(steps=scan, sample_every=-1)
    best = 0.0
    for _ in range(2):
        t.train(steps=mult * scan, sample_every=-1)
        best = max(best, mult * scan / t.wall_time)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="both", choices=["mlp", "conv", "both"])
    ap.add_argument("--scan-mlp", type=int, default=8000)
    ap.add_argument("--scan-conv", type=int, default=1000)
    ap.add_argument("--mult", type=int, default=3)
    args = ap.parse_args()

    from __graft_entry__ import ensure_live_backend
    alive = ensure_live_backend()
    from generative_models_tpu.data.mnist import load_mnist
    data = load_mnist(allow_synthetic=True, synthetic_sizes=(12000, 1000))

    out = {"backend_alive": alive}
    archs = ["mlp", "conv"] if args.arch == "both" else [args.arch]
    for arch in archs:
        scan = args.scan_mlp if arch == "mlp" else args.scan_conv
        off = run_arm(data, arch, scan, args.mult)
        fresh = run_arm(data, arch, scan, args.mult,
                        spectral_projection=True, sn_mode="fresh")
        amort = run_arm(data, arch, scan, args.mult,
                        spectral_projection=True, sn_mode="amortized")
        out[arch] = {
            "off_steps_per_sec": round(off, 1),
            "fresh_steps_per_sec": round(fresh, 1),
            "amortized_steps_per_sec": round(amort, 1),
            "fresh_cost_pct": round(100 * (1 - fresh / off), 1),
            "amortized_cost_pct": round(100 * (1 - amort / off), 1),
        }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "spectral_cost.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
