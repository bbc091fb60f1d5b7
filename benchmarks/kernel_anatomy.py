#!/usr/bin/env python
"""Fused-kernel step-time decomposition (chip): where do the ~19 µs
per step go when params+optimizer state are VMEM-resident?

The fused chunk kernel ties the XLA step at the headline config on the
current (fast) tunnel host (benchmarks/fused_ab.json: 1.003x), while
bf16 MXU operands are neutral (not MXU-bound) and the kernel moves no
per-step state HBM traffic (not HBM-bound). This harness locates the
remaining budget with config-knob ablations — no kernel changes:

  arm                  isolates
  ------------------   ------------------------------------------
  adam   (baseline)    full body
  rmsprop              optimizer VPU work (~half of adam's ops/param)
  hidden=100           params/VPU+MXU scaled ~4x down: a step-time
                       drop << 4x reveals fixed per-step overhead
                       (stream DMA waits, loop, metrics row DMA)
  batch=32             MXU row count scaled ~3x down at fixed params:
                       moves only matmul+stream cost
  ema                  one extra VMEM plane + VPU pass over G params

Same timing discipline as benchmarks/fused_ab.py: value-fetch fence,
warmup chunk excluded, best-of-2. Prints one JSON line per arm and a
summary; writes benchmarks/kernel_anatomy.json.

Usage: python benchmarks/kernel_anatomy.py [--scan N] [--steps-mult M]
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

    cfg = variant_config("nsgan", z_dim=Z_DIM, scan_steps=scan, seed=0,
                         prng_impl="rbg", fused_step=True, **cfg_kw)
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
    ap.add_argument("--steps-mult", type=int, default=5)
    args = ap.parse_args()

    from __graft_entry__ import ensure_live_backend
    alive = ensure_live_backend()

    from generative_models_tpu.data.mnist import load_mnist
    data = load_mnist(allow_synthetic=True, synthetic_sizes=(12000, 1000))

    arms = {
        "adam": {},
        "rmsprop": {"optimizer": "rmsprop", "g_lr": 5e-5, "d_lr": 5e-5},
        "hidden100": {"hidden_dim": 100},
        "batch32": {"batch_size": 32},
        "ema": {"ema_decay": 0.999},
    }
    rates = {}
    for name, kw in arms.items():
        kw = dict(kw)
        kw.setdefault("batch_size", BATCH)
        kw.setdefault("hidden_dim", HIDDEN)
        rates[name] = run_arm(data, args.scan, args.steps_mult, **kw)
        print(json.dumps({name: round(rates[name], 1),
                          "us_per_step": round(1e6 / rates[name], 2)}),
              flush=True)

    out = {
        "config": {"batch": BATCH, "hidden": HIDDEN, "z": Z_DIM,
                   "scan": args.scan, "prng": "rbg",
                   "backend_alive": alive},
        "steps_per_sec": {k: round(v, 1) for k, v in rates.items()},
        "us_per_step": {k: round(1e6 / v, 2) for k, v in rates.items()},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "kernel_anatomy.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["us_per_step"]))


if __name__ == "__main__":
    main()
