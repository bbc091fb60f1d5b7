#!/usr/bin/env python
"""Conv-path bf16 crossover (VERDICT r2 next #6): f32 vs bf16 MXU
operands across batch sizes, nsgan --arch conv, value-fenced timing
(Trainer.wall_time — same discipline as bench.py/fused_ab.py). The
result drives `Config.dtype="auto"` for arch=conv: bf16 above the
measured crossover batch, f32 below (explicit --dtype always wins).

Usage: python benchmarks/conv_bf16_crossover.py [--batches 100,256,512,1024]
Writes benchmarks/conv_bf16_crossover.json and prints JSON lines.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(data, batch, dtype, scan, reps=2):
    from generative_models_tpu.config import variant_config
    from generative_models_tpu.train.trainer import Trainer

    cfg = variant_config(
        "nsgan", arch="conv", batch_size=batch, dtype=dtype,
        scan_steps=scan, seed=0)
    t = Trainer(config=cfg, data=data)
    t.train(steps=scan, sample_every=-1)          # compile + warmup
    best = 0.0
    for _ in range(reps):
        t.train(steps=2 * scan, sample_every=-1)
        best = max(best, 2 * scan / t.wall_time)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="100,256,512,1024")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from __graft_entry__ import ensure_live_backend
    alive = ensure_live_backend()

    from generative_models_tpu.data.mnist import load_mnist
    data = load_mnist(allow_synthetic=True, synthetic_sizes=(16384, 1000))

    rows = []
    for b in batches:
        scan = max(200, min(2000, 200_000 // b))
        f32 = run_arm(data, b, "float32", scan)
        bf16 = run_arm(data, b, "bfloat16", scan)
        row = {"batch": b, "scan": scan,
               "f32_steps_per_sec": round(f32, 1),
               "bf16_steps_per_sec": round(bf16, 1),
               "bf16_over_f32": round(bf16 / f32, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"config": {"variant": "nsgan", "arch": "conv",
                      "backend_alive": alive},
           "rows": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "conv_bf16_crossover.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
