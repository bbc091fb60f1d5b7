"""End-to-end Pallas-vs-XLA crossover: NSGAN G+D train-step throughput
as a function of batch size (VERDICT r1 #7 — find where the whole-MLP
Pallas kernel pays END-TO-END, not just in the fwd microbench, and
justify the backend default with data).

`python benchmarks/crossover.py` writes benchmarks/crossover_results.json
and prints a markdown table. Uses the real Trainer so the comparison
includes everything: data gather, D scan, both optimizers, metrics.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = (100, 512, 1024, 2048, 4096, 8192)


def run(batch: int, use_pallas: bool, steps: int, scan: int, data) -> float:
    from generative_models_tpu.config import variant_config
    from generative_models_tpu.train.trainer import Trainer

    cfg = variant_config("nsgan", batch_size=batch, scan_steps=scan,
                         use_pallas=use_pallas, seed=0)
    t = Trainer(config=cfg, data=data)
    t.train(steps=scan)    # compile + warmup
    t.train(steps=steps)
    return steps / t.wall_time


def main():
    from generative_models_tpu.data.mnist import load_mnist

    # pool large enough for one epoch at the biggest batch
    data = load_mnist(allow_synthetic=True, synthetic_sizes=(60000, 1000))
    rows = []
    for b in BATCHES:
        # keep per-measurement step counts sane as batches grow
        scan = max(200, min(2000, 200_000 // b))
        steps = 3 * scan
        sps_x = run(b, False, steps, scan, data)
        sps_p = run(b, True, steps, scan, data)
        row = {
            "batch": b,
            "xla_steps_per_sec": round(sps_x, 1),
            "pallas_steps_per_sec": round(sps_p, 1),
            "xla_samples_per_sec": round(sps_x * b),
            "pallas_samples_per_sec": round(sps_p * b),
            "pallas_speedup": round(sps_p / sps_x, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "crossover_results.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)

    print("\n| batch | XLA steps/s | Pallas steps/s | Pallas speedup |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['batch']} | {r['xla_steps_per_sec']} "
              f"| {r['pallas_steps_per_sec']} | {r['pallas_speedup']} |")


if __name__ == "__main__":
    main()
