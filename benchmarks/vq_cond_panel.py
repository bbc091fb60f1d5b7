#!/usr/bin/env python
"""Sample-grid panel for the conditional VQ-prior headline row
(benchmarks/vq_ablation.json `conditional_*_range`: FID 0.35-0.87 /
IS 9.11-9.21 / label_match >=0.987 over 3 seeds): one joint
class-conditional model (the ablation's seed-0 config), sampled with
the gallery's column-cyclic labels. Writes
docs/gallery/vqprior_conditional.png.

    python benchmarks/vq_cond_panel.py [--steps 20000]
"""

import argparse
import os

from panel_lib import train_and_save_grids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--scan", type=int, default=1000)
    ap.add_argument("--out-dir", default=os.path.join("docs", "gallery"))
    args = ap.parse_args()

    train_and_save_grids(
        "vqprior", {"arch": "conv", "ddpm_cond": True},
        [("vqprior_conditional.png", None)],
        steps=args.steps, scan=args.scan, out_dir=args.out_dir,
        use_ema=False)


if __name__ == "__main__":
    main()
