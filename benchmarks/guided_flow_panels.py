#!/usr/bin/env python
"""Sample-grid panels for the measured flow-guidance story
(benchmarks/flow_guidance.json): one conditional conv flow model
(the ablation's seed-0 config), the SAME weights sampled at

    w=0    (unguided conditional),
    w=0.3  (the measured sweet spot — FID 0.33-0.38, the zoo's best),
    w=4    (overguided: IS keeps rising while FID pays 18-21)

so the gallery shows the precision-for-diversity trade the numbers
measure. Writes docs/gallery/flow_guided_w{0,03,4}.png.

    python benchmarks/guided_flow_panels.py [--steps 20000]
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
        "flow", {"arch": "conv", "ddpm_cond": True},
        [(f"flow_guided_{tag}.png", {"ddpm_guidance": w})
         for w, tag in ((0.0, "w0"), (0.3, "w03"), (4.0, "w4"))],
        steps=args.steps, scan=args.scan, out_dir=args.out_dir,
        use_ema=True)


if __name__ == "__main__":
    main()
