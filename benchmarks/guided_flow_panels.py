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
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--scan", type=int, default=1000)
    ap.add_argument("--out-dir", default=os.path.join("docs", "gallery"))
    args = ap.parse_args()

    from __graft_entry__ import ensure_live_backend
    ensure_live_backend()

    import jax
    import numpy as np

    from generative_models_tpu.config import variant_config
    from generative_models_tpu.data.mnist import load_mnist
    from generative_models_tpu.losses.registry import get_variant
    from generative_models_tpu.train.trainer import Trainer
    from generative_models_tpu.utils.viz import save_image_grid

    raw = load_mnist(allow_synthetic=True, synthetic_sizes=(12000, 2000))
    cfg = variant_config("flow", arch="conv", ddpm_cond=True,
                         scan_steps=args.scan, seed=0)
    spec = get_variant("flow")
    t = Trainer(config=cfg, data=raw)
    t.train(steps=args.steps)
    params = t.state["ema"]

    os.makedirs(args.out_dir, exist_ok=True)
    for w, tag in ((0.0, "w0"), (0.3, "w03"), (4.0, "w4")):
        imgs = spec.sample(params, jax.random.PRNGKey(7), 64,
                           cfg.replace(ddpm_guidance=w))
        p = os.path.join(args.out_dir, f"flow_guided_{tag}.png")
        save_image_grid(p, np.asarray(imgs))
        print("wrote", p, flush=True)


if __name__ == "__main__":
    main()
