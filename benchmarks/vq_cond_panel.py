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
    cfg = variant_config("vqprior", arch="conv", ddpm_cond=True,
                         scan_steps=args.scan, seed=0)
    spec = get_variant("vqprior")
    t = Trainer(config=cfg, data=raw)
    t.train(steps=args.steps)

    os.makedirs(args.out_dir, exist_ok=True)
    imgs = spec.sample(t.state["params"], jax.random.PRNGKey(7), 64, cfg)
    p = os.path.join(args.out_dir, "vqprior_conditional.png")
    save_image_grid(p, np.asarray(imgs))
    print("wrote", p, flush=True)


if __name__ == "__main__":
    main()
