"""Generate the README-gallery equivalent: train every variant for a
while on the attached chip and save a sample grid + loss curve per
variant under docs/gallery/, plus docs/gallery.md embedding them.

`python benchmarks/gallery.py [--steps N]`
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GALLERY_DIR = os.path.join("docs", "gallery")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--variants", nargs="*", default=None)
    args = ap.parse_args()

    from generative_models_tpu.config import variant_config
    from generative_models_tpu.data.mnist import load_mnist
    from generative_models_tpu.losses.registry import available_variants
    from generative_models_tpu.train.trainer import Trainer
    from generative_models_tpu.utils.viz import plot_losses, save_image_grid

    data = load_mnist(allow_synthetic=True, synthetic_sizes=(12000, 1000))
    os.makedirs(GALLERY_DIR, exist_ok=True)
    variants = args.variants or available_variants()
    rows = []
    for variant in variants:
        cfg = variant_config(variant, batch_size=100, scan_steps=1000, seed=0)
        t = Trainer(config=cfg, data=data)
        t.train(steps=args.steps)
        grid = save_image_grid(
            os.path.join(GALLERY_DIR, f"{variant}_samples.png"),
            t.sample(64))
        curve = plot_losses(
            os.path.join(GALLERY_DIR, f"{variant}_loss.png"), t.history)
        rows.append((variant, os.path.basename(grid),
                     os.path.basename(curve)))
        print(f"{variant}: {grid}", flush=True)

    with open(os.path.join("docs", "gallery.md"), "w") as f:
        f.write("# Gallery\n\nSamples and loss curves after "
                f"{args.steps} steps per variant (batch 100, registry "
                "hyperparameters, one TPU v5lite chip). Regenerate with "
                "`python benchmarks/gallery.py`.\n\n")
        f.write("| variant | samples | losses |\n|---|---|---|\n")
        for v, g, c in rows:
            f.write(f"| {v} | ![{v}](gallery/{g}) | "
                    f"![{v} loss](gallery/{c}) |\n")
    print("wrote docs/gallery.md")


if __name__ == "__main__":
    main()
