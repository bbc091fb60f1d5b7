"""Shared skeleton for one-model gallery-panel scripts
(guided_flow_panels.py, vq_cond_panel.py): probe the backend, train
one model at the ablation's seed-0 config, and save 64-sample grids —
so the backend-probe/data-fallback/fencing discipline lives in ONE
place instead of a copy per panel."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_and_save_grids(variant: str, cfg_over: dict, grids, steps: int,
                         scan: int, out_dir: str, use_ema: bool) -> None:
    """Train `variant` once (seed 0) and write one 64-sample grid per
    (filename, extra_cfg_over) in `grids` — extras are sampling-only
    knobs applied via cfg.replace on the SAME trained weights."""
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
    cfg = variant_config(variant, scan_steps=scan, seed=0, **cfg_over)
    spec = get_variant(variant)
    t = Trainer(config=cfg, data=raw)
    t.train(steps=steps)
    params = t.state["ema"] if use_ema else t.state["params"]

    os.makedirs(out_dir, exist_ok=True)
    for fname, extra in grids:
        c = cfg.replace(**extra) if extra else cfg
        imgs = spec.sample(params, jax.random.PRNGKey(7), 64, c)
        p = os.path.join(out_dir, fname)
        save_image_grid(p, np.asarray(imgs))
        print("wrote", p, flush=True)
