"""Optimizers, matching torch semantics so loss trajectories are
comparable with the reference (SURVEY.md §9.3).

- Adam: optax.adam with torch's bias correction (identical update rule
  given the same (lr, b1, b2, eps)).
- RMSprop (WGAN paper): torch defaults alpha=0.99, eps=1e-8, no
  momentum, non-centered -> optax.rmsprop(decay=0.99, eps=1e-8).
"""

from __future__ import annotations

import optax

from generative_models_tpu.config import Config


def make_tx(cfg: Config, lr: float) -> optax.GradientTransformation:
    if cfg.optimizer == "adam":
        return optax.adam(lr, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps)
    if cfg.optimizer == "rmsprop":
        return optax.rmsprop(lr, decay=0.99, eps=1e-8)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
