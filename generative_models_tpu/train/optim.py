"""Optimizers, matching torch semantics so loss trajectories are
comparable with the reference (SURVEY.md §9.3).

- Adam: optax.adam with torch's bias correction (identical update rule
  given the same (lr, b1, b2, eps)).
- RMSprop (WGAN paper): torch defaults alpha=0.99, eps=1e-8, no
  momentum, non-centered, and eps OUTSIDE the sqrt
  (g / (sqrt(nu) + eps)) -> optax.rmsprop(decay=0.99, eps=1e-8,
  eps_in_sqrt=False). optax's default eps_in_sqrt=True is a different
  update rule (g * rsqrt(nu + eps)) that diverges from torch by ~5e-5
  relative per step — enough to fail 50-step trajectory pins
  (tests/test_trajectory_parity_all.py::test_wgan).
"""

from __future__ import annotations

import optax

from generative_models_tpu.config import Config


def make_tx(cfg: Config, lr: float) -> optax.GradientTransformation:
    if cfg.optimizer == "adam":
        return optax.adam(lr, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps)
    if cfg.optimizer == "rmsprop":
        return optax.rmsprop(lr, decay=0.99, eps=1e-8, eps_in_sqrt=False)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
