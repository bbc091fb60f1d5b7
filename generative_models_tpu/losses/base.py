"""Loss-head spec types — the pluggable core of the framework.

The reference duplicates a `Trainer` per variant, differing only in the
loss computation and variant-specific mechanism (SURVEY.md §1). Here a
variant is a declarative spec of pure functions; ONE trainer
(`train/step.py`) runs them all.

Two shapes:

- :class:`AdversarialSpec` — alternating D/G training. The trainer:
  for each of cfg.d_steps: grad(d_loss) -> optimizer -> d_post (e.g.
  WGAN weight clip) -> d_state_update (e.g. FisherGAN λ ascent);
  then grad(g_loss) -> optimizer; then step_state_update (e.g. BEGAN
  k_t control). All inside one jitted, scannable step.
- :class:`SingleModelSpec` — single-objective training (VAE family).

`vstate` is the variant's non-gradient carried state (k_t, λ, ...): a
dict of f32 scalars whose structure is static per variant. Metrics dicts
must likewise have static structure (they ride through lax.scan).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

Params = Any
Batch = Dict[str, Any]
Metrics = Dict[str, Any]
VState = Dict[str, Any]


def _identity_post(d_params, cfg):
    return d_params


def _identity_dstate(vstate, d_metrics, cfg):
    return vstate


def _identity_step_state(vstate, d_metrics, g_metrics, cfg):
    return vstate


def _empty_vstate(cfg) -> VState:
    return {}


@dataclasses.dataclass(frozen=True)
class AdversarialSpec:
    name: str
    init_g: Callable  # (rng, cfg) -> g_params
    init_d: Callable  # (rng, cfg) -> d_params
    # (d_params, g_params, batch, rng, vstate, cfg) -> (loss, metrics)
    d_loss: Callable
    # (g_params, d_params, batch, rng, vstate, cfg) -> (loss, metrics)
    g_loss: Callable
    sample: Callable  # (g_params, rng, n, cfg) -> [n, image_dim] in [0,1]
    d_post: Callable = _identity_post
    d_state_update: Callable = _identity_dstate
    step_state_update: Callable = _identity_step_state
    init_vstate: Callable = _empty_vstate
    adversarial: bool = True
    # True for gradient-penalty objectives: their grad-of-grad cannot
    # pass through custom_vjp Pallas kernels (no forward-mode rule), so
    # the trainer pins the XLA op path for these variants.
    needs_second_order: bool = False
    # True for losses that couple samples through batch statistics
    # (RaGAN's relativistic means, FisherGAN's omega constraint): their
    # loss fns take an extra `axis_name=` kwarg and pmean those
    # statistics over the DP mesh axis under shard_map, keeping the
    # trained objective identical to the single-device/jit-path one.
    batch_coupled: bool = False


@dataclasses.dataclass(frozen=True)
class SingleModelSpec:
    name: str
    init_params: Callable  # (rng, cfg) -> params
    loss: Callable         # (params, batch, rng, cfg) -> (loss, metrics)
    sample: Callable       # (params, rng, n, cfg) -> [n, image_dim]
    adversarial: bool = False
    # see AdversarialSpec.batch_coupled (BIR-VAE's batch norm)
    batch_coupled: bool = False
