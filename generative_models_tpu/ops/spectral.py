"""Spectral weight projection — a Lipschitz mechanism composable with
every variant (`Config.spectral_projection`).

Motivation, measured in this repo (docs/gallery.md analysis): on the
conv stacks the unregularized objectives (ragan, lsgan, nsgan family)
mode-drop between 6k and 20k steps while every penalty-based variant
keeps improving, and generator EMA does NOT rescue them. The missing
ingredient is a Lipschitz constraint on the critic; this module
provides it as a weight-space projection applied through the trainer's
existing `d_post` hook (the same slot WGAN's clip uses), so it
composes with any loss head and both architectures without touching
them.

Mechanism: after each critic update, every weight matrix W (conv
kernels reshaped [kh*kw*cin, cout]) is scaled by
1 / max(1, sigma(W)/target) — i.e. projected onto the spectral-norm
ball of radius `sn_target`. Two estimators for sigma
(`Config.sn_mode`):

- **"amortized"** (default): Miyato et al. 2018's single-step
  amortization — carry one power-iteration vector v per weight in the
  TrainState (`state["sn_v"]`), refine it ONE matvec pair per critic
  step. The estimate tracks the slowly-moving weights (projection only
  scales W, so the carried singular vector stays valid across the
  projection itself); a burn-in of `sn_iters` pairs at init seeds it.
  Cost: ~1/sn_iters of the fresh chain (VERDICT r1 next #2 — the
  fresh form cost −59% MLP / −20% conv; measured amortized numbers in
  BASELINE.md's spectral section).
- **"fresh"**: the round-1 stateless form — `sn_iters` power
  iterations from a DETERMINISTIC start (ones/sqrt(n)) every step; a
  pure function of the weights, nothing carried, kept as the
  reference estimator and for one-shot spec-precision measurements.

The projection form (scale the stored weights) rather than Miyato's
forward-pass reparameterization fits the pure-pytree design: the
constraint is enforced on exactly the weights the next forward uses.
Fresh-start power iteration converges geometrically in the
singular-value-gap ratio; the default 10 iterations track SVD within a
few percent on these sizes, and iters=50 lands within ~1e-4
(unit-tested).

Cost of the FRESH form (measured, one chip): an inherently sequential
matvec chain per weight. First implementation with lax.scan(50): 8.5x
end-to-end at the MLP headline (34.0k -> 4.0k steps/s). Unrolled at
the default 10 iterations: MLP headline 34.1k -> 14.0k steps/s (-59%:
the ~40 us chain dominates a ~29 us dispatch-bound step) and conv
3.65k -> 2.93k (-20%) — the motivation for the amortized default.
Quality effect at the same setting: rescues the conv late-horizon
mode dropping (ragan IS 3.26 -> 5.63, lsgan 4.43 -> 5.25 with FID
62 -> 15 at 20k; EMA had NOT rescued them — docs/gallery.md
analysis). OFF by default: a quality/stability knob priced honestly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def spectral_sigma(w, iters: int = 10):
    """Top singular value of a 2-D matrix via power iteration with a
    deterministic start (ones / sqrt(n)).

    UNROLLED (Python loop, trace-time) rather than lax.scan: inside the
    already-scanned train step a nested scan of tiny matvecs is pure
    sequential-dispatch latency — the first implementation used
    scan(50) and cost 8.5x on the MLP headline (34.0k -> 4.0k steps/s,
    measured); unrolling lets XLA schedule the chain tightly. 10
    fresh-start iterations track SVD within a few percent on these
    sizes — ample for a projection re-applied EVERY critic step (the
    constraint is enforced in the limit, errors do not accumulate);
    pass iters=50 for 1e-4-grade estimates (unit-tested)."""
    # non-2D inputs matricize over the LAST axis ([... , cout] ->
    # [prod(...), cout]) — the same reshaped-SN convention
    # _project_leaf enforces, so a direct call on a conv kernel
    # measures the norm the projection constrains
    m = w.reshape(-1, w.shape[-1]) if w.ndim != 2 else w
    n = m.shape[1]
    v = jnp.full((n,), 1.0 / jnp.sqrt(jnp.float32(n)), m.dtype)
    for _ in range(iters):
        u = m @ v
        u = u / (jnp.linalg.norm(u) + _EPS)
        v = m.T @ u
        v = v / (jnp.linalg.norm(v) + _EPS)
    return jnp.linalg.norm(m @ v)


def _is_weight_path(path, leaf) -> bool:
    last = path[-1]
    return (isinstance(last, jax.tree_util.DictKey)
            and last.key == "w" and leaf.ndim >= 2)


def _project_leaf(w, target: float, iters: int):
    """Scale w onto the sigma <= target ball. Conv kernels
    [kh, kw, cin, cout] are treated as [kh*kw*cin, cout] (the standard
    reshaped-SN convention)."""
    m = w.reshape(-1, w.shape[-1])
    sigma = spectral_sigma(m, iters)
    scale = 1.0 / jnp.maximum(1.0, sigma / target)
    return w * scale


def project_spectral(params, target: float = 1.0, iters: int = 10):
    """Fresh-start projection (Config.sn_mode="fresh"): project every
    weight leaf (dict key "w", ndim >= 2) of a critic param pytree onto
    the spectral ball; biases and norm scales pass through untouched."""
    def visit(path, leaf):
        return (_project_leaf(leaf, target, iters)
                if _is_weight_path(path, leaf) else leaf)

    return jax.tree_util.tree_map_with_path(visit, params)


# ------------------------------------------------------------------
# Amortized (Miyato 2018) estimator — carried right-singular vectors
# ------------------------------------------------------------------

def init_sn_vectors(params, iters: int = 10):
    """Carried power-iteration state for `project_spectral_amortized`:
    one right-singular-vector estimate v [cout] per weight leaf,
    burned in with `iters` matvec pairs from the deterministic start
    at the weight's current (init) value. Non-weight leaves map to an
    empty placeholder so the pytree structure mirrors the params
    (checkpoints and scan carries handle it uniformly)."""
    def visit(path, leaf):
        if not _is_weight_path(path, leaf):
            return jnp.zeros((0,), jnp.float32)
        m = leaf.reshape(-1, leaf.shape[-1])
        n = m.shape[1]
        v = jnp.full((n,), 1.0 / jnp.sqrt(jnp.float32(n)), m.dtype)
        for _ in range(iters):
            u = m @ v
            u = u / (jnp.linalg.norm(u) + _EPS)
            v = m.T @ u
            v = v / (jnp.linalg.norm(v) + _EPS)
        return v

    return jax.tree_util.tree_map_with_path(visit, params)


def project_spectral_amortized(params, vs, target: float = 1.0):
    """One amortized projection step: for each weight leaf, refine the
    carried v with a SINGLE matvec pair (u = norm(m v); v' ∝ mᵀu whose
    norm IS the sigma estimate — Miyato 2018 §A), project the weight
    onto the sigma <= target ball, and return (params', vs'). The
    projection is a pure scale, so the carried singular vector remains
    valid for the projected matrix."""
    def visit(path, leaf, v):
        if not _is_weight_path(path, leaf):
            return (leaf, v)
        m = leaf.reshape(-1, leaf.shape[-1])
        u = m @ v
        u = u / (jnp.linalg.norm(u) + _EPS)
        v_raw = m.T @ u
        sigma = jnp.linalg.norm(v_raw)
        v_new = v_raw / (sigma + _EPS)
        scale = 1.0 / jnp.maximum(1.0, sigma / target)
        return (leaf * scale, v_new)

    pairs = jax.tree_util.tree_map_with_path(visit, params, vs)
    is_pair = lambda x: isinstance(x, tuple)  # noqa: E731
    new_params = jax.tree.map(lambda t: t[0], pairs, is_leaf=is_pair)
    new_vs = jax.tree.map(lambda t: t[1], pairs, is_leaf=is_pair)
    return new_params, new_vs
