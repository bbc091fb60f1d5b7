"""Measured per-host fused-step auto policy (VERDICT r2 next #2).

Round 2 baked ``FUSED_AUTO_WINNERS`` from one session's sweep — but the
repo's own cross-session table (BASELINE.md fused section) shows the
fused-vs-XLA margin flips with the host the tunnel lands on (mmgan
1.172x -> 1.002x, wgan 0.815x -> 1.207x between two sessions). A policy
derived from one host is stale on the next. The honest "auto" is
measured on THIS host:

- on the first fused-eligible build on a live TPU, run a micro A/B —
  both arms' many-steps fns on synthetic rows at the exact training
  shapes, value-fenced (the same timing discipline as bench.py:
  `block_until_ready` is unreliable over the axon tunnel, so the fence
  is a scalar fetch), warmup chunk excluded;
- cache the verdict in ``~/.cache/gmtpu/fused_auto.json`` keyed by
  (host tag, variant, shape signature); subsequent builds are free;
- off-TPU, when measurement is disabled (``GMTPU_FUSED_AB=0``), or on
  any measurement failure, fall back to the round-2 static list
  (``pallas_train.FUSED_AUTO_WINNERS``).

The measurement costs one extra compile of each arm at a short scan
(~hundreds of steps); per-step rate at short scans tracks the long-scan
ranking because both arms amortize dispatch identically within one
chunk. `GMTPU_FUSED_AB_STEPS` overrides the sample size.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

_CACHE_ENV = "GMTPU_POLICY_CACHE"
_DEFAULT_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "gmtpu", "fused_auto.json")
# steps per timed rep; 3 reps per arm, best-of taken
_AB_STEPS = int(os.environ.get("GMTPU_FUSED_AB_STEPS", "512"))
_AB_REPS = 3
# the kernel must beat XLA by this margin to win (ties -> XLA, the
# simpler path — same tie-break rule round 2 used)
_WIN_MARGIN = 1.01


def _cache_path() -> str:
    return os.environ.get(_CACHE_ENV, _DEFAULT_CACHE)


def host_tag() -> str:
    """Identifies the (dispatch host, chip kind) pair the measurement
    is valid for. The host dominates the fused-vs-XLA margin for these
    dispatch-bound models (BASELINE.md cross-session table)."""
    import platform

    import jax
    try:
        kind = jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:
        kind = "unknown"
    return f"{platform.node()}|{kind}"


def policy_key(cfg) -> str:
    return "|".join(str(v) for v in (
        cfg.variant, cfg.batch_size, cfg.hidden_dim, cfg.z_dim,
        cfg.d_steps, cfg.optimizer, cfg.dtype, cfg.prng_impl,
        cfg.scan_steps, cfg.ema_decay > 0))


def _load_cache() -> dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except Exception:
        return {}


def _store(key: str, entry: dict) -> None:
    path = _cache_path()
    cache = _load_cache()
    cache[key] = entry
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except OSError:
        pass  # cache is best-effort; the verdict still applies in-process


def _measure_pair(spec, cfg) -> dict:
    """Times both arms at the exact training shapes on synthetic rows.
    Returns {"fused": steps/s, "xla": steps/s}. Separated out so tests
    can fake a slow kernel."""
    import jax
    import jax.numpy as jnp

    from generative_models_tpu.ops.pallas_train import (
        build_fused_many_steps,
    )
    from generative_models_tpu.train import step as step_lib

    steps = _AB_STEPS
    nb = step_lib.batches_per_step(spec, cfg)
    rows_per_step = nb * cfg.batch_size
    # a few steps per "epoch" keeps the permutation stack tiny while
    # exercising the real gather; epochs the window touches are derived
    # in-trace exactly as in training
    steps_per_epoch = 8
    n_rows = steps_per_epoch * rows_per_step
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((n_rows, cfg.image_dim),
                                    dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, cfg.num_classes, n_rows,
                                      dtype=np.int64))
    epochs = steps * rows_per_step // n_rows + 2
    perm = jnp.stack([jnp.asarray(rng.permutation(n_rows))
                      for _ in range(epochs)])
    rel = jnp.arange(steps, dtype=jnp.int32) * rows_per_step

    if cfg.prng_impl == "threefry":
        key = jax.random.PRNGKey(cfg.seed)
    else:
        key = jax.random.key(cfg.seed, impl=cfg.prng_impl)
    state0 = step_lib.init_state(spec, cfg, key)

    def time_arm(many):
        st = state0
        st, metrics = many(st, images, labels, perm, rel)   # compile+warm
        float(np.asarray(jax.tree.leaves(metrics)[0])[-1])  # fence
        best = 0.0
        for _ in range(_AB_REPS):
            t0 = time.perf_counter()
            st, metrics = many(st, images, labels, perm, rel)
            float(np.asarray(jax.tree.leaves(metrics)[0])[-1])
            best = max(best, steps / (time.perf_counter() - t0))
        return best

    xla = time_arm(jax.jit(step_lib.build_many_steps(
        spec, cfg, steps_per_epoch)))
    fused = time_arm(jax.jit(build_fused_many_steps(
        spec, cfg, steps_per_epoch)))
    return {"fused": fused, "xla": xla}


def resolve_auto(spec, cfg) -> bool:
    """The measured verdict for fused_step="auto" on a live TPU.
    Consults the per-host cache, measures once on miss, falls back to
    the static round-2 list when measurement is off or fails."""
    from generative_models_tpu.ops.pallas_train import FUSED_AUTO_WINNERS

    static = cfg.variant in FUSED_AUTO_WINNERS
    if os.environ.get("GMTPU_FUSED_AB", "1") == "0":
        return static
    key = f"{host_tag()}::{policy_key(cfg)}"
    cached = _load_cache().get(key)
    if cached is not None:
        return bool(cached["use_fused"])
    try:
        rates = _measure_pair(spec, cfg)
    except Exception:
        # Measurement failures are often TRANSIENT (tunnel drop mid-A/B,
        # co-tenant OOM) — do NOT cache the verdict, or one glitch pins
        # this host to the XLA step forever (round-3 review). Fall back
        # to the round-2 static list, as the module docstring promises;
        # a healthy later build re-measures.
        from generative_models_tpu.ops.pallas_train import (
            FUSED_AUTO_WINNERS,
        )
        return cfg.variant in FUSED_AUTO_WINNERS
    use_fused = rates["fused"] >= _WIN_MARGIN * rates["xla"]
    _store(key, {"use_fused": use_fused,
                 "fused_steps_per_sec": round(rates["fused"], 1),
                 "xla_steps_per_sec": round(rates["xla"], 1),
                 "ab_steps": _AB_STEPS})
    return use_fused
