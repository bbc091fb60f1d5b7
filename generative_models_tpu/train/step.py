"""The single jitted train step — one builder runs every variant.

Reference idiom (SURVEY.md §4.1): a Python loop doing D_steps critic
updates (fresh batch each), then one G update on the LAST critic batch,
with eager per-op dispatch and a host->device copy per batch. Here the
whole thing is ONE traced function:

- D inner loop     -> lax.scan over pre-gathered [d_steps, B, ...] batches
- G update         -> uses the post-update critic params (reference order)
- variant hooks    -> d_post (weight clip), d_state_update (Fisher λ),
                      step_state_update (BEGAN k_t) — all in-trace
- many outer steps -> lax.scan over `scan_steps` minibatch offsets per
                      host dispatch (the big throughput lever: the tiny
                      MNIST MLPs are dispatch-bound in the reference)

Data stays HBM-resident; each outer step gathers its own minibatches
from the epoch permutation on device (data/pipeline.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from generative_models_tpu.config import Config
from generative_models_tpu.losses.base import AdversarialSpec, SingleModelSpec
from generative_models_tpu.train.optim import make_tx

State = Dict[str, Any]


# ------------------------------------------------------------------
# State construction
# ------------------------------------------------------------------

def init_adversarial_state(spec: AdversarialSpec, cfg: Config, rng) -> State:
    g_rng, d_rng, state_rng = jax.random.split(rng, 3)
    g_params = spec.init_g(g_rng, cfg)
    d_params = spec.init_d(d_rng, cfg)
    g_tx = make_tx(cfg, cfg.g_lr)
    d_tx = make_tx(cfg, cfg.d_lr)
    st = {
        "g_params": g_params,
        "d_params": d_params,
        "g_opt": g_tx.init(g_params),
        "d_opt": d_tx.init(d_params),
        "vstate": spec.init_vstate(cfg),
        "step": jnp.zeros((), jnp.int32),
        "rng": state_rng,
    }
    if cfg.ema_decay > 0:
        st["g_ema"] = g_params  # EMA starts at the init point
    if cfg.spectral_projection and cfg.sn_mode == "amortized":
        # carried per-weight power-iteration vectors (ops/spectral.py),
        # burned in at the init weights
        from generative_models_tpu.ops.spectral import init_sn_vectors
        st["sn_v"] = init_sn_vectors(d_params, cfg.sn_iters)
    return st


def init_single_state(spec: SingleModelSpec, cfg: Config, rng) -> State:
    p_rng, state_rng = jax.random.split(rng)
    params = spec.init_params(p_rng, cfg)
    tx = make_tx(cfg, cfg.g_lr)
    st = {
        "params": params,
        "opt": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
        "rng": state_rng,
    }
    if cfg.ema_decay > 0:
        st["ema"] = params
    return st


def init_state(spec, cfg: Config, rng) -> State:
    if spec.adversarial:
        return init_adversarial_state(spec, cfg, rng)
    return init_single_state(spec, cfg, rng)


def batches_per_step(spec, cfg: Config) -> int:
    """Epoch-permutation rows consumed per outer step. Adversarial
    variants draw d_steps fresh critic batches; the G step reuses the
    last one (reference semantics, SURVEY.md §4.1)."""
    return max(cfg.d_steps, 1) if spec.adversarial else 1


def decode_images(x):
    """Post-gather decode for uint8-resident datasets
    (Config.data_storage="uint8": 4x less HBM gather traffic). The
    u8->f32 conversion is the SAME multiply-by-INV_255 float32 op the
    host-side `to_flat_float` uses (a literal `/255.0` would NOT match:
    XLA strength-reduces it to a reciprocal multiply 1 ULP off numpy's
    divide), so trajectories are bit-identical to float32-resident
    storage (tests/test_data.py). No-op for float inputs."""
    if x.dtype == jnp.uint8:
        from generative_models_tpu.data.mnist import INV_255
        return x.astype(jnp.float32) * INV_255
    return x


# ------------------------------------------------------------------
# Step builders
# ------------------------------------------------------------------

def build_adversarial_step(spec: AdversarialSpec, cfg: Config,
                           axis_name: str | None = None):
    """axis_name: set under shard_map — per-device grads/metrics are
    pmean'd over the mesh axis (the explicit-collective DP path); the
    loss rng is folded with the device rank so noise draws are
    independent per shard."""
    g_tx = make_tx(cfg, cfg.g_lr)
    d_tx = make_tx(cfg, cfg.d_lr)
    # compose the optional spectral projection after the variant's
    # d_post slot (the same hook WGAN's clip occupies), so every step
    # builder that honors d_post gets the constraint for free.
    # sn_mode="amortized" carries per-weight power-iteration vectors
    # (state["sn_v"]) through the critic scan — stateful, so it is
    # threaded explicitly rather than composed into the stateless hook.
    d_post = spec.d_post
    amortized_sn = cfg.spectral_projection and cfg.sn_mode == "amortized"
    if amortized_sn:
        from generative_models_tpu.ops.spectral import (
            project_spectral_amortized,
        )
    elif cfg.spectral_projection:
        from generative_models_tpu.ops.spectral import project_spectral

        def d_post(p, c, _base=spec.d_post):
            return project_spectral(_base(p, c), c.sn_target, c.sn_iters)
    d_loss_fn, g_loss_fn = spec.d_loss, spec.g_loss
    if spec.batch_coupled and axis_name is not None:
        # batch-statistic-coupled losses pmean their statistics over the
        # mesh axis so shard_map trains the same objective as jit/single
        d_loss_fn = functools.partial(d_loss_fn, axis_name=axis_name)
        g_loss_fn = functools.partial(g_loss_fn, axis_name=axis_name)
    d_grad = jax.value_and_grad(d_loss_fn, has_aux=True)
    g_grad = jax.value_and_grad(g_loss_fn, has_aux=True)
    d_steps = max(cfg.d_steps, 1)

    def reduce_(tree):
        if axis_name is None:
            return tree
        return jax.lax.pmean(tree, axis_name)

    def shard_rng(r):
        if axis_name is None:
            return r
        return jax.random.fold_in(r, jax.lax.axis_index(axis_name))

    def train_step(state: State, d_batches) -> Tuple[State, Dict]:
        """d_batches: batch pytree with leading dims [d_steps, B]."""
        rng, d_key, g_key = jax.random.split(state["rng"], 3)
        d_rngs = jax.random.split(d_key, d_steps)
        g_params = state["g_params"]

        def d_body(carry, inp):
            if amortized_sn:
                d_params, d_opt, vstate, sn_v = carry
            else:
                d_params, d_opt, vstate = carry
            batch, r = inp
            (_, metrics), grads = d_grad(
                d_params, g_params, batch, shard_rng(r), vstate, cfg)
            grads, metrics = reduce_((grads, metrics))
            updates, d_opt = d_tx.update(grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, updates)
            d_params = d_post(d_params, cfg)
            vstate = spec.d_state_update(vstate, metrics, cfg)
            if amortized_sn:
                d_params, sn_v = project_spectral_amortized(
                    d_params, sn_v, cfg.sn_target)
                return (d_params, d_opt, vstate, sn_v), metrics
            return (d_params, d_opt, vstate), metrics

        d_carry = (state["d_params"], state["d_opt"], state["vstate"])
        if amortized_sn:
            d_carry = d_carry + (state["sn_v"],)
        d_carry, d_metrics_seq = jax.lax.scan(
            d_body, d_carry, (d_batches, d_rngs))
        d_params, d_opt, vstate = d_carry[:3]
        d_metrics = jax.tree.map(lambda a: a[-1], d_metrics_seq)

        g_batch = jax.tree.map(lambda a: a[-1], d_batches)
        (_, g_metrics), g_grads = g_grad(
            state["g_params"], d_params, g_batch, shard_rng(g_key), vstate,
            cfg)
        g_grads, g_metrics = reduce_((g_grads, g_metrics))
        g_updates, g_opt = g_tx.update(g_grads, state["g_opt"],
                                       state["g_params"])
        new_g_params = optax.apply_updates(state["g_params"], g_updates)

        vstate = spec.step_state_update(vstate, d_metrics, g_metrics, cfg)

        new_state = {
            "g_params": new_g_params,
            "d_params": d_params,
            "g_opt": g_opt,
            "d_opt": d_opt,
            "vstate": vstate,
            "step": state["step"] + 1,
            "rng": rng,
        }
        if cfg.ema_decay > 0:  # static: traced once per config
            new_state["g_ema"] = _ema_update(
                state["g_ema"], new_g_params, cfg.ema_decay)
        if amortized_sn:
            new_state["sn_v"] = d_carry[3]
        metrics = {**d_metrics, **g_metrics}
        for k, v in vstate.items():
            metrics[f"vstate_{k}"] = v
        return new_state, metrics

    return train_step


def build_single_step(spec: SingleModelSpec, cfg: Config,
                      axis_name: str | None = None):
    tx = make_tx(cfg, cfg.g_lr)
    loss_fn = spec.loss
    if spec.batch_coupled and axis_name is not None:
        loss_fn = functools.partial(loss_fn, axis_name=axis_name)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: State, batches) -> Tuple[State, Dict]:
        """batches: batch pytree with leading dims [1, B] (uniform with
        the adversarial layout)."""
        batch = jax.tree.map(lambda a: a[0], batches)
        rng, key = jax.random.split(state["rng"])
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        (_, metrics), grads = grad_fn(state["params"], batch, key, cfg)
        if axis_name is not None:
            grads, metrics = jax.lax.pmean((grads, metrics), axis_name)
        updates, opt = tx.update(grads, state["opt"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": params,
            "opt": opt,
            "step": state["step"] + 1,
            "rng": rng,
        }
        if cfg.ema_decay > 0:
            new_state["ema"] = _ema_update(state["ema"], params,
                                           cfg.ema_decay)
        return new_state, metrics

    return train_step


def _ema_update(ema, params, decay: float):
    """ema <- decay*ema + (1-decay)*params, leafwise. One fused
    elementwise pass; never feeds back into gradients."""
    d = jnp.float32(decay)
    return jax.tree.map(lambda e, p: e * d + p * (1.0 - d), ema, params)


def build_step(spec, cfg: Config, axis_name: str | None = None):
    if spec.adversarial:
        return build_adversarial_step(spec, cfg, axis_name)
    return build_single_step(spec, cfg, axis_name)


# ------------------------------------------------------------------
# Many-steps driver: scan over minibatch offsets within an epoch chunk
# ------------------------------------------------------------------

def build_many_steps(spec, cfg: Config, steps_per_epoch: int,
                     batch_sharding=None):
    """Returns fn(state, images, labels, perm_stack, rel_offsets)
    -> (state, metrics) running len(rel_offsets) outer steps in ONE XLA
    computation, crossing epoch boundaries freely.

    - `perm_stack` [E, N]: one epoch permutation per row (epochs the
      chunk touches). Reference semantics: shuffle-without-replacement
      per epoch, partial tail batch dropped — an epoch consumes exactly
      steps_per_epoch * rows_per_step rows.
    - `rel_offsets[k]`: rows consumed before step k, RELATIVE to the
      start of perm_stack's first epoch; epoch index and in-epoch row
      are derived in-trace, so one dispatch can scan thousands of steps
      regardless of epoch length (the host↔device dispatch latency is
      the throughput ceiling for these tiny models).
    - `batch_sharding`: optional callable applying sharding constraints
      along the batch axis (dim 1 of [nb, B, ...]) for jit-path DP —
      see parallel/dp.py.
    """
    train_step = build_step(spec, cfg)
    nb = batches_per_step(spec, cfg)
    bsz = cfg.batch_size
    rows_per_step = nb * bsz
    rows_per_epoch = steps_per_epoch * rows_per_step

    def gather(images, labels, perm_stack, rel_offset):
        e = rel_offset // rows_per_epoch
        r = rel_offset % rows_per_epoch
        idx = jax.lax.dynamic_slice(
            perm_stack, (e, r), (1, rows_per_step)).reshape(rows_per_step)
        flat = {
            "image": decode_images(jnp.take(images, idx, axis=0)),
            "label": jnp.take(labels, idx, axis=0),
        }
        batches = jax.tree.map(
            lambda a: a.reshape((nb, bsz) + a.shape[1:]), flat)
        if batch_sharding is not None:
            batches = batch_sharding(batches)
        return batches

    def many_steps(state, images, labels, perm_stack, rel_offsets):
        def body(state, rel_offset):
            batches = gather(images, labels, perm_stack, rel_offset)
            return train_step(state, batches)
        return jax.lax.scan(body, state, rel_offsets)

    return many_steps
