"""Pipeline parallelism over the causal-transformer prior's blocks.

The reference is single-device and the zoo's MLP stacks are 2 layers
deep — nothing to pipeline — so PP was a documented scope decision
(docs/design.md §7) until the discrete-latent family added the one
model where pipelining is canonical: the autoregressive prior
(models/ar_prior.py), a stack of `vq_prior_layers` identical pre-LN
GPT blocks. This module cuts that stack into contiguous stages over a
``pipe`` mesh axis and runs the classic GPipe microbatch schedule
(Huang et al. 2019), expressed the TPU-idiomatic way:

- the block parameters are STACKED along a leading layer axis and
  sharded ``P("pipe")`` — each device materializes only its own
  ``layers/stages`` blocks (the memory win PP exists for at scale);
- inside one ``shard_map``, a ``lax.scan`` over
  ``n_micro + n_stages - 1`` ticks applies each device's local blocks
  (an inner scan over the stacked pytree) and hands activations to the
  next stage with ``jax.lax.ppermute`` — a point-to-point hop that
  rides a single ICI link, the cheapest collective on the mesh;
- the bubble (first/last ``n_stages - 1`` ticks) is handled by
  masking: invalid ticks compute on clamped inputs and their outputs
  are never collected, so the schedule is a single static-shape scan —
  no data-dependent Python control flow, one XLA compilation.

Everything is differentiable (scan, ppermute, where, psum), so
``jax.grad`` of a pipelined loss IS pipeline-parallel training: the
backward pass replays the schedule in reverse (ppermute's transpose is
the inverted permutation), which is exactly GPipe's synchronous
fill-drain backward. Equivalence with the single-device
``ar_prior.prior_apply`` — logits, loss, AND grads — is pinned on an
8-virtual-device CPU mesh in tests/test_pp.py; the block math is
imported from models/ar_prior.py, not re-derived, so the two paths
cannot drift.

Composes with data parallelism over a 2-D ``(data, pipe)`` mesh: the
batch shards over ``data``, the layer stack over ``pipe``; inside the
shard_map every device sees its local microbatch slice and its local
stage. Embedding/ln_f/head are tiny (a few [W]-/[K]-sized tensors) and
stay replicated, computed outside the shard_map.

Scale note (why this shape): at real scale the per-stage weights are
what doesn't fit on one chip; here they are toy-sized, so — exactly
like parallel/tp.py — PP is the *capability/scaling* path, exercised
by `__graft_entry__.dryrun_multichip` and the test suite, while DP
remains the measured throughput path at MNIST scale.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from generative_models_tpu.config import Config
from generative_models_tpu.models import ar_prior
from generative_models_tpu.parallel.mesh import (
    DATA_AXIS, make_mesh_2axis, shard_map_nocheck,
)

PIPE_AXIS = "pipe"


def make_mesh_pp(dp: int, pp: int, devices=None) -> Mesh:
    """2-D mesh: ``dp * pp`` devices as axes ("data", "pipe")."""
    return make_mesh_2axis(dp, pp, PIPE_AXIS, devices)


def stack_blocks(blocks) -> Any:
    """[layers] list of block pytrees -> one pytree with a leading
    layer axis per leaf (the scan/shard axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


# the block body, input embedding, and ln_f/head epilogue are the
# SAME functions prior_apply composes (ar_prior.block_apply /
# embed_tokens / final_logits) — one definition, no drift possible
_block_apply = ar_prior.block_apply


def _pipeline_blocks(stacked, xm, cfg: Config, mesh: Mesh, n_micro: int):
    """Run the stacked block stack over microbatched activations
    ``xm [n_micro, B_mb, L, W]`` with the GPipe fill-drain schedule.
    Returns the post-blocks hidden states, same shape, replicated over
    the pipe axis."""
    n_stages = mesh.shape[PIPE_AXIS]
    n_ticks = n_micro + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def shard_fn(stacked_local, xm_local):
        stage = jax.lax.axis_index(PIPE_AXIS)

        def apply_stage(x):
            def body(h, blk):
                return _block_apply(blk, h, cfg), None
            h, _ = jax.lax.scan(body, x, stacked_local)
            return h

        def tick(carry, t):
            buf, outs = carry
            # stage 0 ingests microbatch t (clamped in the drain bubble
            # — that work is computed and discarded, the static-shape
            # price of a branch-free schedule); other stages continue
            # from the activations ppermuted in last tick.
            idx_in = jnp.clip(t, 0, n_micro - 1)
            x_in = jnp.where(
                stage == 0,
                jax.lax.dynamic_index_in_dim(xm_local, idx_in, 0,
                                             keepdims=False),
                buf)
            y = apply_stage(x_in)
            # the LAST stage finishes microbatch t - (n_stages - 1)
            out_idx = t - (n_stages - 1)
            valid = jnp.logical_and(stage == n_stages - 1, out_idx >= 0)
            oi = jnp.clip(out_idx, 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, oi, 0,
                                               keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, y, cur), oi, 0)
            buf = jax.lax.ppermute(y, PIPE_AXIS, perm)
            return (buf, outs), None

        carry0 = (jnp.zeros_like(xm_local[0]), jnp.zeros_like(xm_local))
        (_, outs), _ = jax.lax.scan(tick, carry0, jnp.arange(n_ticks))
        # only the last stage holds real outputs; zero-mask + psum
        # replicates them onto every stage (tiny at [B, L, W] demo
        # scale; at real scale the loss would stay on the last stage)
        outs = jnp.where(stage == n_stages - 1, outs,
                         jnp.zeros_like(outs))
        return jax.lax.psum(outs, PIPE_AXIS)

    return shard_map_nocheck(
        shard_fn, mesh,
        in_specs=(P(PIPE_AXIS), P(None, DATA_AXIS)),
        out_specs=P(None, DATA_AXIS),
    )(stacked, xm)


def prior_apply_pp(params, tokens_in, cfg: Config, mesh: Mesh,
                   n_micro: int, y=None):
    """Pipeline-parallel twin of ``ar_prior.prior_apply``: next-token
    logits [B, L, K] for SHIFTED input tokens [B, L]. Same math —
    embedding/ln_f/head are the identical (replicated) ops, the block
    stack runs through the GPipe schedule. Requires
    ``vq_prior_layers % n_stages == 0`` and ``B % n_micro == 0``."""
    n_stages = mesh.shape[PIPE_AXIS]
    if cfg.vq_prior_layers % n_stages:
        raise ValueError(
            f"vq_prior_layers={cfg.vq_prior_layers} must divide into "
            f"pipe={n_stages} equal stages")
    b, l = tokens_in.shape
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by n_micro={n_micro}")
    if (b // n_micro) % mesh.shape[DATA_AXIS]:
        raise ValueError(
            f"microbatch {b // n_micro} not divisible by "
            f"data={mesh.shape[DATA_AXIS]}")
    x = ar_prior.embed_tokens(params, tokens_in, cfg, y)
    blocks = params["blocks"]
    # accept both layouts: the repo-wide list of per-block pytrees, or
    # an already-stacked pytree (build_pp_prior_step keeps blocks
    # stacked + pipe-sharded across dispatches)
    stacked = stack_blocks(blocks) if isinstance(blocks, list) else blocks
    xm = x.reshape(n_micro, b // n_micro, l, -1)
    h = _pipeline_blocks(stacked, xm, cfg, mesh, n_micro)
    return ar_prior.final_logits(params, h.reshape(b, l, -1))


def prior_ce_pp(params, tokens, cfg: Config, mesh: Mesh, n_micro: int,
                y=None):
    """Teacher-forced next-token cross-entropy of the prior over token
    grids [B, L] — the two-stage objective of losses/vqprior.py
    (`vq_freeze_tokenizer=True` path: the tokenizer is frozen, the
    prior IS the trained model), with the forward pipelined. The CE
    itself is losses/vqprior.prior_ce — one objective definition."""
    from generative_models_tpu.losses.vqprior import _shift, prior_ce
    logits = prior_apply_pp(params, _shift(tokens, cfg), cfg, mesh,
                            n_micro, y)
    return prior_ce(logits, tokens)


def build_pp_prior_step(cfg: Config, mesh: Mesh, n_micro: int,
                        lr: Optional[float] = None):
    """Jitted pipeline-parallel training step for the prior (two-stage
    protocol): (params, opt_state, tokens [B, L], y) ->
    (params, opt_state, loss). Batch sharded over ``data``, stacked
    blocks over ``pipe`` (the jit in/out shardings keep the layer
    stack resident per-stage across dispatches). The optimizer comes
    from cfg (train/optim.make_tx — same betas/eps/choice as every
    other training path), so a PP trajectory matches the Trainer's
    for the same config."""
    from generative_models_tpu.train.optim import make_tx
    tx = make_tx(cfg, cfg.g_lr if lr is None else lr)

    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P(DATA_AXIS))

    def _param_shardings(params):
        specs = jax.tree.map(lambda _: P(), params)
        specs["blocks"] = jax.tree.map(lambda _: P(PIPE_AXIS),
                                       specs["blocks"])
        return jax.tree.map(lambda p: NamedSharding(mesh, p), specs,
                            is_leaf=lambda x: isinstance(x, P))

    def step(params, opt_state, tokens, y):
        loss, grads = jax.value_and_grad(prior_ce_pp)(
            params, tokens, cfg, mesh, n_micro, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def prepare(params, tokens, y):
        """device_put params (blocks stacked + pipe-sharded), opt state,
        and batch with the step's shardings; returns jitted step too."""
        params = dict(params)
        params["blocks"] = stack_blocks(params["blocks"])
        pshard = _param_shardings(params)
        params = jax.device_put(params, pshard)
        opt_state = jax.tree.map(jnp.asarray, tx.init(params))
        opt_shard = optax.tree_map_params(
            tx, lambda _, s: s, opt_state, pshard,
            transform_non_params=lambda _: rep)
        opt_state = jax.device_put(opt_state, opt_shard)
        tokens = jax.device_put(tokens, dat)
        if y is not None:
            y = jax.device_put(y, dat)
        jitted = jax.jit(step,
                         in_shardings=(pshard, opt_shard, dat,
                                       dat if y is not None else rep),
                         out_shardings=(pshard, opt_shard, rep))
        return jitted, params, opt_state, tokens, y

    return prepare


def unstack_blocks(stacked, n_layers: int):
    """Inverse of stack_blocks (for checkpoint interchange with the
    list-of-blocks layout the rest of the repo uses)."""
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n_layers)]
