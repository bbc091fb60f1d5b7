"""Tensor (model) parallelism over a 2-D ``data x model`` mesh.

The reference is single-device and its MLPs are tiny, so TP buys no
throughput at MNIST scale — DP is the performance path (see
docs/design.md). TP is still a first-class capability here because the
framework is the deliverable: this module shards every variant's
parameters Megatron-style (Shoeybi 2019) over the ``model`` mesh axis
and lets XLA's SPMD partitioner insert the matching collectives
(all-reduce after row-parallel matmuls) over ICI. No step code changes:
the same ``train.step.build_many_steps`` computation runs under jit
with sharded in/out specs — the TPU-idiomatic formulation of tensor
parallelism (annotate shardings, let GSPMD do the communication).

Sharding rules (alternating Megatron pairs, guarded by divisibility):

- column-parallel layer: W [in, out] -> P(None, "model"), b -> P("model");
  output activations become sharded on the feature axis.
- row-parallel layer:    W [in, out] -> P("model", None), b -> P(None);
  consumes feature-sharded activations, XLA inserts the psum.
- a layer whose dims don't divide the model-axis size stays replicated.

Every 2-layer stack in the zoo (G: z->h->784, D: 784->h->1, BEGAN AE,
VAE decoder) becomes exactly one column/row pair; trunk+head nets
(VAE encoder, InfoGAN D) shard the trunk column-parallel and each head
row-parallel off the sharded features.

The causal-transformer prior (models/ar_prior.py, the vqprior variant)
gets the canonical Megatron block mapping (Shoeybi 2019 §3): qkv and
fc1 column-parallel, proj and fc2 row-parallel, LayerNorms/embeddings/
head replicated — one all-reduce per attention block and one per MLP
block, inserted by GSPMD. Any leaf no rule matches (raw embedding
tables, codebooks, conv kernels, LayerNorm scales) stays REPLICATED:
under GSPMD a replicated annotation is always semantically correct, so
every variant runs under tp>1 — unsharded pieces just don't save
memory (pinned by tests/test_tp.py::test_tp_single_model_variants).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from generative_models_tpu.config import Config
from generative_models_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"


def make_mesh_2d(dp: int, tp: int, devices=None) -> Mesh:
    """2-D mesh: ``dp * tp`` devices as axes ("data", "model")."""
    from generative_models_tpu.parallel.mesh import make_mesh_2axis
    return make_mesh_2axis(dp, tp, MODEL_AXIS, devices)


def _layer_spec(in_ok: bool, out_ok: bool, parallel_in: bool,
                allow_col: bool) -> Tuple[dict, bool]:
    """Spec for one linear layer given divisibility of its dims and
    whether its input activations arrive feature-sharded. Returns
    (spec for {"w","b"}, whether the OUTPUT is feature-sharded)."""
    if parallel_in and in_ok:
        return {"w": P(MODEL_AXIS, None), "b": P(None)}, False  # row
    if allow_col and out_ok:
        return {"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS)}, True  # col
    return {"w": P(None, None), "b": P(None)}, False  # replicated


def _list_specs(layers: List[dict], tp: int, parallel_in: bool,
                final_col_ok: bool) -> Tuple[List[dict], bool]:
    """Alternating specs for a list of linear layers. ``final_col_ok``
    lets a trunk end column-parallel (its heads will be row-parallel);
    full networks end row-parallel/replicated so their outputs come
    back whole."""
    specs = []
    for i, layer in enumerate(layers):
        in_d, out_d = layer["w"].shape
        last = i == len(layers) - 1
        spec, parallel_in = _layer_spec(
            in_d % tp == 0, out_d % tp == 0, parallel_in,
            allow_col=(not last) or final_col_ok)
        specs.append(spec)
    return specs, parallel_in


# Megatron roles inside a pre-LN transformer block (models/ar_prior.py
# layout): the two column/row pairs of Shoeybi 2019 §3.
_BLOCK_KEYS = frozenset({"ln1", "qkv", "proj", "ln2", "fc1", "fc2"})
_BLOCK_ROLE = {"qkv": "col", "fc1": "col", "proj": "row", "fc2": "row"}


def _is_layer(x) -> bool:
    return isinstance(x, dict) and "w" in x


def _block_specs(blk: dict, tp: int) -> dict:
    """Canonical Megatron mapping for one transformer block: qkv/fc1
    column-parallel, proj/fc2 row-parallel, LayerNorms replicated.
    Requires the model width to divide tp (3W/4W then divide too);
    otherwise the whole block stays replicated."""
    w = blk["qkv"]["w"].shape[0]
    ok = w % tp == 0
    out = {}
    for k, v in blk.items():
        role = _BLOCK_ROLE.get(k)
        if role == "col" and ok:
            out[k] = {"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS)}
        elif role == "row" and ok:
            out[k] = {"w": P(MODEL_AXIS, None), "b": P(None)}
        elif role:
            out[k] = {"w": P(None, None), "b": P(None)}
        else:
            out[k] = params_pspecs(v, tp)  # LayerNorms: replicated
    return out


def params_pspecs(params: Any, tp: int) -> Any:
    """PartitionSpec pytree matching a variant's parameter pytree.

    Handles the shapes in models/nets.py: a bare layer list
    (G/D/AE/decoder), a single layer dict, a {"trunk": [...],
    <head>: layer} dict (VAE encoder, InfoGAN D), and any nesting of
    those (VAE/BIRVAE bundle encoder+decoder in one dict); plus the
    transformer blocks of models/ar_prior.py (Megatron column/row —
    see the module docstring) and raw array leaves (embedding tables,
    codebooks, LayerNorm scales: replicated)."""
    if hasattr(params, "shape") and hasattr(params, "dtype"):
        return P()  # raw array leaf: replicated
    if isinstance(params, list):
        if params and all(_is_layer(x) for x in params):
            return _list_specs(params, tp, False, final_col_ok=False)[0]
        return [params_pspecs(v, tp) for v in params]
    if isinstance(params, dict) and "w" in params:
        if getattr(params["w"], "ndim", 2) != 2:
            # conv kernels [kh, kw, cin, cout] etc.: no Megatron rule,
            # replicate every leaf of the layer
            return {k: P() for k in params}
        return _layer_spec(params["w"].shape[0] % tp == 0,
                           params["w"].shape[1] % tp == 0,
                           False, allow_col=False)[0]
    if isinstance(params, dict) and _BLOCK_KEYS <= params.keys():
        return _block_specs(params, tp)
    if isinstance(params, dict):
        out = {}
        sharded_h = False
        if "trunk" in params:
            out["trunk"], sharded_h = _list_specs(
                params["trunk"], tp, False, final_col_ok=True)
        for k, v in params.items():
            if k == "trunk":
                continue
            if isinstance(v, list) and v and all(_is_layer(x) for x in v):
                out[k], _ = _list_specs(v, tp, sharded_h, final_col_ok=False)
            elif _is_layer(v) and getattr(v["w"], "ndim", 2) == 2:
                out[k] = _layer_spec(v["w"].shape[0] % tp == 0,
                                     v["w"].shape[1] % tp == 0,
                                     sharded_h, allow_col=False)[0]
            else:
                out[k] = params_pspecs(v, tp)  # nested subnet / leaves
        return out
    raise TypeError(f"unrecognized param pytree: {type(params)}")


def _is_spec(x) -> bool:
    return isinstance(x, P)


def _opt_pspecs(tx, opt_state, param_specs):
    """Optimizer-state specs: slots that mirror params (Adam mu/nu,
    RMSprop nu) inherit each param's spec; non-param leaves (step
    counts) stay replicated."""
    return optax.tree_map_params(
        tx, lambda _, s: s, opt_state, param_specs,
        transform_non_params=lambda _: P())


def state_pspecs(spec, cfg: Config, state) -> Any:
    """PartitionSpec pytree for a full TrainState (train.step layout)."""
    from generative_models_tpu.train.optim import make_tx
    rep = P()
    if spec.adversarial:
        g_ps = params_pspecs(state["g_params"], cfg.tp)
        d_ps = params_pspecs(state["d_params"], cfg.tp)
        out = {
            "g_params": g_ps,
            "d_params": d_ps,
            "g_opt": _opt_pspecs(make_tx(cfg, cfg.g_lr), state["g_opt"], g_ps),
            "d_opt": _opt_pspecs(make_tx(cfg, cfg.d_lr), state["d_opt"], d_ps),
            "vstate": jax.tree.map(lambda _: rep, state["vstate"]),
            "step": rep,
            "rng": rep,
        }
        if "g_ema" in state:  # EMA weights shard exactly like g_params
            out["g_ema"] = g_ps
        if "sn_v" in state:  # amortized-SN vectors: [cout]-sized, tiny
            out["sn_v"] = jax.tree.map(lambda _: rep, state["sn_v"])
        return out
    ps = params_pspecs(state["params"], cfg.tp)
    out = {
        "params": ps,
        "opt": _opt_pspecs(make_tx(cfg, cfg.g_lr), state["opt"], ps),
        "step": rep,
        "rng": rep,
    }
    if "ema" in state:
        out["ema"] = ps
    return out


def to_shardings(pspec_tree, mesh: Mesh):
    return jax.tree.map(lambda p: NamedSharding(mesh, p), pspec_tree,
                        is_leaf=_is_spec)


def shard_state(spec, cfg: Config, state, mesh: Mesh):
    """device_put the TrainState with Megatron shardings; returns
    (sharded_state, sharding_tree)."""
    shardings = to_shardings(state_pspecs(spec, cfg, state), mesh)
    return jax.device_put(state, shardings), shardings


def build_tp_many_steps(spec, cfg: Config, steps_per_epoch: int,
                        mesh: Mesh, state_shardings):
    """jit of the standard many-steps computation with the TrainState
    pinned to the Megatron shardings (in AND out, so the layout is
    stable across dispatches and buffers can be donated). The batch
    gather is constrained on the data axis; everything else — psums
    after row-parallel matmuls, all-gathers where a head needs whole
    features — is inserted by the SPMD partitioner."""
    from generative_models_tpu.parallel.dp import batch_constrainer
    from generative_models_tpu.train import step as step_lib

    many = step_lib.build_many_steps(spec, cfg, steps_per_epoch,
                                     batch_constrainer(mesh))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        many,
        in_shardings=(state_shardings, rep, rep, rep, rep),
        out_shardings=(state_shardings, rep),
        donate_argnums=(0,) if cfg.donate_buffers else (),
    )
