"""Whole-MLP fused forward kernel (Pallas, TPU).

The zoo's networks are 2-3 layer MLPs on 784-dim MNIST. XLA cannot fuse
two matmuls into one kernel — each layer's activations round-trip
through HBM. This kernel runs the ENTIRE stack in one `pallas_call`:
weights and activations stay VMEM-resident, each layer's
matmul+bias+activation runs back-to-back on the MXU/VPU, and only the
hidden activations needed as autodiff residuals are written out.

- Grid: 1-D over batch tiles (TILE_B rows); weights are broadcast
  blocks (same block for every program).
- Padding: batch to sublane multiples (8 for f32), features to lane
  multiples (128), zero-filled. Zero-padded weight ROWS make padded
  hidden columns contribute nothing downstream regardless of the
  activation's value at 0, and padded outputs are sliced away.
- Autodiff: custom_vjp. Forward = this kernel; backward = a SECOND
  fused Pallas kernel (round 2, VERDICT r1 next #1) computing every
  dW/db and dx in one pallas_call — saved activations and weights stay
  VMEM-resident per batch tile, dW/db accumulate across the
  (sequential) grid. The round-1 backward was plain XLA matmuls, which
  left the custom_vjp boundary splitting the step's fusion; with both
  directions as kernels the boundary encloses the whole fwd+bwd pass.
  The XLA backward is kept as `_vjp_bwd_xla` (the interpret-mode twin
  and the refutation baseline for BASELINE.md's crossover table).
  custom_vjp is NOT forward-mode differentiable, so the
  gradient-penalty variants (WGAN-GP / DRAGAN), which need
  grad-of-grad, pin the XLA path via their `needs_second_order` spec
  flag — see losses/base.py.
- Every kernel has this XLA twin (models/mlp.mlp_apply's per-layer
  path); tests assert allclose in interpret mode on CPU.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# activations expressible from the layer OUTPUT alone (their derivative
# is a function of the post-activation value)
SUPPORTED_ACTS = ("none", "relu", "leaky_relu", "sigmoid", "tanh")

_TILE_B = 256


def _ru(x: int, m: int) -> int:
    return -(-x // m) * m


def _act(h, act: str, slope: float):
    if act == "none":
        return h
    if act == "relu":
        return jnp.maximum(h, 0.0)
    if act == "leaky_relu":
        return jnp.where(h >= 0, h, slope * h)
    if act == "sigmoid":
        return jax.nn.sigmoid(h)
    if act == "tanh":
        return jnp.tanh(h)
    raise ValueError(f"unsupported pallas activation {act!r}")


def _act_deriv_from_out(y, act: str, slope: float):
    if act == "none":
        return jnp.ones_like(y)
    if act == "relu":
        return (y > 0).astype(y.dtype)
    if act == "leaky_relu":
        return jnp.where(y >= 0, 1.0, slope).astype(y.dtype)
    if act == "sigmoid":
        return y * (1.0 - y)
    if act == "tanh":
        return 1.0 - y * y
    raise ValueError(act)


def _make_kernel(n_layers: int, acts: Tuple[str, ...], slope: float,
                 bf16: bool):
    def kernel(*refs):
        x_ref = refs[0]
        wb = refs[1:1 + 2 * n_layers]
        outs = refs[1 + 2 * n_layers:]  # [h1..h_{n-1}, out]
        h = x_ref[:]
        for i in range(n_layers):
            w = wb[2 * i][:]
            b = wb[2 * i + 1][:]
            lhs = h.astype(jnp.bfloat16) if bf16 else h
            rhs = w.astype(jnp.bfloat16) if bf16 else w
            h = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32) + b
            h = _act(h, acts[i], slope)
            if i < n_layers - 1:
                outs[i][:] = h
        outs[n_layers - 1][:] = h

    return kernel


def _pad2(a, r, c):
    return jnp.pad(a, ((0, r - a.shape[0]), (0, c - a.shape[1])))


@functools.partial(jax.jit, static_argnames=(
    "acts", "slope", "bf16", "interpret", "dims"))
def _fwd_call(x, flat_wb, acts, slope, bf16, interpret, dims):
    """dims: ((K0, K1, ..., Kn)) true layer widths; flat_wb: padded
    [w1, b1, ..., wn, bn]. Returns (out_p, hiddens_p) padded."""
    n = len(acts)
    b_true = x.shape[0]
    bp = _ru(max(b_true, 8), 8)
    tile_b = min(_TILE_B, bp)
    bp = _ru(bp, tile_b)
    kp = [_ru(d, 128) for d in dims]
    xp = _pad2(x, bp, kp[0])

    grid = (bp // tile_b,)

    in_specs = [pl.BlockSpec((tile_b, kp[0]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for li in range(n):
        in_specs.append(pl.BlockSpec((kp[li], kp[li + 1]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, kp[li + 1]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out_shapes = []
    out_specs = []
    for li in range(1, n + 1):
        out_shapes.append(jax.ShapeDtypeStruct((bp, kp[li]), jnp.float32))
        out_specs.append(pl.BlockSpec((tile_b, kp[li]), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        _make_kernel(n, acts, slope, bf16),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xp, *flat_wb)
    hiddens = outs[:-1]
    return outs[-1], hiddens


def _prep(layers, x):
    dims = tuple([x.shape[1]] + [l["w"].shape[1] for l in layers])
    kp = [_ru(d, 128) for d in dims]
    flat = []
    for li, l in enumerate(layers):
        flat.append(_pad2(l["w"], kp[li], kp[li + 1]))
        flat.append(_pad2(l["b"][None, :], 1, kp[li + 1]))
    return dims, tuple(flat)


def _acts_tuple(n, hidden_act, out_act):
    return tuple([hidden_act] * (n - 1) + [out_act])


def _run_fwd(layers, x, hidden_act, out_act, slope, compute_dtype,
             interpret):
    n = len(layers)
    dims, flat = _prep(layers, x)
    acts = _acts_tuple(n, hidden_act, out_act)
    bf16 = compute_dtype == jnp.bfloat16
    out_p, hiddens_p = _fwd_call(x, flat, acts, slope, bf16, interpret, dims)
    b = x.shape[0]
    out = out_p[:b, :dims[-1]]
    hiddens = [h[:b, :dims[i + 1]] for i, h in enumerate(hiddens_p)]
    return out, hiddens


def _interpret_default() -> bool:
    from generative_models_tpu.ops.linear import default_platform
    return default_platform() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def mlp_pallas(layers: List[dict], x, hidden_act: str, out_act: str,
               slope: float, compute_dtype_name: str):
    cdt = jnp.bfloat16 if compute_dtype_name == "bfloat16" else None
    out, _ = _run_fwd(layers, x, hidden_act, out_act, slope, cdt,
                      _interpret_default())
    return out


def _vjp_fwd(layers, x, hidden_act, out_act, slope, compute_dtype_name):
    """Residuals keep the PADDED kernel outputs: slicing them to true
    shapes here and re-padding in the backward would cost a full
    HBM copy of every activation per step on the hot training path —
    only the user-visible primal output is sliced."""
    n = len(layers)
    dims, flat = _prep(layers, x)
    acts = _acts_tuple(n, hidden_act, out_act)
    bf16 = compute_dtype_name == "bfloat16"
    out_p, hiddens_p = _fwd_call(x, flat, acts, slope, bf16,
                                 _interpret_default(), dims)
    out = out_p[:x.shape[0], :dims[-1]]
    return out, (layers, x, hiddens_p, out_p)


def _vjp_bwd_xla(hidden_act, out_act, slope, compute_dtype_name, res, dy):
    """XLA backward from saved activations — the reference twin for the
    fused backward kernel (and the fallback for activations outside
    the kernel's set). Residual activations arrive PADDED; slice to
    true shapes first (this path is off the hot configurations)."""
    layers, x, hiddens_p, out_p = res
    b = x.shape[0]
    dims = [x.shape[1]] + [l["w"].shape[1] for l in layers]
    hiddens = [h[:b, :dims[i + 1]] for i, h in enumerate(hiddens_p)]
    out = out_p[:b, :dims[-1]]
    n = len(layers)
    inputs = [x] + hiddens            # input to each layer
    acts_out = hiddens + [out]        # output of each layer
    acts = _acts_tuple(n, hidden_act, out_act)

    g = dy * _act_deriv_from_out(out, acts[-1], slope)
    dlayers = [None] * n
    for i in range(n - 1, -1, -1):
        a_in = inputs[i]
        dlayers[i] = {
            "w": jnp.dot(a_in.T, g, preferred_element_type=jnp.float32),
            "b": jnp.sum(g, axis=0),
        }
        g = jnp.dot(g, layers[i]["w"].T,
                    preferred_element_type=jnp.float32)
        if i > 0:
            g = g * _act_deriv_from_out(acts_out[i - 1], acts[i - 1], slope)
    return dlayers, g


# ------------------------------------------------------------------
# Fused backward kernel: all dW/db + dx in ONE pallas_call
# ------------------------------------------------------------------

def _make_bwd_kernel(n_layers: int, acts: Tuple[str, ...], slope: float,
                     bf16: bool):
    def cast(a):
        return a.astype(jnp.bfloat16) if bf16 else a

    def kernel(*refs):
        # inputs: x, h1..h_{n-1}, out, dy, W1..Wn
        # outputs: dW1, db1, ..., dWn, dbn, dx
        x_ref = refs[0]
        hid = refs[1:n_layers]
        out_ref = refs[n_layers]
        dy_ref = refs[n_layers + 1]
        ws = refs[n_layers + 2:n_layers + 2 + n_layers]
        outs = refs[n_layers + 2 + n_layers:]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for i in range(n_layers):
                outs[2 * i][:] = jnp.zeros_like(outs[2 * i])
                outs[2 * i + 1][:] = jnp.zeros_like(outs[2 * i + 1])

        inputs = [x_ref] + list(hid)
        acts_out = list(hid) + [out_ref]
        g = dy_ref[:] * _act_deriv_from_out(out_ref[:], acts[-1], slope)
        for i in range(n_layers - 1, -1, -1):
            a_in = inputs[i][:]
            # dW = a_inᵀ g  (contract the batch dim)
            dw = jax.lax.dot_general(
                cast(a_in), cast(g), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs[2 * i][:] += dw
            outs[2 * i + 1][:] += jnp.sum(g, axis=0, keepdims=True)
            # g <- g Wᵀ  (contract the output dim)
            g = jax.lax.dot_general(
                cast(g), cast(ws[i][:]), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if i > 0:
                g = g * _act_deriv_from_out(acts_out[i - 1][:],
                                            acts[i - 1], slope)
        outs[2 * n_layers][:] = g

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "acts", "slope", "bf16", "interpret"))
def _bwd_call(x, hiddens, out, dy, ws, acts, slope, bf16, interpret):
    """All arrays PADDED (batch to the fwd tile grid, features to lane
    multiples). dy rows past the true batch must be zero — zero
    cotangents keep every padded row's contribution zero regardless of
    the garbage activations the fwd kernel wrote there (padded-row
    inputs are act(b))."""
    n = len(acts)
    bp = x.shape[0]
    tile_b = min(_TILE_B, bp)
    kdims = [x.shape[1]] + [w.shape[1] for w in ws]

    grid = (bp // tile_b,)

    in_specs = [pl.BlockSpec((tile_b, kdims[0]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for li in range(1, n):
        in_specs.append(pl.BlockSpec((tile_b, kdims[li]), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((tile_b, kdims[n]), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))  # out
    in_specs.append(pl.BlockSpec((tile_b, kdims[n]), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))  # dy
    for li in range(n):
        in_specs.append(pl.BlockSpec(
            (kdims[li], kdims[li + 1]), lambda i: (0, 0),
            memory_space=pltpu.VMEM))

    out_shapes, out_specs = [], []
    for li in range(n):
        out_shapes.append(jax.ShapeDtypeStruct(
            (kdims[li], kdims[li + 1]), jnp.float32))
        out_specs.append(pl.BlockSpec(
            (kdims[li], kdims[li + 1]), lambda i: (0, 0),
            memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((1, kdims[li + 1]),
                                               jnp.float32))
        out_specs.append(pl.BlockSpec((1, kdims[li + 1]), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    out_shapes.append(jax.ShapeDtypeStruct((bp, kdims[0]), jnp.float32))
    out_specs.append(pl.BlockSpec((tile_b, kdims[0]), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))

    return pl.pallas_call(
        _make_bwd_kernel(n, acts, slope, bf16),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x, *hiddens, out, dy, *ws)


def _vjp_bwd(hidden_act, out_act, slope, compute_dtype_name, res, dy):
    """Fused-kernel backward (the measured-default pallas path). Falls
    back to the XLA twin only where the kernel's activation set can't
    express the derivative (never for the zoo's stacks)."""
    layers, x, hiddens_p, out_p = res
    n = len(layers)
    acts = _acts_tuple(n, hidden_act, out_act)
    if not all(a in SUPPORTED_ACTS for a in acts):  # pragma: no cover
        return _vjp_bwd_xla(hidden_act, out_act, slope, compute_dtype_name,
                            res, dy)
    bf16 = compute_dtype_name == "bfloat16"
    dims = tuple([x.shape[1]] + [l["w"].shape[1] for l in layers])
    kp = [_ru(d, 128) for d in dims]
    b = x.shape[0]
    bp = out_p.shape[0]   # the fwd kernel's padded batch

    # hiddens/out arrive PADDED from the forward (garbage act(b) in the
    # padded rows/none in padded cols for the supported hidden acts) —
    # safe because dy's zero-padded rows/cols zero every contribution
    # they could make (see the padding analysis in the module
    # docstring); only x and dy need padding here.
    xp = _pad2(x, bp, kp[0])
    dyp = _pad2(dy, bp, kp[-1])   # zero rows beyond b — load-bearing
    wsp = tuple(_pad2(l["w"], kp[i], kp[i + 1])
                for i, l in enumerate(layers))

    res_flat = _bwd_call(xp, tuple(hiddens_p), out_p, dyp, wsp, acts,
                         slope, bf16, _interpret_default())
    dlayers = []
    for i in range(n):
        dlayers.append({
            "w": res_flat[2 * i][:dims[i], :dims[i + 1]],
            "b": res_flat[2 * i + 1][0, :dims[i + 1]],
        })
    dx = res_flat[2 * n][:b, :dims[0]]
    return dlayers, dx


mlp_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def mlp_apply_pallas(layers, x, hidden_act="relu", out_act="none",
                     slope: float = 0.2, compute_dtype=None):
    """Drop-in for models.mlp.mlp_apply when the backend is 'pallas'.
    Falls back to the XLA per-layer path for unsupported activations."""
    acts = _acts_tuple(len(layers), hidden_act, out_act)
    if not all(a in SUPPORTED_ACTS for a in acts):
        from generative_models_tpu.models.mlp import mlp_apply_xla
        return mlp_apply_xla(layers, x, hidden_act, out_act, slope,
                             compute_dtype)
    name = ("bfloat16" if compute_dtype == jnp.bfloat16 else "float32")
    return mlp_pallas(list(layers), x, hidden_act, out_act, slope, name)
