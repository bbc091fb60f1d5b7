"""Fused whole-training-chunk kernel for the flagship NSGAN (Pallas).

THE round-2 kernel bet (VERDICT r1 next #1). The measured round-1
facts: the XLA step runs at ~28 us and is bound by parameter +
optimizer-state HBM traffic — every step reads AND writes params, Adam
mu and nu (~16 MB/step at the headline shapes), which at v5e HBM
bandwidth is ~20 us by itself (benchmarks/step_anatomy.py: "Adam HBM
traffic ≈ speed of light"). Per-op Pallas kernels cannot beat that —
they fuse compute but the state still round-trips HBM every step
(the measured 0.68-1.09x crossover, BASELINE.md).

This kernel changes the memory equation instead of the op schedule:
ONE pallas_call runs the ENTIRE scan chunk (hundreds of train steps)
with params and Adam state resident in VMEM scratch for the whole
chunk:

- state (G+D params, mu, nu — ~12 MB padded) is DMA'd HBM->VMEM once
  per chunk, updated in place every step, DMA'd back once at the end;
- per-step minibatches and noise are PRE-GATHERED/PRE-DRAWN by XLA
  (keeping the epoch-permutation semantics and the threefry noise
  chain of train/step.py) and double-buffer-streamed HBM->VMEM inside
  the loop (~0.5 MB/step — 30x less HBM traffic than the state
  round-trip it replaces);
- both updates (D then G, reference order: G sees the post-update
  critic) are hand-derived forward+backward+Adam chains on the
  MXU/VPU — no autodiff, no custom_vjp boundary, no per-step dispatch.

Scope: the BCE/half-squares family sharing the flagship architecture —
nsgan, mmgan, lsgan (``FUSED_VARIANTS``; the per-variant logit
gradients are trace-time branches) — with arch="mlp", d_steps=1, adam,
no spectral/EMA. The Trainer picks this path via ``Config.fused_step``;
everything else keeps the general builder.

Numerics: same math as the XLA step (logit-stable BCE gradients
sigma(l)-target, optax-convention Adam m-hat/(sqrt(v-hat)+eps), same
noise chain), same padding-zero conventions as ops/pallas_mlp.py.
Losses match the XLA trainer within accumulated-fp tolerance
(tests/test_fused_step.py asserts 30-step trajectory agreement).

Padding correctness notes (load-bearing):
- padded LOGIT lanes (D head 1 -> 128): gradients are masked to lane
  0, so padded-lane sigmoids never leak into updates;
- padded IMAGE lanes (784 -> 896): the generator's sigmoid head would
  emit 0.5 there, which would flow into dW1_d's padded rows and make
  them nonzero (a real bug found in design) — fake images are masked
  to the true 784 lanes right after the sigmoid, which also zeroes
  the sigmoid' term of the G backward in those lanes;
- padded batch rows: per-row masks keep them out of every mean and
  every gradient.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ru(x: int, m: int) -> int:
    return -(-x // m) * m


def _pow(base: float, t):
    """base**t for traced f32 t (base static in (0,1))."""
    return jnp.exp(t * float(np.log(base)))


def _make_kernel(steps: int, b: int, bp: int, kz: int, kh: int, kx: int,
                 kl: int, x_true: int, g_lr: float, d_lr: float,
                 b1: float, b2: float, eps: float, slope: float,
                 variant: str = "nsgan"):
    """See module docstring. Ref layout:

    inputs:  xs [steps*bp, kx] (ANY), zd [steps*bp, kz] (ANY),
             zg [steps*bp, kz] (ANY),
             8 packed state tensors [3, R, C] (ANY):
               g_w1 [3,kz,kh]  g_b1 [3,8,kh]  g_w2 [3,kh,kx]  g_b2 [3,8,kx]
               d_w1 [3,kx,kh]  d_b1 [3,8,kh]  d_w2 [3,kh,kl]  d_b2 [3,8,kl]
             t_base [1,1] (SMEM, int32)
    outputs: same 8 packed tensors (ANY), metrics [steps, 128] (VMEM)
    scratch: 8 VMEM state mirrors, xbuf [2,bp,kx], zdbuf/zgbuf [2,bp,kz],
             state_sems (8,), stream_sems (3,2)
    """
    inv_b = 1.0 / b

    def kernel(xs, zd, zg,
               g_w1, g_b1, g_w2, g_b2, d_w1, d_b1, d_w2, d_b2,
               t_base,
               o_g_w1, o_g_b1, o_g_w2, o_g_b2,
               o_d_w1, o_d_b1, o_d_w2, o_d_b2,
               metrics,
               s_g_w1, s_g_b1, s_g_w2, s_g_b2,
               s_d_w1, s_d_b1, s_d_w2, s_d_b2,
               xbuf, zdbuf, zgbuf,
               state_sems, stream_sems):
        ins = (g_w1, g_b1, g_w2, g_b2, d_w1, d_b1, d_w2, d_b2)
        outs = (o_g_w1, o_g_b1, o_g_w2, o_g_b2,
                o_d_w1, o_d_b1, o_d_w2, o_d_b2)
        scr = (s_g_w1, s_g_b1, s_g_w2, s_g_b2,
               s_d_w1, s_d_b1, s_d_w2, s_d_b2)

        # ---- one-time state load: HBM -> VMEM ----------------------
        for i in range(8):
            pltpu.make_async_copy(ins[i], scr[i], state_sems.at[i]).start()

        def stream(buf, src, slot, k, width, sem_row):
            return pltpu.make_async_copy(
                src.at[pl.ds(k * bp, bp), :], buf.at[slot],
                stream_sems.at[sem_row, slot])

        stream(xbuf, xs, 0, 0, kx, 0).start()
        stream(zdbuf, zd, 0, 0, kz, 1).start()
        stream(zgbuf, zg, 0, 0, kz, 2).start()

        for i in range(8):
            pltpu.make_async_copy(ins[i], scr[i], state_sems.at[i]).wait()

        # masks (static)
        rows = jax.lax.broadcasted_iota(jnp.int32, (bp, 1), 0)
        rowm = (rows < b).astype(jnp.float32)            # [bp,1]
        lane0 = (jax.lax.broadcasted_iota(jnp.int32, (bp, kl), 1)
                 == 0).astype(jnp.float32)               # [bp,kl]
        xcols = (jax.lax.broadcasted_iota(jnp.int32, (bp, kx), 1)
                 < x_true).astype(jnp.float32)           # [bp,kx]
        brow0_h = (jax.lax.broadcasted_iota(jnp.int32, (8, kh), 0)
                   == 0).astype(jnp.float32)
        brow0_x = (jax.lax.broadcasted_iota(jnp.int32, (8, kx), 0)
                   == 0).astype(jnp.float32)
        brow0_l = (jax.lax.broadcasted_iota(jnp.int32, (8, kl), 0)
                   == 0).astype(jnp.float32)

        def dotT_lhs(a, g):   # aᵀ g : contract batch
            return jax.lax.dot_general(
                a, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def dotT_rhs(g, w):   # g wᵀ : contract features
            return jax.lax.dot_general(
                g, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        def mm(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.float32)

        def adam(ref3, grad, t, lr):
            m = b1 * ref3[1] + (1.0 - b1) * grad
            v = b2 * ref3[2] + (1.0 - b2) * grad * grad
            ref3[1] = m
            ref3[2] = v
            mhat = m / (1.0 - _pow(b1, t))
            vhat = v / (1.0 - _pow(b2, t))
            ref3[0] = ref3[0] - lr * mhat / (jnp.sqrt(vhat) + eps)

        def softplus(u):
            return jnp.maximum(u, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(u)))

        def body(k, _):
            slot = k % 2
            nxt = (k + 1) % 2

            @pl.when(k + 1 < steps)
            def _prefetch():
                stream(xbuf, xs, nxt, k + 1, kx, 0).start()
                stream(zdbuf, zd, nxt, k + 1, kz, 1).start()
                stream(zgbuf, zg, nxt, k + 1, kz, 2).start()

            stream(xbuf, xs, slot, k, kx, 0).wait()
            stream(zdbuf, zd, slot, k, kz, 1).wait()
            stream(zgbuf, zg, slot, k, kz, 2).wait()

            x = xbuf[slot]
            zdk = zdbuf[slot]
            zgk = zgbuf[slot]
            t = (t_base[0, 0] + k + 1).astype(jnp.float32)

            w1g = s_g_w1[0]
            b1g = s_g_b1[0, 0:1, :]
            w2g = s_g_w2[0]
            b2g = s_g_b2[0, 0:1, :]
            w1d = s_d_w1[0]
            b1d = s_d_b1[0, 0:1, :]
            w2d = s_d_w2[0]
            b2d = s_d_b2[0, 0:1, :]

            def leaky(u):
                return jnp.where(u >= 0, u, slope * u)

            def dleaky(h):
                return jnp.where(h >= 0, 1.0, slope)

            # ================= D update =============================
            hgd = jnp.maximum(mm(zdk, w1g) + b1g, 0.0)          # [bp,kh]
            fake = jax.nn.sigmoid(mm(hgd, w2g) + b2g) * xcols   # [bp,kx]
            hr = leaky(mm(x, w1d) + b1d)
            lr_ = mm(hr, w2d) + b2d                             # [bp,kl]
            hf = leaky(mm(fake, w1d) + b1d)
            lf = mm(hf, w2d) + b2d

            # variant hook: dL_D/dlogit and the logged loss. nsgan and
            # mmgan share the BCE critic; lsgan is the half-squares
            # critic with a linear head (all trace-time branches).
            if variant == "lsgan":
                glr = (lr_ - 1.0) * lane0 * rowm * inv_b
                glf = lf * lane0 * rowm * inv_b
            else:
                glr = (jax.nn.sigmoid(lr_) - 1.0) * lane0 * rowm * inv_b
                glf = jax.nn.sigmoid(lf) * lane0 * rowm * inv_b
            dW2d = dotT_lhs(hr, glr) + dotT_lhs(hf, glf)
            db2d = jnp.sum(glr + glf, axis=0, keepdims=True)
            dhr = dotT_rhs(glr, w2d) * dleaky(hr)
            dhf = dotT_rhs(glf, w2d) * dleaky(hf)
            dW1d = dotT_lhs(x, dhr) + dotT_lhs(fake, dhf)
            db1d = jnp.sum(dhr + dhf, axis=0, keepdims=True)

            # metrics BEFORE the update (the XLA step logs the loss at
            # the pre-update params)
            if variant == "lsgan":
                d_loss = (0.5 * jnp.sum((lr_ - 1.0) ** 2 * lane0 * rowm)
                          + 0.5 * jnp.sum(lf * lf * lane0 * rowm)) * inv_b
            else:
                d_loss = (jnp.sum(softplus(-lr_) * lane0 * rowm)
                          + jnp.sum(softplus(lf) * lane0 * rowm)) * inv_b
            d_real = jnp.sum(lr_ * lane0 * rowm) * inv_b
            d_fake_m = jnp.sum(lf * lane0 * rowm) * inv_b

            adam(s_d_w1, dW1d, t, d_lr)
            adam(s_d_b1, db1d * brow0_h, t, d_lr)
            adam(s_d_w2, dW2d, t, d_lr)
            adam(s_d_b2, db2d * brow0_l, t, d_lr)

            # ================= G update (post-update critic) ========
            w1d_ = s_d_w1[0]
            b1d_ = s_d_b1[0, 0:1, :]
            w2d_ = s_d_w2[0]
            b2d_ = s_d_b2[0, 0:1, :]

            hg = jnp.maximum(mm(zgk, w1g) + b1g, 0.0)
            fake2 = jax.nn.sigmoid(mm(hg, w2g) + b2g) * xcols
            hf2 = leaky(mm(fake2, w1d_) + b1d_)
            lf2 = mm(hf2, w2d_) + b2d_
            if variant == "lsgan":      # ½E[(D(G(z))-1)²]
                gl = (lf2 - 1.0) * lane0 * rowm * inv_b
                g_loss = 0.5 * jnp.sum(
                    (lf2 - 1.0) ** 2 * lane0 * rowm) * inv_b
            elif variant == "mmgan":    # saturating: min -softplus(l)
                gl = -jax.nn.sigmoid(lf2) * lane0 * rowm * inv_b
                g_loss = -jnp.sum(softplus(lf2) * lane0 * rowm) * inv_b
            else:                       # nsgan heuristic: BCE(l, 1)
                gl = (jax.nn.sigmoid(lf2) - 1.0) * lane0 * rowm * inv_b
                g_loss = jnp.sum(softplus(-lf2) * lane0 * rowm) * inv_b

            dh2 = dotT_rhs(gl, w2d_) * dleaky(hf2)
            dx = dotT_rhs(dh2, w1d_)                            # [bp,kx]
            gu2 = dx * fake2 * (1.0 - fake2)  # sigmoid' from the masked
            #                                   output: padded lanes = 0
            dW2g = dotT_lhs(hg, gu2)
            db2g = jnp.sum(gu2, axis=0, keepdims=True)
            dhg = dotT_rhs(gu2, w2g) * (hg > 0).astype(jnp.float32)
            dW1g = dotT_lhs(zgk, dhg)
            db1g = jnp.sum(dhg, axis=0, keepdims=True)

            adam(s_g_w1, dW1g, t, g_lr)
            adam(s_g_b1, db1g * brow0_h, t, g_lr)
            adam(s_g_w2, dW2g, t, g_lr)
            adam(s_g_b2, db2g * brow0_x, t, g_lr)

            # metrics row: [d_loss, d_real, d_fake, g_loss, 0, ...]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            row = (jnp.where(lane == 0, d_loss, 0.0)
                   + jnp.where(lane == 1, d_real, 0.0)
                   + jnp.where(lane == 2, d_fake_m, 0.0)
                   + jnp.where(lane == 3, g_loss, 0.0))
            metrics[pl.ds(k, 1), :] = row
            return 0

        jax.lax.fori_loop(0, steps, body, 0)

        # ---- one-time state store: VMEM -> HBM ---------------------
        for i in range(8):
            pltpu.make_async_copy(scr[i], outs[i], state_sems.at[i]).start()
        for i in range(8):
            pltpu.make_async_copy(scr[i], outs[i], state_sems.at[i]).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "steps", "b", "dims", "g_lr", "d_lr", "b1", "b2", "eps", "slope",
    "variant", "interpret"))
def _fused_chunk_call(xs, zds, zgs, packed, t_base, *, steps, b, dims,
                      g_lr, d_lr, b1, b2, eps, slope, variant, interpret):
    """packed: tuple of 8 [3, R, C] padded state tensors (see kernel).
    xs/zds/zgs: [steps*bp, kx/kz] padded streams. Returns (new_packed,
    metrics [steps, 128])."""
    zdim, hdim, xdim = dims
    kz, kh, kx, kl = _ru(zdim, 128), _ru(hdim, 128), _ru(xdim, 128), 128
    bp = _ru(max(b, 8), 8)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [any_spec] * 11 + [
        pl.BlockSpec(memory_space=pltpu.SMEM)]
    out_specs = tuple([any_spec] * 8
                      + [pl.BlockSpec(memory_space=pltpu.VMEM)])
    out_shape = tuple([jax.ShapeDtypeStruct(p.shape, p.dtype)
                       for p in packed]
                      + [jax.ShapeDtypeStruct((steps, 128), jnp.float32)])
    scratch = [pltpu.VMEM(p.shape, jnp.float32) for p in packed]
    scratch += [
        pltpu.VMEM((2, bp, kx), jnp.float32),
        pltpu.VMEM((2, bp, kz), jnp.float32),
        pltpu.VMEM((2, bp, kz), jnp.float32),
        pltpu.SemaphoreType.DMA((8,)),
        pltpu.SemaphoreType.DMA((3, 2)),
    ]

    kernel = _make_kernel(steps, b, bp, kz, kh, kx, kl, xdim,
                          g_lr, d_lr, b1, b2, eps, slope, variant)
    res = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(xs, zds, zgs, *packed, t_base)
    return tuple(res[:8]), res[8]


# ------------------------------------------------------------------
# XLA-side packing / unpacking and the trainer-facing builder
# ------------------------------------------------------------------

def _pad2(a, r, c):
    return jnp.pad(a, ((0, r - a.shape[0]), (0, c - a.shape[1])))


def _pack_w(p, m, v, r, c):
    return jnp.stack([_pad2(p, r, c), _pad2(m, r, c), _pad2(v, r, c)])


def _pack_b(p, m, v, c):
    return jnp.stack([_pad2(p[None, :], 8, c), _pad2(m[None, :], 8, c),
                      _pad2(v[None, :], 8, c)])


def build_fused_many_steps(spec, cfg, steps_per_epoch: int,
                           interpret: bool = False):
    """Drop-in replacement for train.step.build_many_steps for the
    fused-kernel path (Config.fused_step). Same contract:
    fn(state, images, labels, perm_stack, rel_offsets) -> (state,
    metrics) — gather + noise-chain + kernel in ONE jit."""
    from generative_models_tpu.train.step import decode_images

    assert cfg.variant in FUSED_VARIANTS and cfg.arch == "mlp"
    b = cfg.batch_size
    bp = _ru(max(b, 8), 8)
    zdim, hdim, xdim = cfg.z_dim, cfg.hidden_dim, cfg.image_dim
    kz, kh, kx = _ru(zdim, 128), _ru(hdim, 128), _ru(xdim, 128)
    kl = 128
    rows_per_epoch = steps_per_epoch * b

    def many_steps(state, images, labels, perm_stack, rel_offsets):
        steps = rel_offsets.shape[0]

        # --- gather every step's batch (reference permutation walk) --
        def idx_one(rel_offset):
            e = rel_offset // rows_per_epoch
            r = rel_offset % rows_per_epoch
            return jax.lax.dynamic_slice(perm_stack, (e, r), (1, b))[0]
        idx = jax.vmap(idx_one)(rel_offsets).reshape(-1)      # [steps*b]
        xs = decode_images(jnp.take(images, idx, axis=0))     # [steps*b, xd]
        xs = xs.reshape(steps, b, xdim)
        xs = jnp.pad(xs, ((0, 0), (0, bp - b), (0, kx - xdim)))
        xs = xs.reshape(steps * bp, kx)

        # --- replay the XLA step's noise chain (train/step.py) -------
        def draw(rng, _):
            rng, d_key, g_key = jax.random.split(rng, 3)
            d_rngs = jax.random.split(d_key, 1)
            zd = jax.random.normal(d_rngs[0], (b, zdim))
            zg = jax.random.normal(g_key, (b, zdim))
            return rng, (zd, zg)
        rng_out, (zds, zgs) = jax.lax.scan(draw, state["rng"], None,
                                           length=steps)

        def pad_z(z):
            z = jnp.pad(z, ((0, 0), (0, bp - b), (0, kz - zdim)))
            return z.reshape(steps * bp, kz)
        zds, zgs = pad_z(zds), pad_z(zgs)

        # --- pack params + Adam state --------------------------------
        g_p, d_p = state["g_params"], state["d_params"]
        g_adam, g_rest = state["g_opt"]
        d_adam, d_rest = state["d_opt"]
        packed = (
            _pack_w(g_p[0]["w"], g_adam.mu[0]["w"], g_adam.nu[0]["w"],
                    kz, kh),
            _pack_b(g_p[0]["b"], g_adam.mu[0]["b"], g_adam.nu[0]["b"], kh),
            _pack_w(g_p[1]["w"], g_adam.mu[1]["w"], g_adam.nu[1]["w"],
                    kh, kx),
            _pack_b(g_p[1]["b"], g_adam.mu[1]["b"], g_adam.nu[1]["b"], kx),
            _pack_w(d_p[0]["w"], d_adam.mu[0]["w"], d_adam.nu[0]["w"],
                    kx, kh),
            _pack_b(d_p[0]["b"], d_adam.mu[0]["b"], d_adam.nu[0]["b"], kh),
            _pack_w(d_p[1]["w"], d_adam.mu[1]["w"], d_adam.nu[1]["w"],
                    kh, kl),
            _pack_b(d_p[1]["b"], d_adam.mu[1]["b"], d_adam.nu[1]["b"], kl),
        )
        t_base = jnp.reshape(g_adam.count, (1, 1)).astype(jnp.int32)

        new_packed, metrics = _fused_chunk_call(
            xs, zds, zgs, packed, t_base,
            steps=steps, b=b, dims=(zdim, hdim, xdim),
            g_lr=cfg.g_lr, d_lr=cfg.d_lr, b1=cfg.adam_b1, b2=cfg.adam_b2,
            eps=cfg.adam_eps, slope=cfg.leaky_slope, variant=cfg.variant,
            interpret=interpret)

        # --- unpack ---------------------------------------------------
        def unw(t, r, c):
            return t[0, :r, :c], t[1, :r, :c], t[2, :r, :c]

        def unb(t, c):
            return t[0, 0, :c], t[1, 0, :c], t[2, 0, :c]

        gw1 = unw(new_packed[0], zdim, hdim)
        gb1 = unb(new_packed[1], hdim)
        gw2 = unw(new_packed[2], hdim, xdim)
        gb2 = unb(new_packed[3], xdim)
        dw1 = unw(new_packed[4], xdim, hdim)
        db1 = unb(new_packed[5], hdim)
        dw2 = unw(new_packed[6], hdim, 1)
        db2 = unb(new_packed[7], 1)

        def layers(a, b_):
            return [{"w": a[0], "b": b_[0]}, {"w": a[1], "b": b_[1]}]

        count = g_adam.count + steps
        new_state = {
            "g_params": [{"w": gw1[0], "b": gb1[0]},
                         {"w": gw2[0], "b": gb2[0]}],
            "d_params": [{"w": dw1[0], "b": db1[0]},
                         {"w": dw2[0], "b": db2[0]}],
            "g_opt": (g_adam._replace(
                count=count,
                mu=[{"w": gw1[1], "b": gb1[1]}, {"w": gw2[1], "b": gb2[1]}],
                nu=[{"w": gw1[2], "b": gb1[2]}, {"w": gw2[2], "b": gb2[2]}],
            ), g_rest),
            "d_opt": (d_adam._replace(
                count=count,
                mu=[{"w": dw1[1], "b": db1[1]}, {"w": dw2[1], "b": db2[1]}],
                nu=[{"w": dw1[2], "b": db1[2]}, {"w": dw2[2], "b": db2[2]}],
            ), d_rest),
            "vstate": state["vstate"],
            "step": state["step"] + steps,
            "rng": rng_out,
        }
        out_metrics = {
            "d_loss": metrics[:, 0],
            "d_real": metrics[:, 1],
            "d_fake": metrics[:, 2],
            "g_loss": metrics[:, 3],
        }
        return new_state, out_metrics

    return many_steps


FUSED_VARIANTS = ("nsgan", "mmgan", "lsgan")


def fused_step_supported(spec, cfg) -> Tuple[bool, str]:
    """(ok, reason). The fused chunk covers the flagship configuration;
    anything else keeps the general builder."""
    if cfg.variant not in FUSED_VARIANTS:
        return False, f"fused_step covers {FUSED_VARIANTS} only"
    if cfg.arch != "mlp":
        return False, "fused_step covers the mlp stacks only"
    if cfg.d_steps != 1:
        return False, "fused_step requires d_steps=1"
    if cfg.optimizer != "adam":
        return False, "fused_step requires adam"
    if cfg.spectral_projection or cfg.ema_decay > 0:
        return False, "fused_step excludes spectral/EMA hooks"
    if cfg.dtype != "float32":
        return False, "fused_step is float32"
    if cfg.dp > 1 or cfg.tp > 1:
        return False, "fused_step is single-device (use dp/tp paths)"
    # any prng_impl works: the noise chain is drawn by XLA outside the
    # kernel, replaying train/step.py's split order exactly
    return True, ""
