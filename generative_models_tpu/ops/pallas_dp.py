"""Fused-kernel data parallelism — per-phase Pallas gradient kernels
under shard_map (VERDICT r2 next #1, design (a)).

The whole-chunk kernel (ops/pallas_train.py) keeps params + optimizer
state VMEM-resident across hundreds of steps — which is exactly what
data parallelism cannot keep: every D and G update must consume the
GLOBALLY-summed gradient, so the chunk has to break at each gradient
boundary for a collective. This module is that break, made as cheap as
the boundary allows:

- ONE Pallas kernel per gradient phase (each of the d_steps critic
  steps, then the G step) fuses the whole phase on-device: G forward,
  D forward on real+fake, the hand-derived dL/dlogit hook
  (`pallas_train._make_variant_hooks` — the SAME table the monolith
  uses, so the loss math cannot drift), the gradient-penalty
  double-backward, and the full backward to parameter gradients;
- `jax.lax.pmean` reduces the phase's gradients over the mesh axis
  (XLA collective over ICI — the boundary itself stays XLA's);
- the optimizer update is the XLA step's own optax transform
  (train/optim.py), applied identically on every device, plus the
  variant hooks (d_post clip, d_state_update, step_state_update) from
  the spec — so trajectory equivalence with the shard_map XLA path
  (parallel/dp.py) holds by construction up to the kernel-vs-autodiff
  fp tolerance already established by tests/test_fused_step.py.

HONESTY NOTE (the VMEM-residency win does NOT survive this): params
round-trip HBM at every phase — the per-step memory equation collapses
back to the XLA step's (state + optimizer traffic ~16 MB/step at the
headline shapes, benchmarks/step_anatomy.py), and each phase pays a
kernel dispatch where the monolith paid one per THOUSANDS of steps.
What remains is phase-level fusion (activations never hit HBM) — a
second-order effect for these sizes. The measured single-chip facts
say the honest default is therefore: `fused_step="auto"` keeps the XLA
step whenever a mesh is present; this path exists so the kernel
COMPOSES with DP (`fused_step=True` + `--dp N`) and is
trajectory-equivalence-tested on the 8-device virtual mesh. Keeping
residency through the boundary needs in-kernel ICI collectives (Pallas
remote DMA rings) — measurable only on real multi-chip hardware, which
this sandbox does not have (design (b), documented in
docs/design.md §9).

Scope: the adversarial MLP family minus the batch-coupled members.
RaGAN and FisherGAN couple every sample's gradient through
global-batch statistics (losses/base.py `batch_coupled`): the coupled
means live OUTSIDE any per-device kernel, so a faithful kernel split
would need a second mid-phase collective (forward → psum means → grad
kernel). They keep the XLA DP path, which already pmean-couples them.
VAE/BIR-VAE are single-model (no alternation) — the XLA DP step for
them is one fused region already; BIR-VAE is also batch-coupled (BN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import pallas as pl

from generative_models_tpu.ops.pallas_mlp import _pad2, _ru
from generative_models_tpu.ops.pallas_train import (
    FUSED_VARIANTS,
    _cgan_selector,
    _dleaky,
    _gp_backward,
    _leaky,
    _make_dots,
    _make_variant_hooks,
)

# the adversarial members of FUSED_VARIANTS whose gradients are NOT
# coupled through global-batch statistics (see module docstring)
FUSED_DP_VARIANTS = tuple(
    v for v in FUSED_VARIANTS
    if v not in ("ragan", "fishergan", "vae", "birvae"))


def fused_dp_supported(spec, cfg):
    """(ok, reason) for the fused-kernel DP path (fused_step=True with
    a data-axis mesh)."""
    from generative_models_tpu.ops.pallas_train import fused_step_supported
    if cfg.variant not in FUSED_DP_VARIANTS:
        if cfg.variant in ("ragan", "fishergan"):
            return False, (
                f"{cfg.variant} couples gradients through global-batch "
                "statistics; the XLA DP path pmean-couples them "
                "(losses/base.py batch_coupled)")
        if cfg.variant in ("vae", "birvae"):
            return False, (f"{cfg.variant} is single-model; its XLA DP "
                           "step is already one fused region")
        return False, f"fused DP covers {FUSED_DP_VARIANTS} only"
    # Check the PER-DEVICE kernel constraints: fused_step_supported
    # rejects cfg.dp > 1 outright ("fused_step is single-device") —
    # that is exactly the case this path exists for, so strip the
    # parallelism degrees before delegating (--dp N sets cfg.dp = N;
    # the round-3 review found the CLI route unreachable otherwise).
    ok, reason = fused_step_supported(spec, cfg.replace(dp=1, tp=1))
    if not ok:
        return False, reason
    return True, ""


# ------------------------------------------------------------------
# Phase kernels — gradients only, whole phase fused, no optimizer
# ------------------------------------------------------------------

def _make_d_phase_kernel(b, bp, kz, kh, kx, kl, khd, x_true, zin, slope,
                         variant, dtype, gp_lam, n_cls, fgan_div, fgan_ns,
                         q_cat, q_cont, info_lam):
    """One critic step's gradients for the LOCAL shard: G fwd (fake),
    D fwd on real+fake, d_hook, backward (+ GP double-backward).
    inv_b = 1/local_b: the pmean outside turns the local means into the
    global-batch means the XLA path computes."""
    inv_b = 1.0 / b

    def kernel(x, zd, xtra, gw1, gb1, gw2, gb2, dw1, db1, dw2, db2, vs,
               o_dw1, o_db1, o_dw2, o_db2, o_m):
        rows = jax.lax.broadcasted_iota(jnp.int32, (bp, 1), 0)
        rowm = (rows < b).astype(jnp.float32)
        lane0 = (jax.lax.broadcasted_iota(jnp.int32, (bp, kl), 1)
                 == 0).astype(jnp.float32)
        xcols = (jax.lax.broadcasted_iota(jnp.int32, (bp, kx), 1)
                 < x_true).astype(jnp.float32)
        brow0_hd = (jax.lax.broadcasted_iota(jnp.int32, (8, khd), 0)
                    == 0).astype(jnp.float32)
        brow0_l = (jax.lax.broadcasted_iota(jnp.int32, (8, kl), 0)
                   == 0).astype(jnp.float32)
        dotT_lhs, dotT_rhs, mm = _make_dots(dtype)
        d_hook, _ = _make_variant_hooks(
            variant=variant, b=b, bp=bp, kl=kl, x_true=x_true, zin=zin,
            inv_b=inv_b, slope=slope, fgan_div=fgan_div, fgan_ns=fgan_ns,
            fisher_rho=0.0, q_cat=q_cat, q_cont=q_cont,
            info_lam=info_lam, mm=mm, rowm=rowm, lane0=lane0, xcols=xcols)

        lam = vs[0, 0]
        w1g, b1g = gw1[...], gb1[0:1, :]
        w2g, b2g = gw2[...], gb2[0:1, :]
        w1d, b1d = dw1[...], db1[0:1, :]
        w2d, b2d = dw2[...], db2[0:1, :]
        xk, zdk = x[...], zd[...]

        hgd = jnp.maximum(mm(zdk, w1g) + b1g, 0.0)
        fake = jax.nn.sigmoid(mm(hgd, w2g) + b2g) * xcols
        if n_cls > 0:   # cgan: D sees fake ⊕ onehot(y)
            fake_d = fake + mm(zdk, _cgan_selector(
                zin, n_cls, x_true, kz, kx))
        else:
            fake_d = fake
        hr = _leaky(mm(xk, w1d) + b1d, slope)
        lr_ = mm(hr, w2d) + b2d
        hf = _leaky(mm(fake_d, w1d) + b1d, slope)
        lf = mm(hf, w2d) + b2d

        (glr, glf, d_loss, d_real, d_fake_m, aux6_m,
         lam) = d_hook(lr_, lf, xk, fake_d, zdk, lam)

        dW2d = dotT_lhs(hr, glr) + dotT_lhs(hf, glf)
        db2d_ = jnp.sum(glr + glf, axis=0, keepdims=True)
        dhr = dotT_rhs(glr, w2d) * _dleaky(hr, slope)
        dhf = dotT_rhs(glf, w2d) * _dleaky(hf, slope)
        dW1d = dotT_lhs(xk, dhr) + dotT_lhs(fake_d, dhf)
        db1d_ = jnp.sum(dhr + dhf, axis=0, keepdims=True)

        gp_m = gnorm_m = jnp.float32(0.0)
        if variant in ("dragan", "wgangp"):
            if variant == "dragan":   # perturbed real rows, pre-drawn
                xh = xtra[...]
            else:                     # eps·x + (1−eps)·fake
                epsk = xtra[..., 0:1]
                xh = epsk * xk + (1.0 - epsk) * fake
            dW1_add, dW2_add, gp_m, gnorm_m = _gp_backward(
                xh, w1d, b1d, w2d, lane0=lane0, rowm=rowm, inv_b=inv_b,
                gp_lam=gp_lam, slope=slope, mm=mm,
                dotT_lhs=dotT_lhs, dotT_rhs=dotT_rhs)
            dW1d = dW1d + dW1_add
            dW2d = dW2d + dW2_add
            d_loss = d_loss + gp_m

        o_dw1[...] = dW1d
        o_db1[...] = db1d_ * brow0_hd
        o_dw2[...] = dW2d
        o_db2[...] = db2d_ * brow0_l
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        o_m[...] = (jnp.where(lane == 0, d_loss, 0.0)
                    + jnp.where(lane == 1, d_real, 0.0)
                    + jnp.where(lane == 2, d_fake_m, 0.0)
                    + jnp.where(lane == 4, gp_m, 0.0)
                    + jnp.where(lane == 5, gnorm_m, 0.0)
                    + jnp.where(lane == 6, aux6_m, 0.0)
                    + jnp.where(lane == 7, lam, 0.0))

    return kernel


def _make_g_phase_kernel(b, bp, kz, kh, kx, kl, khd, x_true, zin, slope,
                         variant, dtype, n_cls, fgan_div, fgan_ns,
                         q_cat, q_cont, info_lam):
    """The G step's gradients for the LOCAL shard through the
    post-update critic (reference order)."""
    inv_b = 1.0 / b

    def kernel(zg, gw1, gb1, gw2, gb2, dw1, db1, dw2, db2, vs,
               o_gw1, o_gb1, o_gw2, o_gb2, o_m):
        rows = jax.lax.broadcasted_iota(jnp.int32, (bp, 1), 0)
        rowm = (rows < b).astype(jnp.float32)
        lane0 = (jax.lax.broadcasted_iota(jnp.int32, (bp, kl), 1)
                 == 0).astype(jnp.float32)
        xcols = (jax.lax.broadcasted_iota(jnp.int32, (bp, kx), 1)
                 < x_true).astype(jnp.float32)
        brow0_h = (jax.lax.broadcasted_iota(jnp.int32, (8, kh), 0)
                   == 0).astype(jnp.float32)
        brow0_x = (jax.lax.broadcasted_iota(jnp.int32, (8, kx), 0)
                   == 0).astype(jnp.float32)
        dotT_lhs, dotT_rhs, mm = _make_dots(dtype)
        _, g_hook = _make_variant_hooks(
            variant=variant, b=b, bp=bp, kl=kl, x_true=x_true, zin=zin,
            inv_b=inv_b, slope=slope, fgan_div=fgan_div, fgan_ns=fgan_ns,
            fisher_rho=0.0, q_cat=q_cat, q_cont=q_cont,
            info_lam=info_lam, mm=mm, rowm=rowm, lane0=lane0, xcols=xcols)

        lam = vs[0, 0]
        w1g, b1g = gw1[...], gb1[0:1, :]
        w2g, b2g = gw2[...], gb2[0:1, :]
        w1d, b1d = dw1[...], db1[0:1, :]
        w2d, b2d = dw2[...], db2[0:1, :]
        zgk = zg[...]

        hg = jnp.maximum(mm(zgk, w1g) + b1g, 0.0)
        fake2 = jax.nn.sigmoid(mm(hg, w2g) + b2g) * xcols
        if n_cls > 0:
            fake2_d = fake2 + mm(zgk, _cgan_selector(
                zin, n_cls, x_true, kz, kx))
        else:
            fake2_d = fake2
        hf2 = _leaky(mm(fake2_d, w1d) + b1d, slope)
        lf2 = mm(hf2, w2d) + b2d

        gl, g_loss, g_aux6, dx_extra = g_hook(lf2, zgk, fake2, lam, None)

        dh2 = dotT_rhs(gl, w2d) * _dleaky(hf2, slope)
        dx = dotT_rhs(dh2, w1d)
        if dx_extra is not None:    # began: direct L1 path into fake2
            dx = dx + dx_extra
        gu2 = dx * fake2 * (1.0 - fake2)
        dW2g = dotT_lhs(hg, gu2)
        db2g = jnp.sum(gu2, axis=0, keepdims=True)
        dhg = dotT_rhs(gu2, w2g) * (hg > 0).astype(jnp.float32)
        dW1g = dotT_lhs(zgk, dhg)
        db1g = jnp.sum(dhg, axis=0, keepdims=True)

        o_gw1[...] = dW1g
        o_gb1[...] = db1g * brow0_h
        o_gw2[...] = dW2g
        o_gb2[...] = db2g * brow0_x
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        o_m[...] = (jnp.where(lane == 3, g_loss, 0.0)
                    + jnp.where(lane == 6, g_aux6, 0.0))

    return kernel


# ------------------------------------------------------------------
# The trainer-facing builder
# ------------------------------------------------------------------

def build_fused_dp_many_steps(spec, cfg, steps_per_epoch: int,
                              mesh, interpret: bool = False):
    """shard_map twin of pallas_train.build_fused_many_steps: phase
    kernels per device, lax.pmean at every gradient boundary, optax
    updates + spec hooks identical to parallel/dp.py's XLA path. Same
    contract: jitted fn(state, images, labels, perm_stack, rel_offsets)
    -> (state, metrics)."""
    from jax.sharding import PartitionSpec as P

    from generative_models_tpu.parallel.dp import (
        _shard_map, make_gather_local,
    )
    from generative_models_tpu.parallel.mesh import DATA_AXIS
    from generative_models_tpu.train.optim import make_tx
    from generative_models_tpu.train.step import _ema_update

    variant = cfg.variant
    assert variant in FUSED_DP_VARIANTS and cfg.arch == "mlp"
    n_dev = int(np.prod(mesh.devices.shape))
    if cfg.batch_size % n_dev != 0:
        raise ValueError(
            f"global batch {cfg.batch_size} not divisible by mesh "
            f"size {n_dev}")
    b = cfg.batch_size // n_dev           # LOCAL batch per device
    ds = max(cfg.d_steps, 1)
    bp = _ru(max(b, 8), 8)
    zdim, hdim, xdim = cfg.z_dim, cfg.hidden_dim, cfg.image_dim
    n_cls = cfg.num_classes if variant == "cgan" else 0
    info = variant == "infogan"
    qc, qn = (cfg.info_cat_dim, cfg.info_cont_dim) if info else (0, 0)
    zin, xin = zdim + n_cls + qc + qn, xdim + n_cls
    kz, kh, kx = _ru(zin, 128), _ru(hdim, 128), _ru(xin, 128)
    began = variant == "began"
    dh = cfg.began_ae_hidden if began else hdim
    dout = xdim if began else (1 + qc + 2 * qn if info else 1)
    khd = _ru(dh, 128)
    kl = kx if began else 128
    has_xtra = variant in ("dragan", "wgangp")
    xtra_lanes = kx if variant == "dragan" else 128
    gp_lam = cfg.gp_lambda if has_xtra else 0.0
    fgan_div = cfg.fgan_divergence if variant == "fgan" else ""
    fgan_ns = (variant == "fgan"
               and cfg.fgan_g_loss == "nonsaturating")
    info_lam = cfg.info_lambda if info else 0.0

    d_kernel = _make_d_phase_kernel(
        b, bp, kz, kh, kx, kl, khd, xdim, zin, cfg.leaky_slope, variant,
        cfg.dtype, gp_lam, n_cls, fgan_div, fgan_ns, qc, qn, info_lam)
    g_kernel = _make_g_phase_kernel(
        b, bp, kz, kh, kx, kl, khd, xdim, zin, cfg.leaky_slope, variant,
        cfg.dtype, n_cls, fgan_div, fgan_ns, qc, qn, info_lam)

    f32 = jnp.float32

    from jax.experimental.pallas import tpu as pltpu
    _smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def _d_phase(x_p, zd_p, xtra_p, g_pl, d_pl, vs):
        outs = pl.pallas_call(
            d_kernel,
            in_specs=[pl.BlockSpec()] * 11 + [_smem],
            out_shape=(jax.ShapeDtypeStruct((kx, khd), f32),
                       jax.ShapeDtypeStruct((8, khd), f32),
                       jax.ShapeDtypeStruct((khd, kl), f32),
                       jax.ShapeDtypeStruct((8, kl), f32),
                       jax.ShapeDtypeStruct((1, 128), f32)),
            interpret=interpret,
        )(x_p, zd_p, xtra_p, *g_pl, *d_pl, vs)
        return outs[:4], outs[4][0]

    def _g_phase(zg_p, g_pl, d_pl, vs):
        outs = pl.pallas_call(
            g_kernel,
            in_specs=[pl.BlockSpec()] * 9 + [_smem],
            out_shape=(jax.ShapeDtypeStruct((kz, kh), f32),
                       jax.ShapeDtypeStruct((8, kh), f32),
                       jax.ShapeDtypeStruct((kh, kx), f32),
                       jax.ShapeDtypeStruct((8, kx), f32),
                       jax.ShapeDtypeStruct((1, 128), f32)),
            interpret=interpret,
        )(zg_p, *g_pl, *d_pl, vs)
        return outs[:4], outs[4][0]

    # --- param pad / grad unpad (pytree <-> padded 2-D planes) -------
    def _pw(w, r, c):
        return _pad2(w, r, c)

    def _pb(bv, c):
        return _pad2(bv[None, :], 8, c)

    def pack_g(g_params):
        return (_pw(g_params[0]["w"], kz, kh), _pb(g_params[0]["b"], kh),
                _pw(g_params[1]["w"], kh, kx), _pb(g_params[1]["b"], kx))

    def pack_d(d_params):
        if info:
            w2 = jnp.concatenate(
                [d_params["d_head"]["w"], d_params["q_head"]["w"]], axis=1)
            b2 = jnp.concatenate(
                [d_params["d_head"]["b"], d_params["q_head"]["b"]])
            l1 = d_params["trunk"][0]
        else:
            l1, (w2, b2) = d_params[0], (d_params[1]["w"], d_params[1]["b"])
        return (_pw(l1["w"], kx, khd), _pb(l1["b"], khd),
                _pw(w2, khd, kl), _pb(b2, kl))

    def unpack_g_grads(t):
        return [{"w": t[0][:zin, :hdim], "b": t[1][0, :hdim]},
                {"w": t[2][:hdim, :xdim], "b": t[3][0, :xdim]}]

    def unpack_d_grads(t):
        if info:
            return {"trunk": [{"w": t[0][:xin, :dh], "b": t[1][0, :dh]}],
                    "d_head": {"w": t[2][:dh, :1], "b": t[3][0, :1]},
                    "q_head": {"w": t[2][:dh, 1:dout],
                               "b": t[3][0, 1:dout]}}
        return [{"w": t[0][:xin, :dh], "b": t[1][0, :dh]},
                {"w": t[2][:dh, :dout], "b": t[3][0, :dout]}]

    # --- noise: replay each loss fn's exact draw order ---------------
    def draw_d(r, x, y):
        """-> (x_row [b,xin], zd [b,zin], xtra or None); r is the
        post-fold_in per-device key the loss would receive."""
        xtra = None
        if variant == "dragan":
            z_rng, p_rng = jax.random.split(r)        # losses/dragan.py
            z = jax.random.normal(z_rng, (b, zdim))
            std = jnp.std(x)                          # ops/penalty.py
            u = jax.random.uniform(p_rng, x.shape)
            xtra = x + cfg.dragan_noise_scale * std * u
        elif variant == "wgangp":
            z_rng, eps_rng = jax.random.split(r)      # losses/wgangp.py
            z = jax.random.normal(z_rng, (b, zdim))
            xtra = jax.random.uniform(eps_rng, (b, 1))
        elif info:
            code_rng, _ = jax.random.split(r)         # losses/infogan.py
            r1, r2, r3 = jax.random.split(code_rng, 3)
            zn = jax.random.normal(r1, (b, zdim))
            cat = jax.random.randint(r2, (b,), 0, qc)
            cont = jax.random.uniform(r3, (b, qn), minval=-1.0,
                                      maxval=1.0)
            z = jnp.concatenate(
                [zn, jax.nn.one_hot(cat, qc, dtype=f32), cont], axis=-1)
        else:
            z = jax.random.normal(r, (b, zdim))
        if n_cls > 0:
            oh = jax.nn.one_hot(y, n_cls, dtype=f32)
            return (jnp.concatenate([x, oh], axis=-1),
                    jnp.concatenate([z, oh], axis=-1), xtra)
        return x, z, xtra

    def draw_g(r, y_last):
        if info:
            code_rng, _ = jax.random.split(r)
            r1, r2, r3 = jax.random.split(code_rng, 3)
            zn = jax.random.normal(r1, (b, zdim))
            cat = jax.random.randint(r2, (b,), 0, qc)
            cont = jax.random.uniform(r3, (b, qn), minval=-1.0,
                                      maxval=1.0)
            return jnp.concatenate(
                [zn, jax.nn.one_hot(cat, qc, dtype=f32), cont], axis=-1)
        z = jax.random.normal(r, (b, zdim))
        if n_cls > 0:
            z = jnp.concatenate(
                [z, jax.nn.one_hot(y_last, n_cls, dtype=f32)], axis=-1)
        return z

    def pad_xtra(xtra):
        if xtra is None:
            return jnp.zeros((8, xtra_lanes), f32)
        return _pad2(xtra, bp, xtra_lanes)

    # --- metric lanes -> the loss fns' named dicts --------------------
    def d_named(m):
        if variant == "wgan":
            return {"d_loss": m[0], "w_estimate": -m[0]}
        if variant == "wgangp":
            return {"d_loss": m[0], "w_estimate": m[1] - m[2],
                    "gp": m[4], "grad_norm": m[5]}
        if variant == "dragan":
            return {"d_loss": m[0], "gp": m[4], "grad_norm": m[5]}
        if variant == "fgan":
            return {"d_loss": m[0], "f_bound": -m[0]}
        if began:
            return {"d_loss": m[0], "began_l_real": m[1],
                    "began_l_fake_d": m[2]}
        if info:
            return {"d_loss": m[0], "mi_loss": m[1]}
        return {"d_loss": m[0], "d_real": m[1], "d_fake": m[2]}

    def g_named(m):
        if began:
            return {"g_loss": m[3], "began_l_fake_g": m[3]}
        if info:
            return {"g_loss": m[3], "g_mi_loss": m[6]}
        return {"g_loss": m[3]}

    # --- the per-device step (mirrors train/step.py under shard_map) --
    g_tx = make_tx(cfg, cfg.g_lr)
    d_tx = make_tx(cfg, cfg.d_lr)
    gather_local = make_gather_local(cfg, ds, steps_per_epoch, n_dev)

    def train_step(state, d_batches):
        rng, d_key, g_key = jax.random.split(state["rng"], 3)
        d_rngs = jax.random.split(d_key, ds)
        rank = jax.lax.axis_index(DATA_AXIS)
        g_pl = pack_g(state["g_params"])

        def d_body(carry, inp):
            d_params, d_opt, vstate = carry
            batch, r = inp
            r = jax.random.fold_in(r, rank)
            x_row, zd, xtra = draw_d(r, batch["image"], batch["label"])
            vs = jnp.stack(
                [vstate["k"] if began else jnp.float32(0.0),
                 jnp.float32(0.0)]).reshape(1, 2)
            grads_t, mrow = _d_phase(
                _pad2(x_row, bp, kx), _pad2(zd, bp, kz), pad_xtra(xtra),
                g_pl, pack_d(d_params), vs)
            grads = unpack_d_grads(grads_t)
            metrics = d_named(mrow)
            grads, metrics = jax.lax.pmean((grads, metrics), DATA_AXIS)
            updates, d_opt = d_tx.update(grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, updates)
            d_params = spec.d_post(d_params, cfg)
            vstate = spec.d_state_update(vstate, metrics, cfg)
            return (d_params, d_opt, vstate), metrics

        (d_params, d_opt, vstate), d_metrics_seq = jax.lax.scan(
            d_body, (state["d_params"], state["d_opt"], state["vstate"]),
            (d_batches, d_rngs))
        d_metrics = jax.tree.map(lambda a: a[-1], d_metrics_seq)

        y_last = d_batches["label"][-1]
        zg = draw_g(jax.random.fold_in(g_key, rank), y_last)
        vs = jnp.stack(
            [vstate["k"] if began else jnp.float32(0.0),
             jnp.float32(0.0)]).reshape(1, 2)
        g_grads_t, g_mrow = _g_phase(
            _pad2(zg, bp, kz), g_pl, pack_d(d_params), vs)
        g_grads = unpack_g_grads(g_grads_t)
        g_metrics = g_named(g_mrow)
        g_grads, g_metrics = jax.lax.pmean((g_grads, g_metrics),
                                           DATA_AXIS)
        g_updates, g_opt = g_tx.update(g_grads, state["g_opt"],
                                       state["g_params"])
        new_g_params = optax.apply_updates(state["g_params"], g_updates)

        vstate = spec.step_state_update(vstate, d_metrics, g_metrics,
                                        cfg)
        new_state = {
            "g_params": new_g_params,
            "d_params": d_params,
            "g_opt": g_opt,
            "d_opt": d_opt,
            "vstate": vstate,
            "step": state["step"] + 1,
            "rng": rng,
        }
        if cfg.ema_decay > 0:
            new_state["g_ema"] = _ema_update(
                state["g_ema"], new_g_params, cfg.ema_decay)
        metrics = {**d_metrics, **g_metrics}
        for k, v in vstate.items():
            metrics[f"vstate_{k}"] = v
        return new_state, metrics

    def many_steps(state, images, labels, perm_stack, rel_offsets):
        def body(state, rel_offset):
            return train_step(state, gather_local(
                images, labels, perm_stack, rel_offset))
        return jax.lax.scan(body, state, rel_offsets)

    smapped = _shard_map(
        many_steps, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped,
                   donate_argnums=(0,) if cfg.donate_buffers else ())
