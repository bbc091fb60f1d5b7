"""Same-seed TRAJECTORY parity vs a PyTorch-eager replica
(BASELINE.json: "bitwise-comparable loss trajectories"; practical
definition per SURVEY.md §5: identical math + update order + data order
=> loss curves matching within accumulated-fp32 tolerance; true bitwise
equality across XLA-vs-ATen backends is not achievable).

Both sides get: the same initial weights, the same fixed minibatch
sequence, the same per-step z draws, and Adam(2e-4, torch defaults).
50 alternating D/G steps; every step's losses must agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

# 50-step torch-oracle trajectories: minutes each (VERDICT r2 #5)
pytestmark = pytest.mark.slow

from generative_models_tpu.config import variant_config
from generative_models_tpu.losses import minimax as minimax_mod
from generative_models_tpu.losses.registry import get_variant
from generative_models_tpu.train import step as step_lib

B, ZD, H, XD, STEPS = 32, 16, 48, 784, 50


def _np_linear(rng, i, o):
    b = 1 / np.sqrt(i)
    return (rng.uniform(-b, b, size=(i, o)).astype(np.float32),
            rng.uniform(-b, b, size=(o,)).astype(np.float32))


def test_nsgan_50_step_trajectory_matches_torch(monkeypatch):
    rng = np.random.default_rng(0)
    g_ws = [_np_linear(rng, ZD, H), _np_linear(rng, H, XD)]
    d_ws = [_np_linear(rng, XD, H), _np_linear(rng, H, 1)]
    xs = rng.random((STEPS, B, XD), dtype=np.float32)
    zs_d = rng.normal(size=(STEPS, B, ZD)).astype(np.float32)
    zs_g = rng.normal(size=(STEPS, B, ZD)).astype(np.float32)

    # ---------------- torch side (eager, reference idiom) ------------
    torch.manual_seed(0)
    G = torch.nn.Sequential(torch.nn.Linear(ZD, H), torch.nn.ReLU(),
                            torch.nn.Linear(H, XD), torch.nn.Sigmoid())
    D = torch.nn.Sequential(torch.nn.Linear(XD, H),
                            torch.nn.LeakyReLU(0.2), torch.nn.Linear(H, 1))
    with torch.no_grad():
        for m, (w, b) in zip([G[0], G[2]], g_ws):
            m.weight.copy_(torch.from_numpy(w.T)); m.bias.copy_(
                torch.from_numpy(b))
        for m, (w, b) in zip([D[0], D[2]], d_ws):
            m.weight.copy_(torch.from_numpy(w.T)); m.bias.copy_(
                torch.from_numpy(b))
    g_opt = torch.optim.Adam(G.parameters(), lr=2e-4)
    d_opt = torch.optim.Adam(D.parameters(), lr=2e-4)
    bce = torch.nn.BCEWithLogitsLoss()

    t_d_losses, t_g_losses = [], []
    for k in range(STEPS):
        x = torch.from_numpy(xs[k])
        fake = G(torch.from_numpy(zs_d[k]))
        d_loss = bce(D(x).squeeze(1), torch.ones(B)) + \
            bce(D(fake.detach()).squeeze(1), torch.zeros(B))
        d_opt.zero_grad(); d_loss.backward(); d_opt.step()
        g_loss = bce(D(G(torch.from_numpy(zs_g[k]))).squeeze(1),
                     torch.ones(B))
        g_opt.zero_grad(); g_loss.backward(); g_opt.step()
        t_d_losses.append(d_loss.item()); t_g_losses.append(g_loss.item())

    # ---------------- jax side (the actual framework step) -----------
    cfg = variant_config("nsgan", batch_size=B, z_dim=ZD, hidden_dim=H,
                         adam_b1=0.9, adam_b2=0.999, d_steps=1)
    spec = get_variant("nsgan")

    # pin the per-step noise: the d_loss call and g_loss call of step k
    # consume zs_d[k] and zs_g[k] in that order
    counter = {"n": 0}

    def fixed_noise(rng_, n, z_dim):
        i = counter["n"]; counter["n"] += 1
        src = zs_d if i % 2 == 0 else zs_g
        return jnp.asarray(src[i // 2])
    monkeypatch.setattr(minimax_mod, "compute_noise", fixed_noise)

    state = step_lib.init_state(spec, cfg, jax.random.PRNGKey(0))
    state["g_params"] = [{"w": jnp.asarray(w), "b": jnp.asarray(b)}
                         for w, b in g_ws]
    state["d_params"] = [{"w": jnp.asarray(w), "b": jnp.asarray(b)}
                         for w, b in d_ws]
    from generative_models_tpu.train.optim import make_tx
    state["g_opt"] = make_tx(cfg, cfg.g_lr).init(state["g_params"])
    state["d_opt"] = make_tx(cfg, cfg.d_lr).init(state["d_params"])

    # eager (non-jit) steps so the monkeypatched noise is consulted
    # per step — trajectory parity is a semantics test, not a perf path
    train_step = step_lib.build_step(spec, cfg)
    j_d_losses, j_g_losses = [], []
    for k in range(STEPS):
        batch = {"image": jnp.asarray(xs[k])[None],
                 "label": jnp.zeros((1, B), jnp.int32)}
        state, metrics = train_step(state, batch)
        j_d_losses.append(float(metrics["d_loss"]))
        j_g_losses.append(float(metrics["g_loss"]))

    # fp32 cross-backend drift accumulates; curves must stay glued
    np.testing.assert_allclose(j_d_losses, t_d_losses, rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(j_g_losses, t_g_losses, rtol=2e-3,
                               atol=2e-4)
    # and the early steps should agree much tighter
    np.testing.assert_allclose(j_d_losses[:5], t_d_losses[:5], rtol=1e-5)
