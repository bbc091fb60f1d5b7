#!/usr/bin/env python
"""Benchmark: G+D train steps/sec/chip (the BASELINE.json north-star
metric) for the flagship NSGAN config, vs a faithful PyTorch-eager
replica of the reference's train loop.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

- JAX side: the real framework (HBM-resident data, jitted scanned
  step) on whatever accelerator is attached; steady-state timing
  (compile excluded by a warmup run).
- Baseline side: the reference is pure PyTorch with no published
  numbers (BASELINE.md), so the baseline is measured here: an eager
  torch loop with the same models/batch/optimizers and a per-step
  host->device copy, mirroring SURVEY.md §4.1. torch is CPU-only in
  this image; the reference itself also ran CPU or single GPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = 100
HIDDEN = 400
Z_DIM = 128
TORCH_STEPS = 120
# scan 8000, not 16000: steady-state rate is identical (BASELINE.md:
# the workload plateaus past scan=8000) but the fused kernel's cold
# Mosaic compile is roughly half — keeps the whole bench inside the
# driver's time budget on a cold cache.
SCAN = 8000
JAX_WARMUP = SCAN
JAX_STEPS = 5 * SCAN


def bench_jax(data, fused):
    from generative_models_tpu.config import variant_config
    from generative_models_tpu.train.trainer import Trainer

    cfg = variant_config(
        "nsgan", batch_size=BATCH, hidden_dim=HIDDEN, z_dim=Z_DIM,
        scan_steps=SCAN, seed=0,
        # match the torch replica's Adam defaults exactly (the registry
        # ships the measured-quality beta1=0.5; betas are numerically
        # irrelevant to throughput but the configs should be identical)
        adam_b1=0.9,
        # Each side uses its platform's standard fast RNG: torch keeps
        # its native generator below; the JAX side uses the TPU
        # hardware-RNG path (XLA RngBitGenerator) — noise draws are
        # ~20% of the f32 step budget (benchmarks/step_anatomy.py).
        # Training stays deterministic per seed; threefry remains the
        # framework default for bit-stable parity (config.py).
        prng_impl="rbg",
        # compute path: the fused whole-chunk Pallas kernel on a live
        # chip (measured 1.21x the XLA step, benchmarks/fused_ab.json);
        # XLA step on the CPU fallback (the fused kernel would run in
        # interpret mode there — meaningless to time)
        fused_step=fused)
    t = Trainer(config=cfg, data=data)
    # sample_every=-1: no per-epoch sample grids inside the timed loop —
    # the torch replica's step loop generates no images either, so the
    # steps/sec comparison stays apples-to-apples
    t.train(steps=JAX_WARMUP, sample_every=-1)   # compile + warmup
    best = 0.0
    for _ in range(2):                           # steady state, best-of-2
        t.train(steps=JAX_STEPS, sample_every=-1)
        best = max(best, JAX_STEPS / t.wall_time)
    return best


def bench_torch(data):
    """Reference-idiom eager loop (replica built from SURVEY.md §4.1 —
    the reference mount is empty; math from Goodfellow 2014)."""
    import numpy as np
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    x_train = torch.from_numpy(
        data["x_train"].reshape(len(data["x_train"]), -1).astype("float32")
        / (255.0 if data["x_train"].dtype == np.uint8 else 1.0))

    G = nn.Sequential(nn.Linear(Z_DIM, HIDDEN), nn.ReLU(),
                      nn.Linear(HIDDEN, 784), nn.Sigmoid())
    D = nn.Sequential(nn.Linear(784, HIDDEN), nn.LeakyReLU(0.2),
                      nn.Linear(HIDDEN, 1))
    g_opt = torch.optim.Adam(G.parameters(), lr=2e-4)
    d_opt = torch.optim.Adam(D.parameters(), lr=2e-4)
    bce = nn.BCEWithLogitsLoss()

    n = x_train.shape[0]
    perm = torch.randperm(n)

    def step(k):
        idx = perm[(k * BATCH) % (n - BATCH):(k * BATCH) % (n - BATCH) + BATCH]
        real = x_train[idx].clone()  # per-batch host copy, reference-style
        z = torch.randn(BATCH, Z_DIM)
        fake = G(z)
        d_loss = bce(D(real).squeeze(1), torch.ones(BATCH)) + \
            bce(D(fake.detach()).squeeze(1), torch.zeros(BATCH))
        d_opt.zero_grad(); d_loss.backward(); d_opt.step()
        z = torch.randn(BATCH, Z_DIM)
        g_loss = bce(D(G(z)).squeeze(1), torch.ones(BATCH))
        g_opt.zero_grad(); g_loss.backward(); g_opt.step()

    for k in range(10):  # warmup
        step(k)
    best = 0.0
    for rep in range(2):  # best-of-2: favors the baseline, so the
        #                   reported ratio is the conservative one
        t0 = time.perf_counter()
        for k in range(10, 10 + TORCH_STEPS):
            step(k + rep * TORCH_STEPS)
        best = max(best, TORCH_STEPS / (time.perf_counter() - t0))
    return best


def main():
    # A dead/hung axon tunnel must degrade to an honest CPU-jax run,
    # not hang the driver's bench step (probe runs in a subprocess
    # with a timeout; see __graft_entry__.ensure_live_backend). But a
    # tunnel that is merely COLD answers a later probe — the round-3
    # driver bench lost its chip number to one 90 s probe against a
    # >90 s-cold backend init. Policy (BASELINE.md "probe policy"):
    # per-probe budget 240 s (the documented cold-init bound), up to 3
    # probes 90 s apart (~13 min worst case, inside the driver's bench
    # budget) before accepting the labeled CPU fallback.
    from __graft_entry__ import ensure_live_backend
    backend_alive = ensure_live_backend(timeout=240, retries=3,
                                        retry_wait=90)

    from generative_models_tpu.data.mnist import load_mnist

    data = load_mnist(allow_synthetic=True, synthetic_sizes=(12000, 1000))
    torch_sps = bench_torch(data)
    try:
        jax_sps = bench_jax(data, fused=backend_alive)
        path = "fused" if backend_alive else "xla"
    except Exception:   # never lose the bench to a kernel regression
        jax_sps = bench_jax(data, fused=False)
        path = "xla (fused arm failed)"
    result = {
        "metric": "nsgan_gd_steps_per_sec_per_chip",
        "value": round(jax_sps, 2),
        "unit": "steps/sec",
        "vs_baseline": round(jax_sps / torch_sps, 2),
        "baseline_torch_cpu_steps_per_sec": round(torch_sps, 2),
        "step_path": path,
    }
    if not backend_alive:
        result["platform_note"] = (
            "TPU tunnel dead at bench time; this is a CPU-jax fallback "
            "run, NOT the chip number (see BASELINE.md for chip records)")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
