#!/usr/bin/env python
"""DDPM-conv FID ablation (round-4 VERDICT #1b): the 20k-budget conv
UNet scored FID 78.5 — visible underfitting, not a ceiling. Attack it
with the same measured-ablation discipline as the conv spectral
rescues: a (training budget x noise schedule) grid of TRAINED models,
each scored across the sampler's free knobs (sample_steps), then the
winner re-trained on 3 seeds for an honest range.

    python benchmarks/ddpm_fid_ablation.py [--arch conv]
        [--budgets 20000 60000] [--schedules linear cosine]
        [--sample-steps 50 250 0] [--winner-seeds 3]

Axes and why (paper-pinned):
- budget: DDPM has no adversarial game; its failure mode is plain
  underfitting, so steps are the first suspect (Ho 2020 trains far
  past this scale).
- schedule: the cosine schedule (Nichol & Dhariwal 2021 §3.2) spends
  more of the chain at moderate noise where the eps-net actually
  learns structure — THE canonical low-resolution fix (the paper's
  motivating example is 32x32-class data like this).
- ddpm_sample_steps: a pure sampling-time knob (Song 2021 DDIM
  striding) — scored per trained model at zero extra training cost;
  0 = the full T-step ancestral chain.

Guidance weight is ablated separately (ddpm_guidance_ablation.py) on a
conditionally-trained net; this file keeps the unconditional quality
row's config honest.

Writes benchmarks/ddpm_fid_ablation.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="conv", choices=("mlp", "conv"))
    ap.add_argument("--budgets", nargs="*", type=int,
                    default=[20000, 60000])
    ap.add_argument("--schedules", nargs="*",
                    default=["linear", "cosine"])
    ap.add_argument("--sample-steps", nargs="*", type=int,
                    default=[50, 250, 0],
                    help="0 = full T-step chain")
    ap.add_argument("--scan", type=int, default=1000)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--winner-seeds", type=int, default=3)
    args = ap.parse_args()

    from __graft_entry__ import ensure_live_backend
    alive = ensure_live_backend()

    import jax

    from generative_models_tpu.config import variant_config
    from generative_models_tpu.data.mnist import load_mnist, to_flat_float
    from generative_models_tpu.losses.ddpm import sample as ddpm_sample
    from generative_models_tpu.train.trainer import Trainer
    from generative_models_tpu.utils.quality import (
        classifier_accuracy,
        fid_score,
        score_samples,
        train_classifier,
    )

    raw = load_mnist(allow_synthetic=True, synthetic_sizes=(12000, 2000))
    flat = to_flat_float(raw)
    clf = train_classifier(flat["x_train"], flat["y_train"])
    acc = classifier_accuracy(clf, flat["x_test"], flat["y_test"])
    print(json.dumps({"classifier_test_acc": round(acc, 4)}), flush=True)
    real_ref = flat["x_test"][:args.n]

    def train_once(budget, schedule, seed):
        cfg = variant_config("ddpm", arch=args.arch, seed=seed,
                             scan_steps=args.scan, ddpm_schedule=schedule)
        t = Trainer(config=cfg, data=raw)
        t.train(steps=budget, sample_every=-1)
        return t.state["ema"], cfg

    def score(params, cfg, s_steps, key=7):
        scfg = cfg.replace(ddpm_sample_steps=s_steps)
        samples = ddpm_sample(params, jax.random.PRNGKey(key), args.n,
                              scfg)
        sc = score_samples(clf, samples)
        sc["fid"] = fid_score(clf, real_ref, samples)
        return {k: round(float(v), 4) for k, v in sc.items()}

    rows = []
    for budget in args.budgets:
        for schedule in args.schedules:
            params, cfg = train_once(budget, schedule, seed=0)
            for s_steps in args.sample_steps:
                row = {"budget": budget, "schedule": schedule,
                       "sample_steps": s_steps, "seed": 0,
                       **score(params, cfg, s_steps)}
                rows.append(row)
                print(json.dumps(row), flush=True)

    winner = min(rows, key=lambda r: r["fid"])
    print(json.dumps({"winner": winner}), flush=True)

    # 3-seed range on the winning (budget, schedule, sample_steps)
    seed_rows = [dict(winner)]
    for seed in range(1, args.winner_seeds):
        params, cfg = train_once(winner["budget"], winner["schedule"],
                                 seed=seed)
        row = {"budget": winner["budget"],
               "schedule": winner["schedule"],
               "sample_steps": winner["sample_steps"], "seed": seed,
               **score(params, cfg, winner["sample_steps"])}
        seed_rows.append(row)
        print(json.dumps(row), flush=True)

    fids = sorted(r["fid"] for r in seed_rows)
    iss = sorted(r["is_score"] for r in seed_rows)
    out = {
        "config": {"arch": args.arch, "n": args.n,
                   "backend_alive": alive},
        "rows": rows,
        "winner": {k: winner[k]
                   for k in ("budget", "schedule", "sample_steps")},
        "winner_seed_rows": seed_rows,
        "winner_fid_range": [fids[0], fids[-1]],
        "winner_is_range": ([iss[0], iss[-1]] if iss else None),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ddpm_fid_ablation.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
