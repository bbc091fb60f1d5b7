#!/usr/bin/env python
"""Flow-matching few-step sampling ablation (round 4): the family's
claim — a deterministic straight-bridge ODE tolerates small step
counts far better than DDPM's stochastic ancestral chain — made into a
measured table. Train ONE conv model per budget, then score the SAME
weights across (flow_sample_steps x solver); 3 seeds on the winner.

    python benchmarks/flow_steps_ablation.py [--arch conv]
        [--budgets 20000 60000] [--steps-grid 2 4 8 16 50]
        [--solvers euler heun] [--winner-seeds 3]

Writes benchmarks/flow_steps_ablation.json. Compare against
ddpm_fid_ablation.json's sample_steps axis (measured there: the
stochastic chain NEEDS >=50 steps on the linear schedule) and the
serving curve (cost = S net evals/image; heun = 2S).
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
    ap.add_argument("--steps-grid", nargs="*", type=int,
                    default=[2, 4, 8, 16, 50])
    ap.add_argument("--solvers", nargs="*", default=["euler", "heun"])
    ap.add_argument("--scan", type=int, default=1000)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--winner-seeds", type=int, default=3)
    args = ap.parse_args()

    from __graft_entry__ import ensure_live_backend
    alive = ensure_live_backend()

    import jax

    from generative_models_tpu.config import variant_config
    from generative_models_tpu.data.mnist import load_mnist, to_flat_float
    from generative_models_tpu.losses.flow import sample as flow_sample
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

    def train_once(budget, seed):
        cfg = variant_config("flow", arch=args.arch, seed=seed,
                             scan_steps=args.scan)
        t = Trainer(config=cfg, data=raw)
        t.train(steps=budget, sample_every=-1)
        return t.state["ema"], cfg

    def score(params, cfg, s_steps, solver, key=7):
        scfg = cfg.replace(flow_sample_steps=s_steps, flow_solver=solver)
        samples = flow_sample(params, jax.random.PRNGKey(key), args.n,
                              scfg)
        sc = score_samples(clf, samples)
        sc["fid"] = fid_score(clf, real_ref, samples)
        return {k: round(float(v), 4) for k, v in sc.items()}

    rows = []
    for budget in args.budgets:
        params, cfg = train_once(budget, seed=0)
        for solver in args.solvers:
            for s in args.steps_grid:
                row = {"budget": budget, "solver": solver,
                       "sample_steps": s, "seed": 0,
                       **score(params, cfg, s, solver)}
                rows.append(row)
                print(json.dumps(row), flush=True)

    winner = min(rows, key=lambda r: r["fid"])
    print(json.dumps({"winner": winner}), flush=True)

    seed_rows = [dict(winner)]
    for seed in range(1, args.winner_seeds):
        params, cfg = train_once(winner["budget"], seed=seed)
        row = {"budget": winner["budget"], "solver": winner["solver"],
               "sample_steps": winner["sample_steps"], "seed": seed,
               **score(params, cfg, winner["sample_steps"],
                       winner["solver"])}
        seed_rows.append(row)
        print(json.dumps(row), flush=True)

    fids = sorted(r["fid"] for r in seed_rows)
    iss = sorted(r["is_score"] for r in seed_rows)
    out = {
        "config": {"arch": args.arch, "n": args.n,
                   "backend_alive": alive},
        "rows": rows,
        "winner": {k: winner[k]
                   for k in ("budget", "solver", "sample_steps")},
        "winner_seed_rows": seed_rows,
        "winner_fid_range": [fids[0], fids[-1]],
        "winner_is_range": [iss[0], iss[-1]],
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "flow_steps_ablation.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
