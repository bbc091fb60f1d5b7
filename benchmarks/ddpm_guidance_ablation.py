#!/usr/bin/env python
"""Classifier-free guidance ablation (Ho & Salimans 2021): train ONE
conditional model, then score samples from the SAME weights at several
guidance scales w — the diffusion analogue of this repo's EMA/spectral
ablations. eps = (1+w) eps_cond - w eps_null; w=0 is plain conditional
sampling. `--variant flow` runs the same ablation on the flow-matching
family (the guided-velocity form, losses/flow.py — the knobs are
shared by design, and this makes the "the conclusion transfers" claim
in docs/variants/flow.md a measured row instead of an argument).

    python benchmarks/ddpm_guidance_ablation.py [--steps 20000]
        [--scales 0 1 2 4] [--arch mlp] [--variant ddpm|flow]

Writes benchmarks/<variant>_guidance.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--scan", type=int, default=1000)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--arch", default="mlp", choices=("mlp", "conv"))
    ap.add_argument("--scales", nargs="*", type=float,
                    default=[0.0, 1.0, 2.0, 4.0])
    ap.add_argument("--variant", default="ddpm",
                    choices=("ddpm", "flow"))
    ap.add_argument("--schedule", default="linear",
                    choices=("linear", "cosine"),
                    help="noise schedule for the one trained model "
                         "(rerun at the ddpm_fid_ablation winner)")
    ap.add_argument("--seeds", type=int, default=3,
                    help="train one model per seed and score each at "
                         "every scale; rows carry a seed field and the "
                         "JSON a per-scale range summary (the repo's "
                         "headline-claim standard)")
    ap.add_argument("--seed-base", type=int, default=0,
                    help="first seed (with --merge, lets each seed run "
                         "as its own chip-queue job so a flapping "
                         "tunnel banks completed seeds instead of "
                         "restarting the whole ablation)")
    ap.add_argument("--merge", action="store_true",
                    help="merge rows into an existing output JSON "
                         "(replacing rows for the seeds being rerun) "
                         "and recompute the ranges over all rows")
    args = ap.parse_args()

    from __graft_entry__ import ensure_live_backend
    alive = ensure_live_backend()

    import jax

    from generative_models_tpu.config import variant_config
    from generative_models_tpu.data.mnist import load_mnist, to_flat_float
    from generative_models_tpu.losses.registry import get_variant
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

    spec = get_variant(args.variant)
    real_ref = flat["x_test"][:args.n]
    # sample() conditions column-cyclically: y_i = i mod num_classes.
    # label_match = classifier top-1 agreement with that conditioning
    # label — the diagnostic that separates "guidance conditions
    # correctly but drags samples off-manifold (FID up, match up)"
    # from a wiring bug (match flat/down while FID rises).
    import numpy as np
    rows = []
    for seed in range(args.seed_base, args.seed_base + args.seeds):
        cfg = variant_config(args.variant, arch=args.arch, ddpm_cond=True,
                             scan_steps=args.scan, seed=seed,
                             ddpm_schedule=args.schedule)
        t = Trainer(config=cfg, data=raw)
        t.train(steps=args.steps)
        params = t.state["ema"]
        y_cond = np.arange(args.n) % cfg.num_classes
        for w in args.scales:
            scfg = cfg.replace(ddpm_guidance=w)
            samples = spec.sample(params, jax.random.PRNGKey(7 + seed),
                                  args.n, scfg)
            scores = score_samples(clf, samples)
            scores["fid"] = fid_score(clf, real_ref, samples)
            scores["label_match"] = classifier_accuracy(clf, samples,
                                                        y_cond)
            row = {"guidance": w, "seed": seed,
                   **{k: round(float(v), 4) for k, v in scores.items()}}
            rows.append(row)
            print(json.dumps(row), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"{args.variant}_guidance.json")
    if args.merge and os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
        # replacement keys on (seed, scale) so a partial-scale rerun
        # updates only the cells it measured; legacy rows with no seed
        # field (the pre-round-5 format) are superseded and dropped
        fresh = {(r["seed"], r["guidance"]) for r in rows}
        rows = [r for r in old.get("rows", [])
                if "seed" in r
                and (r["seed"], r["guidance"]) not in fresh] + rows

    # per-scale seed ranges over every scale PRESENT in the merged
    # rows (not just this invocation's --scales) — what headline
    # claims must quote
    def _rng(w, key):
        vals = sorted(r[key] for r in rows if r["guidance"] == w)
        return [vals[0], vals[-1]]

    all_scales = sorted({r["guidance"] for r in rows})
    ranges = {str(w): {"fid_range": _rng(w, "fid"),
                       "is_range": _rng(w, "is_score"),
                       "label_match_range": _rng(w, "label_match")}
              for w in all_scales}
    out = {"config": {"variant": args.variant, "arch": args.arch,
                      "steps": args.steps, "schedule": args.schedule,
                      "n": args.n,
                      "seeds": len({r["seed"] for r in rows}),
                      "backend_alive": alive},
           "rows": rows,
           "ranges_by_scale": ranges}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
