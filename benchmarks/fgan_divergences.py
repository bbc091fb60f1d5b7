#!/usr/bin/env python
"""f-GAN divergence-family quality sweep: every registered
(g_f, f*) pair x {saturating, nonsaturating} G objective, conv arch.

Nowozin 2016 §3.2 motivates the non-saturating alternative exactly for
the bounded conjugates (total_variation, squared_hellinger) whose
saturating G gradient dies once D wins — the round-1 saturating-only
sweep (benchmarks/fgan_divergences_conv.json) measured those two
collapsing (IS ~2.1, FID 488/1280) while every unbounded conjugate
trained. This script runs BOTH G objectives per divergence in one
session so the comparison is same-classifier/same-seed, and rewrites
fgan_divergences_conv.json with a g_loss column.

    python benchmarks/fgan_divergences.py [--steps 6000] [--n 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--scan", type=int, default=1000)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--arch", default="conv", choices=("mlp", "conv"))
    ap.add_argument("--divergences", nargs="*", default=None)
    args = ap.parse_args()

    from generative_models_tpu.config import variant_config
    from generative_models_tpu.data.mnist import load_mnist, to_flat_float
    from generative_models_tpu.losses.fgan import DIVERGENCES
    from generative_models_tpu.train.trainer import Trainer
    from generative_models_tpu.utils.quality import (
        classifier_accuracy, fid_score, score_samples, train_classifier,
    )

    raw = load_mnist(allow_synthetic=True, synthetic_sizes=(12000, 2000))
    flat = to_flat_float(raw)
    clf = train_classifier(flat["x_train"], flat["y_train"])
    acc = classifier_accuracy(clf, flat["x_test"], flat["y_test"])
    real_ref = flat["x_test"][:args.n]
    print(json.dumps({"classifier_test_acc": round(acc, 4)}), flush=True)

    rows = []
    for div in (args.divergences or list(DIVERGENCES)):
        for g_loss in ("saturating", "nonsaturating"):
            cfg = variant_config(
                "fgan", scan_steps=args.scan, seed=0, arch=args.arch,
                fgan_divergence=div, fgan_g_loss=g_loss)
            t = Trainer(config=cfg, data=raw)
            t.train(steps=args.steps)
            samples = t.sample(args.n)
            scores = score_samples(clf, samples)
            scores["fid"] = fid_score(clf, real_ref, samples)
            row = {"divergence": div, "g_loss": g_loss,
                   **{k: round(v, 4) for k, v in scores.items()}}
            rows.append(row)
            print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"fgan_divergences_{args.arch}.json")
    with open(out, "w") as f:
        json.dump({"steps": args.steps, "arch": args.arch,
                   "classifier_test_acc": round(acc, 4),
                   "rows": rows}, f, indent=1)

    print("\n| divergence | G objective | IS (10-way) | FID |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['divergence']} | {r['g_loss']} | {r['is_score']} "
              f"| {r['fid']} |")


if __name__ == "__main__":
    main()
