"""Per-variant sample-quality sweep — quantitative quality scores the
reference never had (its quality story is visual grids only, SURVEY.md
§7). Trains each variant for --steps, scores --n generated samples with
the classifier-based IS-style metrics (utils/quality.py), and writes
benchmarks/quality_results.json + a markdown table.

    python benchmarks/quality_sweep.py [--steps 5000] [--n 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--scan", type=int, default=1000)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--variants", nargs="*", default=None)
    ap.add_argument("--arch", default="mlp", choices=("mlp", "conv"),
                    help="architecture to sweep; conv writes to "
                         "quality_results_conv.json by default")
    ap.add_argument("--out", default=None,
                    help="output JSON path (default "
                         "quality_results.json next to this script); "
                         "use e.g. quality_results_6k.json so budgets "
                         "don't clobber each other")
    args = ap.parse_args()

    from __graft_entry__ import ensure_live_backend
    ensure_live_backend()

    from generative_models_tpu.config import variant_config
    from generative_models_tpu.data.mnist import load_mnist, to_flat_float
    from generative_models_tpu.losses.registry import available_variants
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

    # FID reference statistics: the test split; REAL-DATA's own FID is
    # train-vs-test (the irreducible floor of the metric on this data)
    real_ref = flat["x_test"][:args.n]
    real_scores = score_samples(clf, real_ref)
    real_scores["fid"] = fid_score(clf, real_ref,
                                   flat["x_train"][:args.n])
    results = [{"variant": "REAL-DATA",
                **{k: round(v, 4) for k, v in real_scores.items()}}]
    print(json.dumps(results[0]), flush=True)

    for variant in (args.variants or available_variants()):
        cfg = variant_config(variant, scan_steps=args.scan, seed=0,
                             arch=args.arch)
        t = Trainer(config=cfg, data=raw)
        t.train(steps=args.steps)
        samples = t.sample(args.n)
        scores = score_samples(clf, samples)
        scores["fid"] = fid_score(clf, real_ref, samples)
        row = {"variant": variant, "steps": args.steps,
               **({"arch": args.arch} if args.arch != "mlp" else {}),
               **{k: round(v, 4) for k, v in scores.items()}}
        results.append(row)
        print(json.dumps(row), flush=True)

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "quality_results.json" if args.arch == "mlp"
        else "quality_results_conv.json")
    if args.variants and os.path.isfile(out):
        # partial sweep: merge into the existing file by variant name
        # instead of clobbering the variants that didn't run
        with open(out) as f:
            old = {r["variant"]: r for r in json.load(f)["rows"]}
        old.update({r["variant"]: r for r in results})
        results = sorted(old.values(), key=lambda r: (
            r["variant"] != "REAL-DATA", r["variant"]))
    with open(out, "w") as f:
        json.dump({"classifier_test_acc": round(acc, 4),
                   "n_samples": args.n, "rows": results}, f, indent=1)

    print("\n| variant | confidence | class_entropy | IS (10-way) | FID |")
    print("|---|---|---|---|---|")
    for r in results:
        print(f"| {r['variant']} | {r['confidence']} "
              f"| {r['class_entropy']} | {r['is_score']} "
              f"| {r.get('fid', '—')} |")


if __name__ == "__main__":
    main()
