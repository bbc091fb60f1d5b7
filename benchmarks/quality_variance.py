"""Seed-variance quantification for the quality tables.

The quality tables (docs/gallery.md) are one-seed measurements with a
noted caveat. This script re-runs selected variants at several seeds
and reports mean ± spread for IS and FID, so the headline claims carry
error bars instead of a disclaimer.

    python benchmarks/quality_variance.py [--variants cgan nsgan]
        [--arch conv] [--seeds 0 1 2] [--steps 6000]

Writes benchmarks/quality_variance.json (rows keyed variant+arch).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*", default=["cgan", "nsgan"])
    ap.add_argument("--arch", default="mlp", choices=("mlp", "conv"))
    ap.add_argument("--seeds", nargs="*", type=int, default=[0, 1, 2])
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--scan", type=int, default=1000)
    ap.add_argument("--n", type=int, default=2048)
    # spectral-rescue re-validation (VERDICT r1 #2: the 3-seed conv
    # rescues must reproduce under whatever sn_mode is the default)
    ap.add_argument("--spectral-projection", action="store_true")
    ap.add_argument("--sn-target", type=float, default=None)
    args = ap.parse_args()

    import numpy as np

    from generative_models_tpu.config import variant_config
    from generative_models_tpu.data.mnist import load_mnist, to_flat_float
    from generative_models_tpu.train.trainer import Trainer
    from generative_models_tpu.utils.quality import (
        fid_score, score_samples, train_classifier,
    )

    raw = load_mnist(allow_synthetic=True, synthetic_sizes=(12000, 2000))
    flat = to_flat_float(raw)
    clf = train_classifier(flat["x_train"], flat["y_train"])
    real_ref = flat["x_test"][:args.n]

    rows = []
    for variant in args.variants:
        per_seed = []
        for seed in args.seeds:
            extra = {}
            if args.spectral_projection:
                extra["spectral_projection"] = True
            if args.sn_target is not None:
                extra["sn_target"] = args.sn_target
            cfg = variant_config(variant, scan_steps=args.scan, seed=seed,
                                 arch=args.arch, **extra)
            t = Trainer(config=cfg, data=raw)
            t.train(steps=args.steps, sample_every=-1)
            s = t.sample(args.n)
            sc = score_samples(clf, s)
            sc["fid"] = fid_score(clf, real_ref, s)
            per_seed.append(sc)
            print(json.dumps({"variant": variant, "arch": args.arch,
                              "seed": seed,
                              **{k: round(v, 4) for k, v in sc.items()}}),
                  flush=True)
        row = {"variant": variant, "arch": args.arch, "steps": args.steps,
               "seeds": args.seeds}
        # record the constraint actually in effect (explicit flag OR an
        # arch-conditional override like began-conv's), and which sigma
        # estimator produced it — so rescue rows are self-describing
        if cfg.spectral_projection:
            row["spectral"] = {"sn_target": cfg.sn_target,
                               "sn_mode": cfg.sn_mode}
        for key in ("is_score", "fid"):
            vals = np.array([s[key] for s in per_seed])
            row[key + "_mean"] = round(float(vals.mean()), 4)
            row[key + "_min"] = round(float(vals.min()), 4)
            row[key + "_max"] = round(float(vals.max()), 4)
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "quality_variance.json")
    existing = []
    if os.path.isfile(out):
        with open(out) as f:
            data = json.load(f)
        # accept the pre-schema-fix bare-list form too
        existing = data["rows"] if isinstance(data, dict) else data
    def key(r):
        # explicit-spectral rows live beside, not over, the plain rows.
        # Exception: a spectral row that IS the variant's shipped
        # arch=conv default (CONV_VARIANT_OVERRIDES) replaces the plain
        # row — any OTHER sn_target lives beside it (ADVICE r2: keying
        # all began spectral rows to None would let a future explicit
        # re-validation at a different target silently replace the
        # default row).
        from generative_models_tpu.config import CONV_VARIANT_OVERRIDES
        sp = r.get("spectral")
        if not sp:
            return (r["variant"], r.get("arch", "mlp"), None)
        ov = (CONV_VARIANT_OVERRIDES.get(r["variant"], {})
              if r.get("arch", "mlp") == "conv" else {})
        is_shipped_default = (ov.get("spectral_projection")
                              and ov.get("sn_target") == sp["sn_target"])
        return (r["variant"], r.get("arch", "mlp"),
                None if is_shipped_default else sp["sn_target"])

    merged = {key(r): r for r in existing}
    merged.update({key(r): r for r in rows})
    with open(out, "w") as f:
        # same {"rows": [...]} envelope as the sibling quality files
        # (gallery.py's _load_rows convention)
        json.dump({"rows": sorted(merged.values(),
                                  key=lambda r: (r["variant"], r["arch"],
                                                 str(r.get("spectral"))))},
                  f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
