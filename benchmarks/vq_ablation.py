#!/usr/bin/env python
"""VQ family ablation (round 4): make the discrete-latent pipeline's
design choices measured. Three modes scored on the same classifier
(IS/FID, utils/quality.py):

- "uniform_codes": the vqvae variant's stage-1 sampler (decode uniform
  random token grids) — the no-prior baseline that shows WHY a latent
  prior is needed.
- "joint": the vqprior default — tokenizer + prior under one optimizer
  for the full budget.
- "two_stage": Oord 2017 §3.3's protocol — vqvae for half the budget,
  then a frozen-tokenizer prior run for the other half (same total
  step count as joint; the fairness axis).

plus the AR sampling-temperature dial on each trained prior, and
`--seeds` re-runs of the winning (mode, temp) row.

    python benchmarks/vq_ablation.py [--arch conv] [--budget 20000]
        [--temps 0.7 1.0 1.3] [--seeds 3]

Writes benchmarks/vq_ablation.json (read by docs/gallery.md's analysis
and BASELINE.md's VQ section).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="conv", choices=("mlp", "conv"))
    ap.add_argument("--budget", type=int, default=20000)
    ap.add_argument("--temps", nargs="*", type=float,
                    default=[0.7, 1.0, 1.3])
    ap.add_argument("--scan", type=int, default=1000)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--gallery-dir", default=None, metavar="DIR")
    ap.add_argument("--conditional-only", action="store_true",
                    help="skip the full ablation: load the committed "
                         "vq_ablation.json, train/score the "
                         "joint_conditional row at the seeds it is "
                         "missing (up to --seeds), and add "
                         "conditional_* range fields — the headline "
                         "'best generative FID in the zoo' claim gets "
                         "the 3-seed treatment without re-running the "
                         "whole grid")
    args = ap.parse_args()

    from __graft_entry__ import ensure_live_backend
    alive = ensure_live_backend()

    import jax
    import numpy as np

    from generative_models_tpu.config import variant_config
    from generative_models_tpu.data.mnist import load_mnist, to_flat_float
    from generative_models_tpu.losses.vqprior import sample as vq_sample
    from generative_models_tpu.losses.vqvae import (
        VQVAE,
        reconstruct,
    )
    from generative_models_tpu.train.trainer import Trainer
    from generative_models_tpu.train.vq import init_prior_with_vqvae
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

    rows = []

    def score(samples, **tags):
        sc = score_samples(clf, samples)
        sc["fid"] = fid_score(clf, real_ref, samples)
        row = {**tags, **{k: round(float(v), 4) for k, v in sc.items()}}
        rows.append(row)
        print(json.dumps(row), flush=True)
        return row

    def train_modes(seed, temps):
        """One (joint, two_stage) pair at this seed; returns their
        scored rows over the temperature grid."""
        out = []
        # --- joint -----------------------------------------------------
        jcfg = variant_config("vqprior", arch=args.arch, seed=seed,
                              scan_steps=args.scan)
        jt = Trainer(config=jcfg, data=raw)
        jt.train(steps=args.budget, sample_every=-1)
        for temp in temps:
            s = vq_sample(jt.state["params"], jax.random.PRNGKey(7),
                          args.n, jcfg.replace(vq_prior_temp=temp))
            out.append(score(np.asarray(s), mode="joint", temp=temp,
                             budget=args.budget, seed=seed))
        # --- two-stage (half + half = same total step count) -----------
        vcfg = variant_config("vqvae", arch=args.arch, seed=seed,
                              scan_steps=args.scan)
        vt = Trainer(config=vcfg, data=raw)
        vt.train(steps=args.budget // 2, sample_every=-1)
        if seed == 0:
            # stage-1 diagnostics, once: uniform-code decode + recon FID
            uni = VQVAE.sample(vt.state["params"], jax.random.PRNGKey(7),
                               args.n, vcfg)
            score(np.asarray(uni), mode="uniform_codes",
                  budget=args.budget // 2, seed=seed)
            rec = reconstruct(vt.state["params"],
                              jax.numpy.asarray(real_ref),
                              jax.random.PRNGKey(0), vcfg)
            score(np.asarray(rec), mode="reconstruction",
                  budget=args.budget // 2, seed=seed)
        pcfg = variant_config("vqprior", arch=args.arch, seed=seed,
                              scan_steps=args.scan,
                              vq_freeze_tokenizer=True)
        pt = Trainer(config=pcfg, data=raw)
        init_prior_with_vqvae(pt, vt.state["params"])
        pt.train(steps=args.budget - args.budget // 2, sample_every=-1)
        for temp in temps:
            s = vq_sample(pt.state["params"], jax.random.PRNGKey(7),
                          args.n, pcfg.replace(vq_prior_temp=temp))
            out.append(score(np.asarray(s), mode="two_stage", temp=temp,
                             budget=args.budget, seed=seed))
        if args.gallery_dir and seed == 0:
            from generative_models_tpu.utils.viz import save_image_grid
            for name, tr, c in (("joint", jt, jcfg), ("two_stage", pt,
                                                      pcfg)):
                imgs = vq_sample(tr.state["params"], jax.random.PRNGKey(9),
                                 64, c)
                p = os.path.join(args.gallery_dir, f"vq_{name}.png")
                save_image_grid(p, np.asarray(imgs))
                print("wrote", p, flush=True)
        return out

    # conditional row (the CGAN-story check): joint conditional prior,
    # scored + label_match (classifier top-1 agreement with the
    # conditioning label — the ddpm_guidance ablation's diagnostic)
    def conditional_row(seed, temp):
        ccfg = variant_config("vqprior", arch=args.arch, seed=seed,
                              scan_steps=args.scan, ddpm_cond=True)
        ct = Trainer(config=ccfg, data=raw)
        ct.train(steps=args.budget, sample_every=-1)
        cs = vq_sample(ct.state["params"], jax.random.PRNGKey(7 + seed),
                       args.n, ccfg.replace(vq_prior_temp=temp))
        y_cond = np.arange(args.n) % ccfg.num_classes
        crow = score(np.asarray(cs), mode="joint_conditional",
                     temp=temp, budget=args.budget, seed=seed)
        crow["label_match"] = round(float(
            classifier_accuracy(clf, np.asarray(cs), y_cond)), 4)
        print(json.dumps(crow), flush=True)
        return crow

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "vq_ablation.json")

    if args.conditional_only:
        with open(out_path) as f:
            out = json.load(f)
        rows.extend(out["rows"])
        cond_temps = [r["temp"] for r in rows
                      if r["mode"] == "joint_conditional"]
        if not cond_temps:
            raise SystemExit(
                "--conditional-only needs an existing joint_conditional "
                "row in vq_ablation.json to reuse its temperature; run "
                "the full ablation first (refuse-with-reason, not a "
                "bare StopIteration after the classifier preamble)")
        temp = cond_temps[0]
        have = {r["seed"] for r in rows
                if r["mode"] == "joint_conditional"}
        for seed in range(args.seeds):
            if seed not in have:
                conditional_row(seed, temp)
        cond = [r for r in rows if r["mode"] == "joint_conditional"]
        out["rows"] = rows

        def _rng(key):
            vals = sorted(r[key] for r in cond)
            return [vals[0], vals[-1]]

        out["conditional_fid_range"] = _rng("fid")
        out["conditional_is_range"] = _rng("is_score")
        out["conditional_label_match_range"] = _rng("label_match")
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", out_path)
        return

    first = train_modes(seed=0, temps=args.temps)
    winner = min(first, key=lambda r: r["fid"])
    print(json.dumps({"winner": winner}), flush=True)

    conditional_row(0, winner["temp"])

    # seed spread on the winning (mode, temp) config
    seed_rows = [winner]
    for seed in range(1, args.seeds):
        res = train_modes(seed=seed, temps=[winner["temp"]])
        seed_rows.extend(r for r in res if r["mode"] == winner["mode"])

    fids = sorted(r["fid"] for r in seed_rows)
    out = {
        "config": {"arch": args.arch, "budget": args.budget,
                   "n": args.n, "backend_alive": alive},
        "rows": rows,
        "winner": {k: winner[k] for k in ("mode", "temp")},
        "winner_fid_range": [fids[0], fids[-1]],
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "vq_ablation.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
