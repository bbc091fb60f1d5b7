"""Generate the README-gallery equivalent: train every variant on the
attached chip, save a sample grid + loss curve per variant under
docs/gallery/, and (re)write docs/gallery.md — the full page: the
two-budget quality table (from the quality_sweep JSONs when present),
the dataset-provenance notice, and a per-variant row with samples,
losses, and the training-progression GIF (when make_gifs.py has run).

    python benchmarks/gallery.py [--steps N] [--variants a b ...]
    python benchmarks/gallery.py --md-only     # rewrite the md from
                                               # existing artifacts only

A hand-written analysis paragraph survives regeneration: anything
between `<!-- analysis -->` and `<!-- /analysis -->` in the existing
docs/gallery.md is carried over verbatim (update it by hand when the
numbers move).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GALLERY_DIR = os.path.join("docs", "gallery")
GALLERY_MD = os.path.join("docs", "gallery.md")
# provenance sidecar: which step budget the committed artifacts were
# actually trained for, so --md-only never stamps the page with a
# step count the images don't match
META_PATH = os.path.join(GALLERY_DIR, "_meta.json")

DATA_NOTICE = """\
> **⚠ Dataset: synthetic stand-in, NOT MNIST.** Every image below was
> trained on the deterministic procedural seven-segment digit dataset
> (`data/mnist.py::synthetic_mnist`) because this sandbox has no network
> egress and no MNIST on disk. The loaders check `data/mnist.npz`, the
> keras cache (`~/.keras/datasets/mnist.npz`), and torchvision IDX
> layouts (`data/MNIST/raw/`) before falling back, so placing real MNIST
> at any of those paths and rerunning `benchmarks/gallery.py`
> regenerates everything on the real dataset with no code change.
"""


def _load_rows(path):
    if not os.path.isfile(path):
        return {}
    with open(path) as f:
        return {r["variant"]: r for r in json.load(f)["rows"]}


def quality_section() -> str:
    """The two-budget quality table, rendered from the sweep JSONs
    (benchmarks/quality_sweep.py). Empty string if no results exist."""
    rows20 = _load_rows(os.path.join("benchmarks", "quality_results.json"))
    rows6 = _load_rows(os.path.join("benchmarks", "quality_results_6k.json"))
    if not rows20:
        return ""
    label = {"fgan": "fgan (JS)", "REAL-DATA": "REAL-DATA (ceiling)"}
    order = sorted(rows20, key=lambda v: (v != "REAL-DATA",
                                          -rows20[v]["is_score"]))
    # bold the ceiling and the best variant (guard: either may be absent
    # in a trimmed/hand-edited results file)
    bold = {v for v in order[:1] if v == "REAL-DATA"}
    bold |= set([v for v in order if v != "REAL-DATA"][:1])
    lines = [
        "## Quantitative sample quality (the reference had only visual "
        "grids)",
        "",
        "Classifier-based IS-style scores at two training budgets (6k and",
        "the gallery's 20k steps), 2048 samples per variant",
        "(`python benchmarks/quality_sweep.py --steps N`; scorer:",
        "`utils/quality.py`, a held-out MLP classifier on this dataset).",
        "`confidence` = sharpness (mean max class prob), `class_entropy` =",
        "diversity (ln 10 ≈ 2.303 is uniform), `is_score` =",
        "exp(E[KL(p(y|x)‖p(y))]) with the zoo classifier standing in for",
        "Inception. `FID` = Fréchet distance in the same classifier's",
        "hidden feature space vs the real test split (lower is better;",
        "the REAL-DATA row shows the train-vs-test floor of the metric).",
        "Mode collapse = high confidence + low entropy.",
        "",
        "| variant | IS @6k steps | IS @20k steps | FID @20k "
        "| confidence @20k | class_entropy @20k |",
        "|---|---|---|---|---|---|",
    ]
    for v in order:
        r = rows20[v]
        is6 = rows6.get(v, {}).get("is_score", "—")
        score = f"**{r['is_score']}**" if v in bold else f"{r['is_score']}"
        lines.append(
            f"| {label.get(v, v)} | {is6} | {score} | {r.get('fid', '—')} "
            f"| {r['confidence']} | {r['class_entropy']} |")
    lines += [
        "",
        "Regenerate either column:",
        "`python benchmarks/quality_sweep.py --steps 20000` (the default",
        "output file backs this table) or",
        "`--steps 6000 --out benchmarks/quality_results_6k.json` (the 6k",
        "column) — pass `--out` so budgets don't clobber each other.",
        "",
    ]
    return "\n".join(lines)


def conv_quality_section() -> str:
    """Conv-vs-MLP architecture comparison at the 6k budget, rendered
    from quality_results_conv.json (`quality_sweep.py --arch conv`).
    Empty string if no conv results exist."""
    conv = _load_rows(os.path.join("benchmarks", "quality_results_conv.json"))
    mlp6 = _load_rows(os.path.join("benchmarks", "quality_results_6k.json"))
    conv20 = _load_rows(os.path.join("benchmarks",
                                     "quality_results_conv_20k.json"))
    mlp20 = _load_rows(os.path.join("benchmarks", "quality_results.json"))
    conv = {v: r for v, r in conv.items() if v != "REAL-DATA"}
    if not conv:
        return ""
    label = {"fgan": "fgan (JS)"}
    order = sorted(conv, key=lambda v: -(
        conv20.get(v, conv[v])["is_score"] if conv20 else
        conv[v]["is_score"]))
    lines = [
        "## Architecture comparison: `--arch conv` (DCGAN-style) vs the "
        "MLP stack",
        "",
        "Same loss heads, same registry hyperparameters, same budgets",
        "and scorer — only `Config.arch` differs "
        "(models/conv.py; docs/design.md §8).",
        "",
    ]
    def _have(kind):
        return any(os.path.isfile(
            os.path.join(GALLERY_DIR, f"{v}_conv_{kind}.png"))
            for v in conv)

    has_grids, has_losses = _have("samples"), _have("loss")
    has20 = bool(conv20)
    head = "| variant | IS conv @6k | IS mlp @6k | FID conv @6k | FID mlp @6k |"
    sep = "|---|---|---|---|---|"
    if has20:
        head = ("| variant | IS conv @6k | IS conv @20k | IS mlp @20k "
                "| FID conv @20k | FID mlp @20k |")
        sep = "|---|---|---|---|---|---|"
    if has_grids:
        head += " conv samples |"
        sep += "---|"
    if has_losses:
        head += " conv losses |"
        sep += "---|"
    lines += [head, sep]
    for v in order:
        c, m = conv[v], mlp6.get(v, {})
        if has20:
            c20, m20 = conv20.get(v, {}), mlp20.get(v, {})
            row = (f"| {label.get(v, v)} | {c['is_score']} "
                   f"| {c20.get('is_score', '—')} "
                   f"| {m20.get('is_score', '—')} "
                   f"| {c20.get('fid', '—')} | {m20.get('fid', '—')} |")
        else:
            row = (f"| {label.get(v, v)} | {c['is_score']} "
                   f"| {m.get('is_score', '—')} | {c.get('fid', '—')} "
                   f"| {m.get('fid', '—')} |")
        for kind, on in (("samples", has_grids), ("loss", has_losses)):
            if on:
                png = f"{v}_conv_{kind}.png"
                row += (f" ![{v} conv {kind}](gallery/{png}) |"
                        if os.path.isfile(os.path.join(GALLERY_DIR, png))
                        else " — |")
        lines.append(row)
    lines += [
        "",
        "Regenerate: `python benchmarks/quality_sweep.py --steps 6000 "
        "--arch conv` (6k column / default conv file)"
        + ("; the 20k columns come from `--steps 20000 --arch conv "
           "--out benchmarks/quality_results_conv_20k.json` and the "
           "MLP-20k sweep (`--steps 20000`)." if has20 else "."),
        "",
    ]
    return "\n".join(lines)


def _carried_analysis() -> str:
    if not os.path.isfile(GALLERY_MD):
        return ""
    m = re.search(r"<!-- analysis -->.*?<!-- /analysis -->",
                  open(GALLERY_MD).read(), re.S)
    return (m.group(0) + "\n\n") if m else ""


def write_gallery_md(steps: int, variants) -> None:
    parts = ["# Gallery\n"]
    q = quality_section()
    if q:
        parts.append(q)
    cq = conv_quality_section()
    if cq:
        parts.append(cq)
    parts.append(_carried_analysis())
    parts.append(
        f"Samples and loss curves after {steps} steps per variant "
        "(batch 100, registry hyperparameters, one TPU v5lite chip). "
        "Regenerate with `python benchmarks/gallery.py`.\n")
    parts.append(DATA_NOTICE)
    have_gifs = any(
        os.path.isfile(os.path.join(GALLERY_DIR, f"{v}_train.gif"))
        for v in variants)
    head = "| variant | samples | losses |"
    sep = "|---|---|---|"
    if have_gifs:
        head += " training progression |"
        sep += "---|"
    rows = [head, sep]
    for v in sorted(variants):
        # a variant with no sample grid yet (newly registered, or a
        # partial --variants run) gets no row at all — never a broken
        # image link on the published page
        if not os.path.isfile(
                os.path.join(GALLERY_DIR, f"{v}_samples.png")):
            continue
        cells = [f"![{v}](gallery/{v}_samples.png)"]
        cells.append(
            f"![{v} loss](gallery/{v}_loss.png)"
            if os.path.isfile(os.path.join(GALLERY_DIR, f"{v}_loss.png"))
            else "—")
        if have_gifs:
            gif = f"{v}_train.gif"
            cells.append(
                f"![{v} training](gallery/{gif})"
                if os.path.isfile(os.path.join(GALLERY_DIR, gif))
                else "—")
        rows.append(f"| {v} | " + " | ".join(cells) + " |")
    parts.append("\n".join(rows) + "\n")
    with open(GALLERY_MD, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {GALLERY_MD}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--variants", nargs="*", default=None)
    ap.add_argument("--md-only", action="store_true",
                    help="rewrite docs/gallery.md from existing "
                         "artifacts without training")
    ap.add_argument("--arch", default="mlp", choices=("mlp", "conv"),
                    help="conv trains the requested variants with "
                         "--arch conv and writes <v>_conv_samples.png "
                         "grids (embedded in the architecture-"
                         "comparison section); the main table stays "
                         "the MLP reference-parity stack")
    args = ap.parse_args()

    if not args.md_only:
        # training run: probe the backend (honors GRAFT_REQUIRE_LIVE so
        # the chip queue never renders gallery artifacts on the CPU pin)
        from __graft_entry__ import ensure_live_backend
        ensure_live_backend()

    from generative_models_tpu.losses.registry import available_variants

    variants = args.variants or available_variants()
    md_steps = args.steps

    if args.md_only:
        # the artifacts on disk set the step count, not the CLI default
        if os.path.isfile(META_PATH):
            with open(META_PATH) as f:
                md_steps = json.load(f)["steps"]
    else:
        from generative_models_tpu.config import variant_config
        from generative_models_tpu.data.mnist import load_mnist
        from generative_models_tpu.train.trainer import Trainer
        from generative_models_tpu.utils.viz import (
            plot_losses, save_image_grid,
        )

        data = load_mnist(allow_synthetic=True,
                          synthetic_sizes=(12000, 1000))
        os.makedirs(GALLERY_DIR, exist_ok=True)
        suffix = "_conv" if args.arch == "conv" else ""
        for variant in variants:
            # conv runs keep their per-epoch frames in runs_conv/ so
            # make_gifs --suffix _conv can stitch conv GIFs without
            # clobbering the MLP runs/ frames
            cfg = variant_config(variant, batch_size=100,
                                 scan_steps=1000, seed=0, arch=args.arch,
                                 out_dir="runs_conv" if suffix else "runs")
            t = Trainer(config=cfg, data=data)
            t.train(steps=args.steps)
            grid = save_image_grid(
                os.path.join(GALLERY_DIR, f"{variant}{suffix}_samples.png"),
                t.sample(64))
            plot_losses(
                os.path.join(GALLERY_DIR, f"{variant}{suffix}_loss.png"),
                t.history)
            print(f"{variant}: {grid}", flush=True)
        if not args.variants and args.arch == "mlp":
            # a full MLP run defines the page's provenance
            with open(META_PATH, "w") as f:
                json.dump({"steps": args.steps}, f)
        elif os.path.isfile(META_PATH):
            # partial or conv run: the page's step caption must keep
            # describing the committed MLP artifacts, not this run
            with open(META_PATH) as f:
                md_steps = json.load(f)["steps"]

    # the page always lists every registered variant; rows without
    # artifacts on disk are skipped inside write_gallery_md
    write_gallery_md(md_steps, available_variants())


if __name__ == "__main__":
    main()
