"""Stitch per-epoch sample grids into training-progression GIFs.

The reference README embeds a GIF per model showing samples sharpening
over training (SURVEY.md §3.3). The gallery runs (benchmarks/gallery.py)
already drop `epochNNN.png` grids in runs/<variant>/; this script turns
each sequence into docs/gallery/<variant>_train.gif with the stdlib
GIF89a encoder (utils/gif.py) and patches the GIF row into each
docs/variants/<variant>.md.

Usage: python benchmarks/make_gifs.py [--runs runs --out docs/gallery]
Conv GIFs: python benchmarks/make_gifs.py --runs runs_conv --suffix _conv
(pairs with `gallery.py --arch conv`, which drops frames in runs_conv/).
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from generative_models_tpu.config import VARIANTS  # noqa: E402
from generative_models_tpu.utils.gif import (  # noqa: E402
    read_png_gray, write_gif_gray,
)

GIF_LINE = ("**Training progression** (one frame per epoch):\n\n"
            "![{v} training progression](../gallery/{v}_train.gif)\n")
GIF_LINE_CONV = ("**Conv training progression** (`--arch conv`, one "
                 "frame per epoch):\n\n"
                 "![{v} conv training progression]"
                 "(../gallery/{v}_conv_train.gif)\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", default="runs")
    ap.add_argument("--out", default="docs/gallery")
    ap.add_argument("--docs", default="docs/variants")
    ap.add_argument("--delay-cs", type=int, default=25)
    ap.add_argument("--suffix", default="",
                    help="output-name suffix, e.g. _conv for GIFs "
                         "stitched from a gallery.py --arch conv run")
    ap.add_argument("--max-frames", type=int, default=40,
                    help="subsample long runs to this many frames (>= 2)")
    ap.add_argument("--variants", nargs="*", default=None,
                    help="stitch only these variants (default: every "
                         "registered variant with frames) — partial "
                         "gallery runs must not re-stitch other "
                         "variants' GIFs from stale frames")
    args = ap.parse_args()
    if args.max_frames < 2:
        ap.error("--max-frames must be >= 2")
    unknown = set(args.variants or ()) - set(VARIANTS)
    if unknown:
        ap.error(f"unknown variants: {sorted(unknown)}")

    made = []
    for v in (args.variants or VARIANTS):
        paths = sorted(glob.glob(os.path.join(args.runs, v, "epoch*.png")))
        if len(paths) < 2:
            print(f"{v}: no epoch frames, skipped")
            continue
        # decode once; runs/ may mix grids from different configs
        # (sample_n), so keep the MAJORITY shape — one stray grid must
        # not poison the stitch (nor pick itself as the reference by
        # happening to sort last)
        frames = [read_png_gray(p) for p in paths]
        from collections import Counter
        keep, _ = Counter(f.shape for f in frames).most_common(1)[0]
        frames = [f for f in frames if f.shape == keep]
        if len(frames) < 2:
            print(f"{v}: no consistent frame shape, skipped")
            continue
        if len(frames) > args.max_frames:
            stride = (len(frames) - 1) / (args.max_frames - 1)
            frames = [frames[round(i * stride)]
                      for i in range(args.max_frames)]
        out = os.path.join(args.out, f"{v}{args.suffix}_train.gif")
        write_gif_gray(out, frames, delay_cs=args.delay_cs)
        made.append(v)
        print(f"{v}: {len(frames)} frames -> {out} "
              f"({os.path.getsize(out) // 1024} KB)")

        doc = os.path.join(args.docs, f"{v}.md")
        if os.path.exists(doc):
            if args.suffix and args.suffix != "_conv":
                continue  # unknown suffix: GIF written, no doc line
                #           (the plain GIF_LINE would point at a file
                #            this run never produced)
            text = open(doc).read()
            if args.suffix == "_conv":
                if f"{v}_conv_train.gif" not in text:
                    text = (text.rstrip() + "\n\n"
                            + GIF_LINE_CONV.format(v=v))
                    open(doc, "w").write(text)
                continue
            block = GIF_LINE.format(v=v)
            if f"{v}_train.gif" not in text:
                # insert before the samples/loss table if present,
                # else append
                m = re.search(r"^\|.*samples.*\|.*$", text, re.M)
                if m:
                    text = text[:m.start()] + block + "\n" + text[m.start():]
                else:
                    text = text.rstrip() + "\n\n" + block
                open(doc, "w").write(text)
    print(f"{len(made)}/{len(VARIANTS)} GIFs written")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
