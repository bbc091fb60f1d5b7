"""Generate (and optionally execute) the annotated per-variant
notebooks — the reference ships `notebooks/<variant>.ipynb` with inline
derivations, loss curves, and sample grids (SURVEY.md §3.3); this
recreates that surface on top of the framework.

Each notebook = the variant's annotated derivation (docs/variants/) as
markdown + runnable cells: train, sample grid, loss curves, plus
variant extras (VAE reconstructions, CGAN/InfoGAN code-conditional
grids).

    python benchmarks/make_notebooks.py             # write notebooks/
    python benchmarks/make_notebooks.py --execute   # also run them
                                                    # (inline outputs)

Execution honors GMTPU_NB_STEPS (default 2000) so CI-style runs can use
short budgets; on a machine without the TPU set JAX_PLATFORMS=cpu.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import nbformat as nbf

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


SETUP = '''\
import os
os.chdir({root!r})

import numpy as np
import matplotlib.pyplot as plt

from generative_models_tpu.config import variant_config
from generative_models_tpu.train.trainer import Trainer

STEPS = int(os.environ.get("GMTPU_NB_STEPS", "2000"))
cfg = variant_config({variant!r}, scan_steps=min(500, STEPS), seed=0)
cfg'''

TRAIN = '''\
t = Trainer(config=cfg)
history = t.train(steps=STEPS, echo_every=0)
print(f"{{t.steps_done}} steps in {{t.wall_time:.2f}}s "
      f"= {{t.steps_done / t.wall_time:.0f}} steps/sec/chip")'''

GRID = '''\
def show_grid(imgs, title, n=64, cols=8):
    imgs = np.asarray(imgs)[:n].reshape(-1, 28, 28)
    rows = (len(imgs) + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(cols, rows))
    for ax, im in zip(axes.flat, imgs):
        ax.imshow(im, cmap="gray", vmin=0, vmax=1)
    for ax in axes.flat:
        ax.axis("off")
    fig.suptitle(title)
    plt.show()

show_grid(t.sample(64), f"{variant} samples after {{STEPS}} steps")'''

LOSSES = '''\
fig, ax = plt.subplots(figsize=(7, 3.5))
for k, v in history.items():
    if k.endswith("loss") and not k.startswith("val"):
        ax.plot(v, label=k, linewidth=0.8)
ax.set_xlabel("step"); ax.set_ylabel("loss"); ax.legend()
ax.set_title({variant!r} + " loss trajectories")
plt.show()'''

VAE_RECON = '''\
# Reconstructions: encode real digits, sample z ~ q(z|x), decode.
import jax
from generative_models_tpu.losses.vae import reconstruct

xs = np.asarray(t.x_test[:32])
recon = np.asarray(reconstruct(t.state["params"], xs,
                               jax.random.PRNGKey(1), cfg))
show_grid(np.concatenate([xs[:8], recon[:8], xs[8:16], recon[8:16]]),
          "top: input / below: reconstruction", n=32)'''

CGAN_COND = '''\
# Class-conditional sampling: one row per digit label.
import jax
from generative_models_tpu.losses.cgan import sample_class

rows = [np.asarray(sample_class(t.state["g_params"],
                                jax.random.PRNGKey(c), 8, c, cfg))
        for c in range(10)]
show_grid(np.concatenate(rows), "rows = conditioning label 0..9",
          n=80, cols=8)'''

INFOGAN_CODE = '''\
# Vary the categorical code c with z fixed: columns should become
# distinct modes (the MI bound at work).
import jax
import jax.numpy as jnp
from generative_models_tpu.models import nets

z = jnp.tile(jax.random.normal(jax.random.PRNGKey(0), (1, cfg.z_dim)),
             (cfg.info_cat_dim * 8, 1))
cat = jnp.arange(cfg.info_cat_dim * 8) % cfg.info_cat_dim
imgs = nets.infogan_g_apply(
    t.state["g_params"], z, jax.nn.one_hot(cat, cfg.info_cat_dim),
    jnp.zeros((len(cat), cfg.info_cont_dim)), cfg)
show_grid(np.asarray(imgs), "columns cycle the categorical code",
          n=80, cols=cfg.info_cat_dim)'''


DDPM_SAMPLERS = '''\
# One trained net, the whole sampler family (Song 2021): ancestral
# DDPM (eta=1, full T) is what show_grid above used; here the same
# weights sampled with a 20x cheaper strided deterministic DDIM chain
# (50 net evals instead of T=1000) — sampling cost is a free dial at
# inference time, no retraining.
import jax
from generative_models_tpu.losses.ddpm import sample as ddpm_sample

fast = ddpm_sample(t.state["ema"], jax.random.PRNGKey(2), 32,
                   cfg.replace(ddpm_sample_steps=50, ddpm_eta=0.0))
show_grid(np.asarray(fast), "50-step deterministic DDIM, same weights",
          n=32)'''


FLOW_SOLVERS = '''\
# One trained velocity net, the ODE-cost dial (Liu 2022 / Lipman
# 2023): show_grid above integrated 50 Euler steps; the same weights
# integrated with 8 steps (6x cheaper) and with the 2nd-order heun
# solver — sampling cost is a free inference-time dial, and the
# deterministic ODE tolerates small step counts far better than
# DDPM's stochastic ancestral chain.
import jax
from generative_models_tpu.losses.flow import sample as flow_sample

fast = flow_sample(t.state["ema"], jax.random.PRNGKey(2), 32,
                   cfg.replace(flow_sample_steps=8))
show_grid(np.asarray(fast), "8-step Euler, same weights", n=32)
heun = flow_sample(t.state["ema"], jax.random.PRNGKey(2), 32,
                   cfg.replace(flow_sample_steps=8, flow_solver="heun"))
show_grid(np.asarray(heun), "8-step Heun (2 evals/step), same weights",
          n=32)'''

VQVAE_RECON = '''\
# Stage-1 quality surface: reconstructions through the quantized
# bottleneck, plus codebook usage (perplexity: K = uniform usage).
import jax
from generative_models_tpu.losses.vqvae import reconstruct

xs = np.asarray(t.x_test[:32])
recon = np.asarray(reconstruct(t.state["params"], xs,
                               jax.random.PRNGKey(1), cfg))
show_grid(np.concatenate([xs[:8], recon[:8], xs[8:16], recon[8:16]]),
          "top: input / below: reconstruction (discrete bottleneck)",
          n=32)
print("codebook perplexity (last train chunk):",
      round(float(np.asarray(history["perplexity"])[-1]), 2),
      "of K =", cfg.vq_codebook_size)'''

VQPRIOR_TEMP = '''\
# The AR prior's free inference dial: sampling temperature. Lower
# temperatures sharpen the token distribution (more canonical digits,
# less diversity); higher flatten it toward the uniform-code decode
# the vqvae notebook shows.
import jax
from generative_models_tpu.losses.vqprior import sample as vq_sample

for temp in (0.7, 1.0, 1.3):
    imgs = vq_sample(t.state["params"], jax.random.PRNGKey(3), 32,
                     cfg.replace(vq_prior_temp=temp))
    show_grid(np.asarray(imgs), f"ancestral samples, temperature {temp}",
              n=32)'''

CONV_MD = '''\
# The second architecture: DCGAN-style conv stacks (`--arch conv`)

The reference zoo is MLP-only. This framework adds a convolutional
architecture (NHWC convs on the MXU, GroupNorm generator, norm-free
critic — `models/conv.py`, design notes in `docs/design.md` §8) that
every one of the 14 loss heads runs on unchanged, selected by ONE
config knob. Measured at identical hyperparameters it beats the MLP
stack on 11/14 variants; the structured-latent pair jumps a tier
(CGAN FID halves, InfoGAN IS 5.4→8.4 at 20k — full two-budget table in
`docs/gallery.md`).

This notebook shows the two showcase variants live: conditional CGAN
sampling and the InfoGAN categorical code sweep, both on conv.'''

CONV_SETUP = '''\
import os
os.chdir({root!r})

import numpy as np
import matplotlib.pyplot as plt

from generative_models_tpu.config import variant_config
from generative_models_tpu.train.trainer import Trainer

STEPS = int(os.environ.get("GMTPU_NB_STEPS", "2000"))
cfg = variant_config("cgan", arch="conv", scan_steps=min(500, STEPS),
                     seed=0)
cfg'''

CONV_INFOGAN = '''\
# InfoGAN on conv: sweep the 10-way categorical code with z fixed per
# row — a column consistently renders one digit identity (the MI bound
# binding code to class, learned without labels; the code->digit
# assignment is an arbitrary permutation).
import jax
import jax.numpy as jnp
from generative_models_tpu.models import nets

icfg = variant_config("infogan", arch="conv",
                      scan_steps=min(500, STEPS), seed=0)
it = Trainer(config=icfg)
it.train(steps=STEPS, echo_every=0)
rows = 8
z = jnp.repeat(jax.random.normal(jax.random.PRNGKey(0),
                                 (rows, 1, icfg.z_dim)),
               icfg.info_cat_dim, axis=1).reshape(-1, icfg.z_dim)
cat = jnp.tile(jnp.arange(icfg.info_cat_dim), (rows,))
imgs = nets.infogan_g_apply(
    it.generator_params, z, jax.nn.one_hot(cat, icfg.info_cat_dim),
    jnp.zeros((len(cat), icfg.info_cont_dim)), icfg)
show_grid(np.asarray(imgs), "columns sweep the categorical code",
          n=80, cols=icfg.info_cat_dim)'''


def build_conv_showcase() -> nbf.NotebookNode:
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "name": "python3", "display_name": "Python 3", "language": "python"}
    nb.cells = [
        nbf.v4.new_markdown_cell(CONV_MD),
        nbf.v4.new_code_cell(CONV_SETUP.format(root=ROOT)),
        nbf.v4.new_code_cell(TRAIN),
        nbf.v4.new_code_cell(GRID.replace("{variant}", "cgan (conv)")),
        nbf.v4.new_code_cell(CGAN_COND),
        nbf.v4.new_code_cell(CONV_INFOGAN),
    ]
    return nb


def doc_markdown(variant: str) -> str:
    path = os.path.join(ROOT, "docs", "variants", f"{variant}.md")
    with open(path) as f:
        text = f.read()
    # strip the static Results section — the notebook produces live
    # outputs instead
    text = re.split(r"\n## Results \(", text)[0].rstrip()
    return text + (
        "\n\n---\n*This notebook trains live below. Dataset: real MNIST "
        "if found on disk, else the deterministic procedural stand-in "
        "(see `data/mnist.py`).*")


def build_notebook(variant: str) -> nbf.NotebookNode:
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "name": "python3", "display_name": "Python 3", "language": "python"}
    cells = [
        nbf.v4.new_markdown_cell(doc_markdown(variant)),
        nbf.v4.new_code_cell(SETUP.format(root=ROOT, variant=variant)),
        nbf.v4.new_code_cell(TRAIN),
        nbf.v4.new_code_cell(GRID.replace("{variant}", variant)),
        nbf.v4.new_code_cell(LOSSES.replace("{variant!r}", repr(variant))),
    ]
    if variant == "vae":
        cells.append(nbf.v4.new_code_cell(VAE_RECON))
    if variant == "cgan":
        cells.append(nbf.v4.new_code_cell(CGAN_COND))
    if variant == "infogan":
        cells.append(nbf.v4.new_code_cell(INFOGAN_CODE))
    if variant == "ddpm":
        cells.append(nbf.v4.new_code_cell(DDPM_SAMPLERS))
    if variant == "flow":
        cells.append(nbf.v4.new_code_cell(FLOW_SOLVERS))
    if variant == "vqvae":
        cells.append(nbf.v4.new_code_cell(VQVAE_RECON))
    if variant == "vqprior":
        cells.append(nbf.v4.new_code_cell(VQPRIOR_TEMP))
    nb.cells = cells
    return nb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execute", action="store_true")
    ap.add_argument("--variants", nargs="*", default=None)
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()

    from generative_models_tpu.config import VARIANTS
    out_dir = os.path.join(ROOT, "notebooks")
    os.makedirs(out_dir, exist_ok=True)

    requested = args.variants or list(VARIANTS) + ["conv_showcase"]
    for variant in requested:
        nb = (build_conv_showcase() if variant == "conv_showcase"
              else build_notebook(variant))
        path = os.path.join(out_dir, f"{variant}.ipynb")
        if args.execute:
            from nbclient import NotebookClient
            NotebookClient(nb, timeout=args.timeout,
                           kernel_name="python3").execute()
        nbf.write(nb, path)
        print(("executed " if args.execute else "wrote    ") + path,
              flush=True)


if __name__ == "__main__":
    main()
