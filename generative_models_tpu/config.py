"""Central configuration for every variant.

The reference keeps hyperparameters inline in each of its per-variant files
(`src/<variant>.py`, reference layout per SURVEY.md §3.2 — mount empty, so
unverifiable this round). All defaults that are *recalled* rather than
paper-pinned carry a `TO-VERIFY` comment; fixing them against a future
reference mount is a one-file diff, by design (SURVEY.md §8).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple


@dataclasses.dataclass
class Config:
    """Hyperparameters shared by every variant, with per-variant overrides.

    Paper-pinned values cite the paper; recalled reference values are
    marked TO-VERIFY (SURVEY.md §8).
    """

    variant: str = "nsgan"

    # --- data ---------------------------------------------------------
    batch_size: int = 100          # TO-VERIFY vs reference (SURVEY §8: R-med)
    image_dim: int = 784           # 28x28 MNIST, flattened in the trainer
    num_classes: int = 10
    dataset: str = "mnist"         # "mnist" | "synthetic"
    data_dir: str = "data"
    # Validation rows carved deterministically off the END of the train
    # split (the reference Trainer takes (train, val, test) iterators,
    # SURVEY §2.1; torchvision MNIST has no val split, so it comes out
    # of train). 0 keeps the full train split (round-1 behavior).
    val_size: int = 0
    # HBM-resident dtype of the train split. "uint8" keeps the raw
    # bytes resident and decodes AFTER the per-step gather with the
    # same multiply the host conversion uses — trajectories stay
    # bit-identical (tests/test_data.py). 4x smaller resident split and
    # gather read traffic; measured NEUTRAL on throughput at batch 100
    # (35.2k vs 35.5k steps/s — the gather is op-bound, not
    # bandwidth-bound, at this scale), so the default stays float32 and
    # "uint8" is the footprint knob. Requires uint8 source images (real
    # MNIST and the synthetic stand-in both are).
    data_storage: str = "float32"  # "float32" | "uint8"

    # --- model --------------------------------------------------------
    # Shared architecture the whole loss-head zoo runs on. "mlp" is the
    # reference-parity stack (SURVEY §3.2 common scaffolding; all parity
    # oracles/trajectory tests target it). "conv" swaps in DCGAN-style
    # conv stacks (models/conv.py) behind the same flat-tensor
    # signatures — a capability beyond the reference, NHWC convs on the
    # MXU; measured quality comparison in docs/gallery.md.
    arch: str = "mlp"              # "mlp" | "conv"
    conv_channels: int = 64        # C of the conv stacks (G: 2C->C->1)
    z_dim: int = 128               # TO-VERIFY (R-low; some repos use 100)
    hidden_dim: int = 400          # TO-VERIFY (R-low; 256-400 range)
    g_hidden_act: str = "relu"     # TO-VERIFY
    d_hidden_act: str = "leaky_relu"  # TO-VERIFY; slope 0.2 is GAN-standard
    leaky_slope: float = 0.2

    # VAE family
    latent_dim: int = 20           # Kingma & Welling 2013 MNIST setup
    vae_hidden_dim: int = 400      # TO-VERIFY (R-med)

    # --- optimization ---------------------------------------------------
    g_lr: float = 2e-4             # TO-VERIFY (R-med)
    d_lr: float = 2e-4             # TO-VERIFY (R-med)
    optimizer: str = "adam"        # "adam" | "rmsprop"
    adam_b1: float = 0.9           # torch Adam defaults unless overridden
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    d_steps: int = 1               # critic steps per generator step

    # --- variant-specific mechanisms (paper-pinned unless noted) --------
    # Exponential moving average of the generator/model weights,
    # updated once per train step in-trace and used for sampling,
    # export, and quality scoring when enabled (0 = off, the
    # reference-parity default; 0.999 is the common GAN setting —
    # Yazıcı & al. 2019 "The Unusual Effectiveness of Averaging in GAN
    # Training"). Training math is untouched: the EMA never feeds back
    # into gradients.
    ema_decay: float = 0.0
    # Spectral weight projection on the critic (ops/spectral.py):
    # after every critic update, project each weight matrix onto the
    # sigma <= sn_target ball (power iteration, deterministic start,
    # in-trace). Composable with every variant through the same d_post
    # slot WGAN's clip uses. OFF by default (reference parity);
    # measured motivation and ablation in docs/gallery.md (the conv
    # late-horizon mode dropping that EMA does not fix).
    spectral_projection: bool = False
    sn_target: float = 1.0
    sn_iters: int = 10
    # "amortized" (default): Miyato-style — carry one power-iteration
    # vector per critic weight in the train state and refine it ONE
    # matvec pair per critic step (the estimate tracks the slowly-moving
    # weights; burn-in of sn_iters at init). "fresh": the round-1
    # stateless form — sn_iters fresh-start iterations every step
    # (measured −59% MLP / −20% conv; kept as the pure-function
    # reference point and for spec-precision one-shot estimates).
    sn_mode: str = "amortized"
    wgan_clip: float = 0.01        # Arjovsky 2017: clip critic to ±0.01
    gp_lambda: float = 10.0        # Gulrajani 2017 / Kodali 2017: λ = 10
    dragan_noise_scale: float = 0.5  # TO-VERIFY: x̂ = x + 0.5·std(x)·U(0,1)
    began_gamma: float = 0.75      # Berthelot 2017 diversity ratio TO-VERIFY (0.5-0.75)
    began_lambda_k: float = 1e-3   # Berthelot 2017 k_t learning rate
    began_k0: float = 0.0
    began_ae_hidden: int = 400     # AE discriminator hidden width TO-VERIFY
    fisher_rho: float = 1e-6       # Mroueh 2017 augmented-Lagrangian ρ TO-VERIFY
    info_cat_dim: int = 10         # InfoGAN categorical code size
    info_cont_dim: int = 2         # TO-VERIFY (presence of continuous codes)
    info_lambda: float = 1.0       # Chen 2016 MI weight
    # Continuous-code posterior variance: fixed unit variance (NLL =
    # ½(c-μ)², the common public-implementation choice) vs the learned
    # log-variance head. Learned variance is the MEASURED destabilizer
    # of this variant on the MLP stack (exp(-logvar) gradient blowup:
    # collapsed IS ~1.0 vs ~5 with it fixed — ablation in
    # docs/variants/infogan.md); both paths are kept.
    info_cont_fixed_var: bool = True
    fgan_divergence: str = "jensen_shannon"  # pluggable (see losses/fgan.py)
    # f-GAN generator objective. "saturating" is the paper's L_G =
    # -E[f*(g_f(V(G(z))))] (minimize the bound). "nonsaturating" is
    # Nowozin §3.2's alternative L_G = -E[g_f(V(G(z)))] (maximize the
    # critic's real-ness score directly — the same trick NSGAN applies
    # to MMGAN), which keeps gradients alive where bounded conjugates
    # saturate; measured per-divergence comparison in
    # benchmarks/fgan_divergences_conv.json.
    fgan_g_loss: str = "saturating"
    birvae_bits: float = 12.0      # BIRVAE target information rate I (bits) TO-VERIFY
    vae_recon: str = "bce"         # "bce" (Bernoulli decoder) | "mse"

    # DDPM (Ho et al. 2020) — a model family BEYOND the reference zoo
    # (the reference has no diffusion models; SURVEY.md §3.2). Defaults
    # are the paper's MNIST-scale choices.
    ddpm_timesteps: int = 1000     # T (Ho 2020 §4)
    ddpm_beta_start: float = 1e-4  # linear beta schedule (Ho 2020 §4)
    ddpm_beta_end: float = 0.02
    # Noise schedule: "linear" (Ho 2020 §4, beta_start..beta_end) or
    # "cosine" (Nichol & Dhariwal 2021 "Improved DDPM" §3.2:
    # abar(t) = f(t)/f(0), f(t) = cos^2((t/T + s)/(1 + s) * pi/2),
    # s = 0.008, per-step beta clipped at 0.999; ignores
    # ddpm_beta_start/end). Cosine spends more of the chain at
    # moderate noise levels — one axis of the FID ablation
    # (benchmarks/ddpm_fid_ablation.py).
    ddpm_schedule: str = "linear"
    ddpm_time_dim: int = 128       # sinusoidal timestep-embedding width
    # Sampler subsequence length S (Song et al. 2021 "DDIM" §4.2):
    # 0 = the full T-step ancestral chain; 0 < S < T strides an evenly
    # spaced subsequence (S net evals instead of T).
    ddpm_sample_steps: int = 0
    # DDIM eta: 1.0 = stochastic DDPM-style posterior (exactly ancestral
    # DDPM on the full sequence), 0.0 = deterministic DDIM.
    ddpm_eta: float = 1.0
    # Label-conditional DDPM with classifier-free guidance (Ho &
    # Salimans 2021 "Classifier-Free Diffusion Guidance"): train one
    # net both conditional and unconditional by dropping the label to a
    # learned null token with prob ddpm_label_drop; at sampling,
    # eps = (1+w) eps_cond - w eps_uncond with w = ddpm_guidance
    # (0 = plain conditional sampling; the paper's sweet spot is
    # w in [0.1, 4] depending on scale). The guided pair is evaluated
    # as ONE 2n-batch net call per step (MXU-friendly), not two.
    ddpm_cond: bool = False
    ddpm_label_drop: float = 0.1
    ddpm_guidance: float = 0.0
    # --- flow matching (losses/flow.py; the ddpm_cond/ddpm_label_drop/
    # ddpm_guidance knobs above are SHARED with this family — the
    # conditioning mechanism is identical at the net level) ------------
    # ODE integration steps from noise (t=0) to data (t=1); each step
    # costs one net eval (two for heun) — the serving cost knob.
    flow_sample_steps: int = 50
    # "euler" (Liu 2022 rectified flow) or "heun" (midpoint
    # predictor-corrector, 2 evals/step, better at small S).
    flow_solver: str = "euler"
    # Reflow / 2-rectified flow (Liu 2022 §3.2): train on the TEACHER's
    # own (noise, sample) couplings instead of independent (x0, data)
    # pairs, straightening the ODE so 1-2 step sampling works. When
    # True, the loss reads the pair from the batch: each data row is
    # [x1_hat in [0,1] | x0 raw] of width 2*image_dim
    # (train/reflow.py builds such datasets from a teacher checkpoint;
    # CLI: --reflow-from CKPT). Unconditional only — the coupling is
    # drawn from the teacher's prior, not per label.
    flow_reflow: bool = False

    # --- VQ-VAE family (losses/vqvae.py, losses/vqprior.py — the
    # discrete-latent family, beyond the reference zoo) -----------------
    vq_codebook_size: int = 64     # K (Oord 2017 uses 512 at scale)
    vq_code_dim: int = 16          # D, the code-vector width
    # token-grid size L for the MLP stack (arch="conv" always uses the
    # 7x7 = 49 spatial grid — models/vq_net.py::num_tokens)
    vq_tokens: int = 16
    vq_beta: float = 0.25          # commitment weight (Oord 2017 §3.2)
    # causal-transformer prior over the token grid (models/ar_prior.py)
    vq_prior_width: int = 128
    vq_prior_layers: int = 2
    vq_prior_heads: int = 4
    vq_prior_temp: float = 1.0     # AR sampling temperature
    # Ancestral-decode implementation: "full" re-runs the whole shifted
    # buffer through the causal net each step (O(L^2) position-evals,
    # zero bookkeeping); "cache" decodes incrementally against per-layer
    # K/V caches (O(L), models/ar_prior.py::prior_apply_step). Same
    # distribution to fp tolerance (equivalence pinned in tests); the
    # default follows the measured serving A/B
    # (benchmarks/vq_decode_ab.json): cache wins at EVERY (arch, batch)
    # measured on the chip — 1.43× at the mlp gallery batch (64) up to
    # 29× at conv/8192 (the O(L^2) full path's wasted position-evals
    # never pay, even on an MXU that loves dense matmuls).
    vq_decode: str = "cache"
    # vqprior only: freeze the tokenizer subtree (two-stage training,
    # Oord §3.3 protocol; set by --vq-from). Default False = joint.
    vq_freeze_tokenizer: bool = False

    # --- numerics / performance ----------------------------------------
    # Activation compute dtype; params stay f32. "auto" (the default)
    # resolves at Trainer build via the MEASURED policy (resolve_dtype):
    # float32 everywhere except arch=conv on a real TPU at or above the
    # bf16 crossover batch, where bf16 MXU operands pay (+19% at 1024;
    # −10% at the reference batch 100 — BASELINE.md conv section).
    # Explicit "float32"/"bfloat16" always wins.
    dtype: str = "auto"
    # Whole-MLP Pallas kernels: OFF by default. The fwd kernel wins up
    # to 2.5x in microbenches, but with trustworthy (value-fetch-
    # fenced) timing the XLA path wins END-TO-END at every measured
    # batch (batch 100/scan 8000: 35.2k vs 30.9k steps/s = +14% XLA;
    # crossover table 512-8192: Pallas 0.68-1.09x, BASELINE.md). The
    # earlier round-2 "Pallas wins everywhere" default was an artifact
    # of the broken block_until_ready fence. custom_vjp boundaries
    # block XLA from fusing the loss/optimizer epilogues across the
    # kernel edge, which eats the VMEM-residency win at these sizes.
    # --use-pallas re-enables (subject to pallas_max_batch).
    # PRNG implementation for the training key chain. "threefry" (jax
    # default): bit-stable across versions/backends — required by the
    # torch-trajectory-parity and resume tests. "rbg": the TPU's
    # hardware RNG path (XLA RngBitGenerator) — measured +25% NSGAN
    # step throughput (noise draws are ~20% of the f32 step budget,
    # benchmarks/step_anatomy.py); deterministic per (seed, binary) but
    # not guaranteed stable across compiler releases.
    prng_impl: str = "threefry"
    use_pallas: bool = False       # see the measured-default note above
    # Fused whole-training-chunk kernel (ops/pallas_train.py): ONE
    # pallas_call runs the entire scan chunk with params + Adam state
    # VMEM-resident across steps — eliminating the per-step parameter/
    # optimizer HBM round-trip that bounds the XLA step (~16 MB/step,
    # step_anatomy's "Adam HBM ≈ speed of light" budget), and the
    # per-op-kernel crossover loss with it. Covers all 14 variants on
    # the mlp stacks, single device.
    #   "auto" (default): use the kernel iff the config is in its
    #     support matrix AND running single-device on a real TPU AND
    #     the kernel is measured to win ON THIS HOST — a one-time
    #     value-fenced micro A/B per (host, variant, shapes), cached in
    #     ~/.cache/gmtpu/fused_auto.json (ops/fused_policy.py; the
    #     fused-vs-XLA margin flips with the host the tunnel lands on,
    #     BASELINE.md cross-session table). Off-TPU, with GMTPU_FUSED_AB=0,
    #     or on measurement failure: the round-2 static sweep list
    #     (FUSED_AUTO_WINNERS). Unsupported configs fall back to the
    #     XLA step silently.
    #   True: force the kernel; the trainer refuses unsupported
    #     combinations with the reason
    #     (ops/pallas_train.fused_step_supported).
    #   False: always the XLA step.
    fused_step: "bool | str" = "auto"
    # When use_pallas is on: 0 = no batch bound; a positive bound
    # restricts the kernel to batches <= bound.
    pallas_max_batch: int = 0
    # Donate the TrainState buffers into the jitted step. OFF by
    # default: donation saves one copy of params+opt state in HBM
    # (a few MB here — irrelevant), and measured on the axon v5e link
    # it costs ~9% steady-state throughput (24.2k -> 22.1k steps/s at
    # scan=8000). Turn on for models whose state actually pressures
    # HBM.
    donate_buffers: bool = False
    # Train steps fused per host dispatch (one lax.scan). The MNIST MLPs
    # are dispatch-bound: measured on the v5e tunnel, steady-state
    # throughput is ~1.1k steps/s at 100, ~6k at 1000, ~8.7k at 2000.
    scan_steps: int = 1000

    # --- parallelism ----------------------------------------------------
    dp: int = 1                    # data-parallel mesh size over ICI
    dp_impl: str = "jit"           # "jit" (NamedSharding) | "shard_map"
    # Tensor (model) parallel size: Megatron-style column/row sharding
    # of every MLP over a 2-D (data, model) mesh, collectives inserted
    # by the SPMD partitioner (parallel/tp.py). DP is the throughput
    # path at MNIST scale; tp>1 is the capability/scaling path. Uses
    # the XLA kernels (the whole-MLP Pallas kernel is per-device).
    tp: int = 1

    # --- run / io -------------------------------------------------------
    seed: int = 42
    steps: int = 2000
    epochs: Optional[int] = None   # if set, overrides steps
    sample_every: int = 0          # steps between sample grids
    #                                (0 = per epoch, negative = never)
    sample_n: int = 64
    out_dir: str = "runs"
    ckpt_every: int = 0            # 0 = only at end
    ckpt_backend: str = "npz"      # "npz" (stdlib) | "orbax" (async-capable)
    resume: bool = False
    profile: bool = False

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def __post_init__(self):
        if self.arch not in ("mlp", "conv"):
            raise ValueError(f"arch must be mlp|conv, got {self.arch!r}")
        if self.arch == "conv" and self.tp > 1:
            raise ValueError(
                "tp>1 shards the MLP stacks Megatron-style "
                "(parallel/tp.py); the conv stacks have no sharding "
                "rules — use arch='mlp' with tp, or dp for conv")
        if self.arch == "conv" and self.conv_channels < 1:
            raise ValueError(
                f"conv_channels must be >= 1, got {self.conv_channels}")
        if self.dtype not in ("auto", "float32", "bfloat16"):
            raise ValueError(
                f"dtype must be auto|float32|bfloat16, got {self.dtype!r}")
        if self.optimizer not in ("adam", "rmsprop"):
            raise ValueError(f"optimizer must be adam|rmsprop, got {self.optimizer!r}")
        if self.vae_recon not in ("bce", "mse"):
            raise ValueError(f"vae_recon must be bce|mse, got {self.vae_recon!r}")
        if not 0.0 <= self.ema_decay < 1.0:
            raise ValueError(
                f"ema_decay must be in [0, 1), got {self.ema_decay}")
        if self.data_storage not in ("float32", "uint8"):
            raise ValueError(
                f"data_storage must be float32|uint8, got "
                f"{self.data_storage!r}")
        if self.ckpt_backend not in ("npz", "orbax"):
            raise ValueError(
                f"ckpt_backend must be npz|orbax, got {self.ckpt_backend!r}")
        if self.tp < 1 or self.dp < 1:
            raise ValueError(f"dp/tp must be >= 1, got dp={self.dp} tp={self.tp}")
        if self.prng_impl not in ("threefry", "rbg", "unsafe_rbg"):
            raise ValueError(
                f"prng_impl must be threefry|rbg|unsafe_rbg, got {self.prng_impl!r}")
        if self.fused_step not in (True, False, "auto"):
            raise ValueError(
                f"fused_step must be True|False|'auto', got "
                f"{self.fused_step!r}")
        if self.fgan_g_loss not in ("saturating", "nonsaturating"):
            raise ValueError(
                f"fgan_g_loss must be saturating|nonsaturating, got "
                f"{self.fgan_g_loss!r}")
        if self.spectral_projection and self.d_steps == 0:
            raise ValueError(
                "spectral_projection constrains the critic through the "
                "d_post hook; the single-model variants (vae/birvae, "
                "d_steps=0) have no critic — the flag would be a silent "
                "no-op (ADVICE r1)")
        if self.sn_mode not in ("amortized", "fresh"):
            raise ValueError(
                f"sn_mode must be amortized|fresh, got {self.sn_mode!r}")
        if self.ddpm_schedule not in ("linear", "cosine"):
            raise ValueError(
                f"ddpm_schedule must be 'linear' or 'cosine', got "
                f"{self.ddpm_schedule!r}")
        if self.ddpm_sample_steps < 0 or (
                self.ddpm_sample_steps > self.ddpm_timesteps):
            raise ValueError(
                f"ddpm_sample_steps must be in [0, ddpm_timesteps="
                f"{self.ddpm_timesteps}], got {self.ddpm_sample_steps}")
        if not 0.0 <= self.ddpm_eta <= 1.0:
            raise ValueError(
                f"ddpm_eta must be in [0, 1], got {self.ddpm_eta}")
        if not 0.0 <= self.ddpm_label_drop <= 1.0:
            raise ValueError(
                f"ddpm_label_drop must be in [0, 1], got "
                f"{self.ddpm_label_drop}")
        if self.ddpm_guidance < 0.0:
            raise ValueError(
                f"ddpm_guidance must be >= 0, got {self.ddpm_guidance}")
        if self.flow_sample_steps < 1:
            raise ValueError(
                f"flow_sample_steps must be >= 1, got "
                f"{self.flow_sample_steps}")
        if self.flow_solver not in ("euler", "heun"):
            raise ValueError(
                f"flow_solver must be 'euler' or 'heun', got "
                f"{self.flow_solver!r}")
        if self.ddpm_guidance > 0.0 and not self.ddpm_cond:
            raise ValueError(
                "ddpm_guidance requires ddpm_cond=True (guidance mixes "
                "the conditional and null-token predictions)")
        if self.ddpm_guidance > 0.0 and self.ddpm_label_drop <= 0.0:
            raise ValueError(
                "ddpm_guidance > 0 requires ddpm_label_drop > 0: with "
                "label dropout disabled the null token is never trained, "
                "so guided extrapolation would mix a random-init null "
                "branch into every sample (label_drop is a TRAINING-time "
                "knob — keep its default when sampling a model that "
                "trained with it)")
        if self.flow_reflow:
            if self.variant != "flow":
                raise ValueError(
                    "flow_reflow applies to the flow variant only, got "
                    f"variant={self.variant!r}")
            if self.ddpm_cond:
                raise ValueError(
                    "flow_reflow is unconditional: the teacher coupling "
                    "is drawn from the prior, not per label")
            if self.data_storage == "uint8":
                raise ValueError(
                    "flow_reflow stores raw-float noise columns; "
                    "data_storage='uint8' cannot represent them")
        if self.vq_codebook_size < 2 or self.vq_code_dim < 1 or (
                self.vq_tokens < 1):
            raise ValueError(
                "vq_codebook_size >= 2, vq_code_dim >= 1, vq_tokens >= 1 "
                f"required; got K={self.vq_codebook_size} "
                f"D={self.vq_code_dim} L={self.vq_tokens}")
        if self.vq_prior_width % self.vq_prior_heads:
            raise ValueError(
                f"vq_prior_width ({self.vq_prior_width}) must divide "
                f"evenly into vq_prior_heads ({self.vq_prior_heads})")
        if self.vq_prior_temp <= 0.0:
            raise ValueError(
                f"vq_prior_temp must be > 0, got {self.vq_prior_temp}")
        if self.vq_freeze_tokenizer and self.variant != "vqprior":
            raise ValueError(
                "vq_freeze_tokenizer applies to the vqprior variant "
                f"only, got variant={self.variant!r}")
        if self.vq_decode not in ("full", "cache"):
            raise ValueError(
                f"vq_decode must be 'full' or 'cache', got "
                f"{self.vq_decode!r}")
        if self.variant == "vqprior" and self.ddpm_guidance > 0.0:
            raise ValueError(
                "the AR prior is plain-conditional (ddpm_cond): it has "
                "no guidance extrapolation — ddpm_guidance applies to "
                "the ddpm/flow samplers only")
        if self.variant == "fgan":
            # fail fast with a clean message instead of a mid-trace error
            from generative_models_tpu.losses.fgan import get_divergence
            get_divergence(self.fgan_divergence)


# Per-variant overrides, the one place the reference's per-file
# hyperparameters live (SURVEY.md §8). Paper defaults where the recalled
# reference value is unknown.
VARIANT_OVERRIDES: Dict[str, Dict[str, Any]] = {
    "vae": {"d_steps": 0},
    "birvae": {"d_steps": 0, "vae_recon": "mse"},  # paper uses MSE; TO-VERIFY
    # Every Adam-driven adversarial variant runs beta1=0.5 — the DCGAN
    # (Radford 2016) momentum setting. Measured ablation at 6k steps
    # (one seed, IS / FID under the zoo classifier; BASELINE.md
    # "Sample-quality tuning"): 2-4x IS and 3-6x FID improvement on
    # EVERY variant vs the torch-default 0.9 — e.g. nsgan 1.7/76 ->
    # 4.2/18, began 1.3/299 -> 3.6/91, lsgan 2.7/74 -> 5.1/15. The
    # VAE family keeps 0.9 (likelihood training; momentum is not the
    # instability axis there).
    "mmgan": {"adam_b1": 0.5},
    "nsgan": {"adam_b1": 0.5},
    "lsgan": {"adam_b1": 0.5},
    "cgan": {"adam_b1": 0.5},
    "ragan": {"adam_b1": 0.5},
    # InfoGAN paper (Chen 2016) MNIST setup: Adam with the DCGAN
    # β1=0.5, G lr 1e-3, D lr 2e-4. Measured ablation (6k steps,
    # docs/variants/infogan.md): these + the fixed-variance continuous
    # NLL take the variant from full mode collapse (IS 1.0, FID 171)
    # to IS 4.9 / FID 18.
    "infogan": {"adam_b1": 0.5, "g_lr": 1e-3},
    "fgan": {"adam_b1": 0.5},
    "began": {"began_gamma": 0.75, "adam_b1": 0.5},
    # WGAN paper (Arjovsky 2017): RMSprop 5e-5, 5 critic steps.
    # TO-VERIFY which optimizer the reference file actually used.
    "wgan": {"optimizer": "rmsprop", "g_lr": 5e-5, "d_lr": 5e-5, "d_steps": 5},
    # WGAN-GP paper (Gulrajani 2017): Adam(1e-4, β=(0.5, 0.9)), 5 critic steps.
    "wgangp": {"g_lr": 1e-4, "d_lr": 1e-4, "adam_b1": 0.5, "adam_b2": 0.9,
               "d_steps": 5},
    # DRAGAN paper (Kodali 2017): NSGAN loss + local penalty, 1 critic step.
    "dragan": {"adam_b1": 0.5},
    "fishergan": {"adam_b1": 0.5},
    # DDPM (beyond-reference family): single model, no critic. Ho 2020
    # trains with Adam (torch-default betas) and samples from an EMA of
    # the weights (paper: 0.9999 at ImageNet scale; 0.999 here — at the
    # zoo's ~6-20k-step budgets the paper rate would still be dominated
    # by the init).
    "ddpm": {"d_steps": 0, "ema_decay": 0.999},
    # Flow matching (beyond-reference, round 4): single model like the
    # VAE/DDPM families; EMA sampling per flow-matching practice.
    "flow": {"d_steps": 0, "ema_decay": 0.999},
    # VQ-VAE family (beyond-reference, round 4): likelihood-style
    # training — torch-default Adam momentum like the VAE family, no
    # EMA (Oord 2017 samples from the live weights).
    "vqvae": {"d_steps": 0},
    "vqprior": {"d_steps": 0},
}

VARIANTS: Tuple[str, ...] = tuple(VARIANT_OVERRIDES)

# Arch-conditional overrides, applied when the user selects that arch
# for that variant (between the variant row and user overrides, so an
# explicit flag still wins). All three entries are MEASURED rescues of
# conv-stack collapses/mode-dropping that generator EMA does not fix
# (BASELINE.md spectral section; 3 seeds each, re-validated under the
# amortized estimator whose conv cost is −2.8%):
# - BEGAN-conv collapses at every plain setting tried (8-config sweep
#   — docs/variants/began.md); spectral @ 2.0 → IS 4.6–5.2, FID 7–13
#   (sharp window 1 < target < 3: 1.0 starves the AE).
# - ragan/lsgan-conv train fine to ~6k then drop modes late-horizon
#   (20k IS 3.26 / 4.43); spectral @ 1.0 holds them at 5.2–5.6 /
#   5.0–5.5. Defaulted in round 3 (VERDICT r2 next #4) so the shipped
#   config is what the committed gallery tables measure — the same
#   rule BEGAN got in round 2 (VERDICT r1 next #5): no out-of-the-box
#   config is known-collapsed.
CONV_VARIANT_OVERRIDES: Dict[str, Dict[str, Any]] = {
    "began": {"spectral_projection": True, "sn_target": 2.0},
    "ragan": {"spectral_projection": True, "sn_target": 1.0},
    "lsgan": {"spectral_projection": True, "sn_target": 1.0},
    # Measured rescue (round 4, benchmarks/ddpm_fid_ablation.json): on
    # the conv UNet the cosine schedule dominates Ho's linear default
    # at every (budget, sample_steps) cell and FIXES the full-chain
    # ancestral sampler's failure (linear full-chain FID 86.7 at 20k /
    # 24.4 at 60k vs cosine 0.63 at 60k — the round-3 "FID 78.5" was
    # this, not underfitting). MLP keeps the paper default (linear);
    # its quality ceiling is the stack bottleneck, not the schedule.
    "ddpm": {"ddpm_schedule": "cosine"},
}


# Measured conv bf16 crossover batch (benchmarks/conv_bf16_crossover.py
# → conv_bf16_crossover.json): bf16 MXU operands are ~10% SLOWER at
# batch 100 (small spatial tiles underfill the MXU; per-layer casts of
# the still-f32 params add overhead) and ~19% FASTER at 1024. The
# boundary below is set from the finest measured bracketing; re-run the
# benchmark to recalibrate on a new chip generation.
CONV_BF16_CROSSOVER_BATCH = 512


def resolve_dtype(cfg: "Config", platform: str) -> str:
    """Concrete dtype for ``Config.dtype="auto"`` (VERDICT r2 next #6).

    MLP stacks are dispatch/HBM-bound at every measured batch — bf16
    never pays (BASELINE.md fused A/B: 0.97x at the headline) →
    float32. Conv stacks on a real TPU flip to bf16 at the measured
    batch crossover. Off-TPU (CPU harness, interpret runs): float32.
    Loss-trajectory parity vs the torch oracles is an f32 property; it
    is preserved at the reference batch sizes (100 < crossover) and
    whenever the user pins --dtype float32.
    """
    if cfg.dtype != "auto":
        return cfg.dtype
    if (platform == "tpu" and cfg.arch == "conv"
            and cfg.batch_size >= CONV_BF16_CROSSOVER_BATCH):
        return "bfloat16"
    return "float32"


# The measured conditional-flow guidance winner (see variant_config).
FLOW_GUIDANCE_DEFAULT = 0.3


def variant_config(variant: str, **overrides) -> Config:
    """Config for `variant` with its registry defaults applied, then
    arch-conditional defaults (CONV_VARIANT_OVERRIDES), then user
    overrides on top."""
    if variant not in VARIANT_OVERRIDES:
        raise ValueError(
            f"unknown variant {variant!r}; known: {sorted(VARIANT_OVERRIDES)}")
    kw: Dict[str, Any] = {"variant": variant}
    kw.update(VARIANT_OVERRIDES[variant])
    if overrides.get("arch") == "conv":
        kw.update(CONV_VARIANT_OVERRIDES.get(variant, {}))
    kw.update(overrides)
    # Measured guidance default (round 5, benchmarks/flow_guidance.json):
    # conditional FLOW's guided sampler has a real sweet spot — w=0.3
    # improves FID/IS/label_match over w=0 in every seed (FID 0.33-0.38,
    # the lowest measured in the zoo). The SAME ablation on DDPM
    # measured the opposite (ddpm_guidance.json: monotone degradation,
    # conditioning already saturated), so ddpm keeps 0. Guidance is a
    # sampling-only knob; an explicit --ddpm-guidance always wins.
    # Guarded on label dropout: with ddpm_label_drop=0 the null token
    # is never trained, so guided extrapolation would mix in a
    # random-init null branch — only w=0 is correct there.
    cfg = Config(**kw)
    if (variant == "flow" and cfg.ddpm_cond and cfg.ddpm_label_drop > 0
            and "ddpm_guidance" not in overrides):
        cfg = cfg.replace(ddpm_guidance=FLOW_GUIDANCE_DEFAULT)
    return cfg
