"""generative_models_tpu — a TPU-native JAX rebuild of the annotated
generative-model tutorial zoo (reference: shayneobrien/generative-models).

The reference is a PyTorch zoo of 13+ generative training objectives on
MNIST, one self-contained file per variant. This framework factors the
copy-pasted scaffolding into one TPU-first stack:

- ``models``   shared Generator / Discriminator / Encoder / Decoder MLPs
               (pure pytrees, functional apply)
- ``losses``   pluggable loss-head registry: one module per training
               objective (VAE, BIRVAE, MMGAN, NSGAN, LSGAN, WGAN, WGAN-GP,
               DRAGAN, BEGAN, RaGAN, InfoGAN, f-GAN x divergences,
               FisherGAN, CGAN)
- ``data``     HBM-resident MNIST pipeline: one host->device transfer per
               run, jitted per-step minibatch gather
- ``train``    single Trainer + one jitted train step per variant,
               lax.scan'd over many steps per host dispatch
- ``parallel`` data parallelism over ICI via jax.sharding.Mesh (jit with
               NamedSharding, and an explicit shard_map+psum path)
- ``ops``      Pallas TPU kernels (fused matmul+activation, fused VAE
               reparameterization+KL) with XLA twins for every kernel

Reference provenance note: the `/root/reference` mount was empty in every
session so far (see SURVEY.md §0); behaviour is pinned to the papers each
variant implements and to BASELINE.json's scope, with `# TO-VERIFY`
markers on recalled hyperparameters (all centralised in
``generative_models_tpu.config``).
"""

__version__ = "0.2.0"

import os as _os

import jax as _jax

# Persistent XLA/Mosaic compilation cache: OPT-IN via
# GMTPU_COMPILE_CACHE=<dir>. It was on by default through round 1;
# round 2 root-caused intermittent suite SEGFAULTS to reloading
# persistent XLA:CPU executables: XLA:CPU AOT-serializes with a
# machine-feature set that does not match the execution host (the
# cpu_aot_loader.cc "machine feature mismatch ... could lead to
# SIGILL" warnings), and reloads crash sporadically — including
# SAME-session entries on this sandbox's hosts. TPU (Mosaic)
# executables are not feature-fragile this way, but the cache cannot
# be scoped per-backend, and any process mixes CPU host computations
# in. So: off unless explicitly requested for a long-lived TPU
# workflow, where the first multi-minute Pallas compile amortizes.
try:
    if _os.environ.get("GMTPU_COMPILE_CACHE"):
        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ["GMTPU_COMPILE_CACHE"])
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from generative_models_tpu.config import Config, variant_config  # noqa: F401
