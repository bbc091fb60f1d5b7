"""VQ-VAE + autoregressive latent prior — the generative completion of
the discrete-latent family (Oord et al. 2017 §3.3; prior architecture:
a small causal transformer, models/ar_prior.py).

Beyond-reference capability (SURVEY.md §3.2). `vqvae` alone models
p(x | tokens); THIS variant adds p(tokens) so ancestral sampling
(AR-sample a token grid, decode it) is a real generative model — the
pipeline Oord 2017 trains as two stages.

Two training modes behind one loss head, switched by
`Config.vq_freeze_tokenizer`:

- False (default): JOINT — one optimizer trains tokenizer and prior
  together, L = L_vqvae + CE(prior(shift(tokens)), tokens) with the
  token targets stop-gradiented (the CE never backprops into the
  encoder/codebook; the tokenizer is shaped only by its own Oord loss,
  exactly as in two-stage training — the prior just watches a moving
  target early on). This makes `--variant vqprior` a self-contained
  end-to-end model: every registry-driven harness (sweep, quality,
  gallery, notebooks) measures a REAL sampler with no staging logic.
- True: TWO-STAGE (the paper's protocol) — `params["vqvae"]` is
  stop-gradiented everywhere, so its gradients are identically zero
  and Adam leaves the subtree bit-exact (pinned by tests); only the
  prior trains. The CLI's `--vq-from CKPT` loads a trained `vqvae`
  checkpoint into the subtree and sets this flag (train/vq.py).

Sampling: lax.scan over the L token positions, drawing token i at
temperature `vq_prior_temp`. Two decode implementations behind
`Config.vq_decode`, identical to fp tolerance (pinned): "full" re-runs
the whole shifted buffer through the causal net each step (static
shapes; O(L^2) position-evals of a tiny transformer — dense MXU work,
zero bookkeeping) and "cache" decodes incrementally against per-layer
K/V caches (O(L), models/ar_prior.py::prior_apply_step). The shipped
default is "cache" per the measured serving A/B
(benchmarks/vq_decode_ab.json): cache wins at every (arch, batch)
measured — 1.43× at the mlp gallery batch 64, 7.7×/23.8× at mlp
1024/8192, and 3.0×–29× on conv, where the full path's O(L^2)
re-evals of a 49-token buffer never pay. The grid decodes through
the carried vqvae.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.losses.base import SingleModelSpec
from generative_models_tpu.losses import vqvae as vqvae_mod
from generative_models_tpu.models import ar_prior
from generative_models_tpu.models.vq_net import num_tokens
from generative_models_tpu.ops import vq


def init_params(rng, cfg):
    rp, rv = jax.random.split(rng)
    # the vqvae subtree starts as a fresh stage-1 model: trained jointly
    # by default, or overwritten from a checkpoint + frozen (train/vq.py)
    return {"prior": ar_prior.prior_init(rp, cfg),
            "vqvae": vqvae_mod.init_params(rv, cfg)}


def _shift(tokens, cfg):
    """[BOS, t_0, .., t_{L-2}]: inputs whose position-i logits predict
    t_i (BOS = index K, the learned start token)."""
    b = tokens.shape[0]
    bos = jnp.full((b, 1), cfg.vq_codebook_size, tokens.dtype)
    return jnp.concatenate([bos, tokens[:, :-1]], axis=1)


def prior_ce(logits, tokens):
    """Teacher-forced next-token cross-entropy (mean over batch x
    positions) — THE prior objective, defined once; `loss` below and
    parallel/pp.py's pipelined twin both call this, so the objectives
    cannot drift."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, tokens[..., None],
                                         axis=-1))


def loss(params, batch, rng, cfg):
    x = batch["image"]
    vparams = params["vqvae"]
    if cfg.vq_freeze_tokenizer:
        vparams = jax.lax.stop_gradient(vparams)
    recon, codebook, commit, idx = vqvae_mod._terms(vparams, x, cfg)
    tokens = jax.lax.stop_gradient(idx)                    # [B, L] int
    y = batch["label"].astype(jnp.int32) if cfg.ddpm_cond else None
    logits = ar_prior.prior_apply(params["prior"], _shift(tokens, cfg),
                                  cfg, y)                  # [B, L, K]
    ce = prior_ce(logits, tokens)
    if cfg.vq_freeze_tokenizer:
        total = ce  # the vqvae terms are constants (frozen subtree)
    else:
        total = recon + codebook + cfg.vq_beta * commit + ce
    return total, {"loss": total, "prior_loss": ce,
                   "recon_loss": recon, "vq_loss": codebook,
                   "perplexity": vq.perplexity(idx, cfg.vq_codebook_size)}


def sample_tokens(prior_params, rng, n, cfg, y=None):
    """Ancestral AR sampling of a token grid [n, L] (see module note).
    With cfg.ddpm_cond, y [n] int labels condition every step. Decode
    implementation per `cfg.vq_decode`: "full" (re-run the shifted
    buffer, O(L^2) position-evals) or "cache" (incremental K/V decode,
    O(L)) — same sampling distribution to fp tolerance, equivalence
    pinned in tests/test_vqvae.py."""
    l = num_tokens(cfg)
    inv_t = 1.0 / cfg.vq_prior_temp

    if cfg.vq_decode == "cache":
        def body(carry, i):
            buf, kv, prev = carry
            logits_i, kv = ar_prior.prior_apply_step(
                prior_params, prev, i, kv, cfg, y)
            tok = jax.random.categorical(jax.random.fold_in(rng, i),
                                         logits_i * inv_t)
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, tok[:, None].astype(buf.dtype), i, axis=1)
            return (buf, kv, tok.astype(jnp.int32)), None

        carry0 = (jnp.zeros((n, l), jnp.int32),
                  ar_prior.init_kv_cache(n, cfg),
                  jnp.full((n,), cfg.vq_codebook_size, jnp.int32))  # BOS
        (buf, _, _), _ = jax.lax.scan(body, carry0, jnp.arange(l))
        return buf

    def body(buf, i):
        logits = ar_prior.prior_apply(prior_params, _shift(buf, cfg),
                                      cfg, y)
        step = jax.lax.dynamic_slice_in_dim(logits, i, 1, axis=1)[:, 0]
        tok = jax.random.categorical(jax.random.fold_in(rng, i),
                                     step * inv_t)
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, tok[:, None].astype(buf.dtype), i, axis=1)
        return buf, None

    buf0 = jnp.zeros((n, l), jnp.int32)
    buf, _ = jax.lax.scan(body, buf0, jnp.arange(l))
    return buf


def sample(params, rng, n, cfg):
    y = None
    if cfg.ddpm_cond:
        # one column per digit in the sample grid (the CGAN convention)
        y = jnp.arange(n) % cfg.num_classes
    tokens = sample_tokens(params["prior"], rng, n, cfg, y)
    return vqvae_mod.decode_tokens(params["vqvae"], tokens, cfg)


def sample_class(params, rng, n, label, cfg):
    """All-one-class conditional sampling (mirrors losses/ddpm.py)."""
    y = jnp.full((n,), label, jnp.int32)
    tokens = sample_tokens(params["prior"], rng, n, cfg, y)
    return vqvae_mod.decode_tokens(params["vqvae"], tokens, cfg)


VQPRIOR = SingleModelSpec(
    name="vqprior",
    init_params=init_params,
    loss=loss,
    sample=sample,
)
