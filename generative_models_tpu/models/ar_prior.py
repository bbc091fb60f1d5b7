"""Causal-transformer autoregressive prior over VQ-VAE token grids.

Stage 2 of the discrete-latent pipeline (Oord et al. 2017 §3.3 trains a
PixelCNN over the latents; at this repo's 16-49-token grids a small
causal TRANSFORMER is the TPU-native choice — every op is a dense
matmul on the MXU, one attention matrix per head is [L, L] with L <= 49,
and teacher-forced training is a single batched forward, no recurrence).
Beyond-reference capability (SURVEY.md §3.2 has no discrete-latent row).

Architecture (pre-LN GPT block, Radford et al. 2019 form):

    x = tok_emb[token] + pos_emb                      [B, L, W]
    repeat vq_prior_layers times:
        x = x + proj(causal_mha(LN(x)))
        x = x + fc2(gelu(fc1(LN(x))))
    logits = LN(x) @ head                             [B, L, K]

Input tokens are SHIFTED: position i sees [BOS, t_0, .., t_{i-1}]
(BOS = index K, a learned start token), so logits[:, i] predicts t_i —
the causal mask makes position i's logits independent of tokens >= i
(pinned by tests/test_vqvae.py::test_prior_causality).

The output head is ZERO-initialized, so the untrained prior is exactly
uniform and the cross-entropy starts at log K — the same testable
start-point convention models/ddpm_net.py uses for its zero-init
output layers. Embeddings use the torch nn.Embedding default N(0, 1);
linears the repo's torch-default uniform (models/mlp.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.config import Config
from generative_models_tpu.models.mlp import linear_init
from generative_models_tpu.models.vq_net import num_tokens
from generative_models_tpu.ops import fused_linear

_LN_EPS = 1e-5


def _ln_init(width: int):
    return {"scale": jnp.ones((width,), jnp.float32),
            "bias": jnp.zeros((width,), jnp.float32)}


def _ln_apply(params, x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + _LN_EPS)
    return xn * params["scale"] + params["bias"]


def _lin(layer, x3, act: str = "none"):
    """fused_linear over the trailing axis of a [B, L, .] tensor (the
    backend-dispatched matmul the whole repo routes through)."""
    b, l, _ = x3.shape
    y = fused_linear(x3.reshape(b * l, -1), layer["w"], layer["b"], act=act)
    return y.reshape(b, l, -1)


def _block_init(rng, cfg: Config):
    w = cfg.vq_prior_width
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    return {
        "ln1": _ln_init(w),
        "qkv": linear_init(r1, w, 3 * w),
        "proj": linear_init(r2, w, w),
        "ln2": _ln_init(w),
        "fc1": linear_init(r3, w, 4 * w),
        "fc2": linear_init(r4, 4 * w, w),
    }


def _attn(params, x, cfg: Config):
    """Causal multi-head self-attention, all-matmul."""
    b, l, w = x.shape
    nh = cfg.vq_prior_heads
    hd = w // nh
    qkv = _lin(params["qkv"], x)                       # [B, L, 3W]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):  # [B, L, W] -> [B, H, L, hd]
        return t.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.float32(hd))
    causal = jnp.tril(jnp.ones((l, l), bool))
    scores = jnp.where(causal, scores, jnp.float32(-1e30))
    att = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, l, w)
    return _lin(params["proj"], o)


def prior_init(rng, cfg: Config):
    w = cfg.vq_prior_width
    k = cfg.vq_codebook_size
    l = num_tokens(cfg)
    rt, rp, ry, *rb = jax.random.split(rng, 3 + cfg.vq_prior_layers)
    p = {
        # K real tokens + one learned BOS (index K)
        "tok": jax.random.normal(rt, (k + 1, w), jnp.float32),
        "pos": jax.random.normal(rp, (l, w), jnp.float32),
        "blocks": [_block_init(r, cfg) for r in rb],
        "ln_f": _ln_init(w),
        # zero-init head: untrained prior == uniform, CE starts at log K
        "head": {"w": jnp.zeros((w, k), jnp.float32),
                 "b": jnp.zeros((k,), jnp.float32)},
    }
    if cfg.ddpm_cond:
        # class-conditional prior (the CGAN/cond-DDPM story for the
        # discrete-latent family; the shared ddpm_cond knob — see
        # losses/flow.py's conditioning note): a learned per-class
        # embedding added at EVERY position. Plain conditional (no
        # null token: AR sampling has no guidance extrapolation here).
        p["label"] = jax.random.normal(
            ry, (cfg.num_classes, w), jnp.float32)
    return p


def block_apply(blk, x, cfg: Config):
    """One pre-LN GPT block. THE single definition of the block body —
    `prior_apply`'s loop and parallel/pp.py's pipelined stages both
    call this, so the two paths cannot drift."""
    x = x + _attn(blk, _ln_apply(blk["ln1"], x), cfg)
    h = _lin(blk["fc1"], _ln_apply(blk["ln2"], x), act="gelu")
    return x + _lin(blk["fc2"], h)


def embed_tokens(params, tokens_in, cfg: Config, y=None):
    """Shared input embedding: tok + pos (+ per-class label with
    cfg.ddpm_cond). jnp.take, not fancy-indexing: exported samplers
    bake params as host numpy constants, which cannot be indexed by
    tracers."""
    x = jnp.take(jnp.asarray(params["tok"]), tokens_in, axis=0
                 ) + jnp.asarray(params["pos"])[None]
    if cfg.ddpm_cond and y is not None:
        x = x + jnp.take(jnp.asarray(params["label"]), y, axis=0)[:, None]
    return x


def final_logits(params, x):
    """Shared epilogue: final LayerNorm + the zero-init head."""
    return _lin(params["head"], _ln_apply(params["ln_f"], x))


def prior_apply(params, tokens_in, cfg: Config, y=None):
    """Next-token logits [B, L, K] for SHIFTED input tokens [B, L]
    (ints in [0, K]; K = BOS). logits[:, i] conditions only on
    tokens_in[:, : i + 1] (causal). With cfg.ddpm_cond, y [B] int
    labels condition every position."""
    x = embed_tokens(params, tokens_in, cfg, y)
    for blk in params["blocks"]:
        x = block_apply(blk, x, cfg)
    return final_logits(params, x)


# --------------------------------------------------------------------
# Incremental (KV-cache) decoding — the serving-path twin
# --------------------------------------------------------------------

def init_kv_cache(n: int, cfg: Config):
    """Per-layer key/value caches [layers][B, H, L, hd], zeros."""
    w = cfg.vq_prior_width
    nh = cfg.vq_prior_heads
    l = num_tokens(cfg)
    shape = (n, nh, l, w // nh)
    return [{"k": jnp.zeros(shape, jnp.float32),
             "v": jnp.zeros(shape, jnp.float32)}
            for _ in range(cfg.vq_prior_layers)]


def _lin1(layer, x, act: str = "none"):
    return fused_linear(x, layer["w"], layer["b"], act=act)


def prior_apply_step(params, tok_i, i, kv, cfg: Config, y=None):
    """One incremental decode step: logits for position i given the
    input token at i (tok_i [B] int) and the K/V caches of positions
    < i. Returns (logits_i [B, K], updated kv).

    Same arithmetic as `prior_apply` restricted to row i: per-position
    ops (LN, linears, MLP) see only row i's activations, and the
    attention row attends over the cached keys with positions > i
    masked — so the logits match the full-prefix form to fp tolerance
    (pinned by tests). Cost per step is O(L) instead of O(L^2):
    this is the `vq_decode="cache"` serving path; the measured
    full-vs-cache A/B lives in benchmarks/serving, and the default in
    config.py follows the measurement."""
    b = tok_i.shape[0]
    nh = cfg.vq_prior_heads
    w = cfg.vq_prior_width
    hd = w // nh
    l = kv[0]["k"].shape[2]
    x = jnp.take(jnp.asarray(params["tok"]), tok_i, axis=0) + (
        jax.lax.dynamic_slice_in_dim(jnp.asarray(params["pos"]), i, 1,
                                     axis=0)[0])
    if cfg.ddpm_cond and y is not None:
        x = x + jnp.take(jnp.asarray(params["label"]), y, axis=0)
    new_kv = []
    for blk, cache in zip(params["blocks"], kv):
        h = _ln_apply(blk["ln1"], x)
        qkv = _lin1(blk["qkv"], h)                       # [B, 3W]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, nh, hd)
        kc = jax.lax.dynamic_update_slice_in_dim(
            cache["k"], k.reshape(b, nh, 1, hd), i, axis=2)
        vc = jax.lax.dynamic_update_slice_in_dim(
            cache["v"], v.reshape(b, nh, 1, hd), i, axis=2)
        new_kv.append({"k": kc, "v": vc})
        scores = jnp.einsum("bhd,bhld->bhl", q, kc) / jnp.sqrt(
            jnp.float32(hd))
        valid = jnp.arange(l) <= i                        # causal row i
        scores = jnp.where(valid[None, None, :], scores,
                           jnp.float32(-1e30))
        att = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhl,bhld->bhd", att, vc).reshape(b, w)
        x = x + _lin1(blk["proj"], o)
        hm = _lin1(blk["fc1"], _ln_apply(blk["ln2"], x), act="gelu")
        x = x + _lin1(blk["fc2"], hm)
    x = _ln_apply(params["ln_f"], x)
    return _lin1(params["head"], x), new_kv
