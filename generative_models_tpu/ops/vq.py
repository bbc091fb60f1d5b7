"""Vector-quantization primitives (van den Oord, Vinyals & Kavukcuoglu
2017 "Neural Discrete Representation Learning" §3.1-3.2), TPU-first.

A capability BEYOND the reference zoo (the reference is VAEs + GANs
only — SURVEY.md §3.2; mount empty, math paper-pinned). These are the
compute primitives the vqvae/vqprior loss heads share; the design
choices are MXU-shaped:

- Nearest-code search is ONE matmul: argmin_k ||z - e_k||^2 =
  argmin_k (||e_k||^2 - 2 z·e_k) — the ||z||^2 term is constant in k
  and dropped, so the distance matrix is a single [.., D] x [D, K]
  contraction on the MXU plus a broadcast add, then a lane-local
  argmin. No pairwise-difference materialization ([.., K, D] would be
  K times the HBM traffic of the matmul form).
- Codebook lookup is one_hot(idx) @ E — a second small matmul — rather
  than a dynamic gather: K is tiny (codebook sizes are 64-512 here),
  the one-hot row rides the same MXU pipeline as the distance matmul,
  and XLA fuses the one-hot construction into the contraction.
- The straight-through estimator (Oord §3.2: copy decoder gradients
  past the non-differentiable argmin) is the standard
  z + stop_gradient(z_q - z) identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def code_distances(z, codebook):
    """Squared-L2 distances from each row of z [..., D] to each codebook
    row e_k [K, D], SHIFTED by the constant ||z||^2 (argmin-invariant):
    returns ||e_k||^2 - 2 z·e_k with shape [..., K]."""
    e_sq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)  # [K]
    cross = jnp.einsum("...d,kd->...k", z, codebook,
                       preferred_element_type=jnp.float32)
    return e_sq - 2.0 * cross


def lookup(idx, codebook):
    """Codebook rows at integer indices idx [...] -> [..., D], as a
    one-hot matmul (see module note)."""
    oh = jax.nn.one_hot(idx, codebook.shape[0], dtype=codebook.dtype)
    return jnp.einsum("...k,kd->...d", oh, codebook)


def quantize(z, codebook):
    """Nearest-codebook quantization: (indices [...], z_q [..., D]).
    Not differentiated through — pair with `straight_through`."""
    idx = jnp.argmin(code_distances(z, codebook), axis=-1)
    return idx, lookup(idx, codebook)


def straight_through(z, z_q):
    """Forward value z_q, backward identity to z (Oord 2017 §3.2)."""
    return z + jax.lax.stop_gradient(z_q - z)


def perplexity(idx, codebook_size: int):
    """exp(entropy) of the empirical code histogram over ALL indices in
    idx — the standard codebook-usage diagnostic (== codebook_size at
    uniform usage, == 1 at total collapse)."""
    oh = jax.nn.one_hot(idx.reshape(-1), codebook_size, dtype=jnp.float32)
    p = jnp.mean(oh, axis=0)
    return jnp.exp(-jnp.sum(p * jnp.log(p + 1e-10)))
