"""Sample-quality scoring (BASELINE.md: "optional MNIST-classifier
score").

A small MLP classifier is trained on the real train split (a few
hundred jitted steps, seconds on any backend); generated samples are
scored with Inception-Score-style statistics under that classifier:

- ``confidence``: mean max class probability (sharpness),
- ``class_entropy``: entropy of the MEAN predicted class distribution
  (diversity; ln(10) ≈ 2.303 is uniform),
- ``is_score``: exp(E_x[KL(p(y|x) ‖ p(y))]) — the IS formula with the
  zoo classifier standing in for Inception.

Mode collapse shows up as high confidence + low class_entropy.

`fid_score` complements them with a Fréchet distance in the same
classifier's hidden feature space (FID with the zoo classifier
standing in for Inception) — unlike the IS-style score it compares
against REAL data statistics, so it also catches distribution drift
that keeps class balance.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from generative_models_tpu.models.mlp import mlp_apply_xla, mlp_init


def train_classifier(x_train, y_train, rng=None, steps: int = 500,
                     batch: int = 256, hidden: int = 128,
                     num_classes: int = 10):
    """Returns classifier params (pure pytree MLP 784->hidden->10)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    p_rng, d_rng = jax.random.split(rng)
    params = mlp_init(p_rng, [x_train.shape[-1], hidden, num_classes])
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss_fn(p, xb, yb):
        logits = mlp_apply_xla(p, xb, hidden_act="relu", out_act="none")
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, yb))

    @jax.jit
    def run(params, opt, xs, ys, key):
        def body(carry, i):
            params, opt = carry
            k = jax.random.fold_in(key, i)
            idx = jax.random.randint(k, (batch,), 0, xs.shape[0])
            g = jax.grad(loss_fn)(params, jnp.take(xs, idx, axis=0),
                                  jnp.take(ys, idx, axis=0))
            updates, opt = tx.update(g, opt, params)
            params = optax.apply_updates(params, updates)
            return (params, opt), None
        (params, opt), _ = jax.lax.scan(body, (params, opt),
                                        jnp.arange(steps))
        return params

    return run(params, opt, jnp.asarray(x_train), jnp.asarray(y_train),
               d_rng)


def classifier_accuracy(params, x, y) -> float:
    logits = mlp_apply_xla(params, jnp.asarray(x), hidden_act="relu",
                           out_act="none")
    return float(jnp.mean(jnp.argmax(logits, -1) == jnp.asarray(y)))


def _features(params, x):
    """Penultimate-layer (hidden) activations of the zoo classifier —
    the feature space for the FID-style metric."""
    return mlp_apply_xla(params[:-1], jnp.asarray(x), hidden_act="relu",
                         out_act="relu")


def fid_score(params, real, fake, eps: float = 1e-6) -> float:
    """Fréchet distance between real and generated samples in the zoo
    classifier's hidden feature space — the FID formula (Heusel 2017)
    with the held-out MLP standing in for Inception, like `is_score`
    stands in for IS:

        ||mu_r - mu_f||^2 + tr(C_r + C_f - 2 (C_r C_f)^{1/2})

    The matrix square root is computed on the symmetrized product via
    eigendecomposition (the features live in a ~128-dim space, so this
    is exact and cheap; negative eigenvalues from fp noise are
    clamped). Lower is better; 0 = matched feature statistics.
    """
    fr = np.asarray(_features(params, real), dtype=np.float64)
    ff = np.asarray(_features(params, fake), dtype=np.float64)
    mu_r, mu_f = fr.mean(0), ff.mean(0)
    c_r = np.cov(fr, rowvar=False) + eps * np.eye(fr.shape[1])
    c_f = np.cov(ff, rowvar=False) + eps * np.eye(ff.shape[1])
    # tr((C_r C_f)^{1/2}) via the symmetric form:
    #   (C_r C_f)^{1/2} similar to  C_r^{1/2} C_f C_r^{1/2}  (PSD)
    w_r, v_r = np.linalg.eigh(c_r)
    sq_r = (v_r * np.sqrt(np.clip(w_r, 0, None))) @ v_r.T
    w = np.linalg.eigvalsh(sq_r @ c_f @ sq_r)
    tr_sqrt = np.sum(np.sqrt(np.clip(w, 0, None)))
    d2 = float(np.sum((mu_r - mu_f) ** 2)
               + np.trace(c_r) + np.trace(c_f) - 2.0 * tr_sqrt)
    return max(d2, 0.0)


def score_samples(params, samples) -> Dict[str, float]:
    logits = mlp_apply_xla(params, jnp.asarray(samples), hidden_act="relu",
                           out_act="none")
    p = jax.nn.softmax(logits, axis=-1)
    p_mean = jnp.mean(p, axis=0)
    eps = 1e-10
    kl = jnp.sum(p * (jnp.log(p + eps) - jnp.log(p_mean + eps)), axis=-1)
    return {
        "confidence": float(jnp.mean(jnp.max(p, axis=-1))),
        "class_entropy": float(-jnp.sum(p_mean * jnp.log(p_mean + eps))),
        "is_score": float(jnp.exp(jnp.mean(kl))),
    }
