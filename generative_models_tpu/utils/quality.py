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
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
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
