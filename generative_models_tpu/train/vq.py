"""Two-stage VQ training wiring (Oord et al. 2017 §3.3 protocol).

The `vqprior` variant trains JOINTLY by default (losses/vqprior.py);
this module implements the paper's two-stage alternative, mirroring
train/reflow.py's teacher-loading pattern:

  1. Train stage 1:   python train.py --variant vqvae --ckpt runs/vq
  2. Train the prior: python train.py --variant vqprior \
                          --vq-from runs/vq --steps ...

`--vq-from` (cli.py) loads the trained `vqvae` checkpoint into the
prior run's frozen `params["vqvae"]` subtree and sets
`Config.vq_freeze_tokenizer` — the loss stop-gradients the subtree, so
its gradients are identically zero and Adam leaves it bit-exact
(pinned by tests/test_vqvae.py). The measured joint-vs-two-stage
comparison lives in benchmarks/vq_ablation.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from generative_models_tpu.config import Config


def load_vqvae_params(path: str, cfg: Config):
    """Restore a `vqvae` checkpoint's params. `cfg` must describe the
    tokenizer's shapes (arch/vq_* fields); prior-only fields are
    ignored — the state template is net-shaped."""
    from generative_models_tpu.losses.registry import get_variant
    from generative_models_tpu.train import step as step_lib
    from generative_models_tpu.utils.checkpoint import restore

    spec = get_variant("vqvae")
    vq_cfg = cfg.replace(variant="vqvae", vq_freeze_tokenizer=False)
    template = step_lib.init_state(spec, vq_cfg, jax.random.PRNGKey(0))
    state = restore(path, template, cfg.ckpt_backend)
    return state.get("ema", state["params"])


def init_prior_with_vqvae(trainer, vq_params) -> None:
    """Overwrite the prior run's `params["vqvae"]` subtree with the
    trained stage-1 weights. Optimizer state needs no rebuild: optax
    init depends only on shapes, and the frozen subtree's zero
    gradients keep its Adam moments at exactly zero."""
    st = dict(trainer.state)
    p = dict(st["params"])
    p["vqvae"] = jax.tree_util.tree_map(jnp.asarray, vq_params)
    st["params"] = p
    if "ema" in st:
        st["ema"] = dict(st["ema"], vqvae=p["vqvae"])
    trainer.state = st
