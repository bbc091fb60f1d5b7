"""Reflow / 2-rectified flow (Liu, Gong & Liu 2022 "Flow Straight and
Fast" §3.2) — distill a trained flow-matching model into one whose ODE
is straight enough for 1-2 step sampling.

Beyond-reference capability (the reference zoo is VAEs and GANs only,
SURVEY.md §3.2). The rectified-flow observation: training the SAME
velocity-regression objective on the teacher's own couplings
(x0, ODE(x0)) instead of independently paired (noise, data) provably
reduces the transport cost and empirically straightens trajectories,
so a reflowed model tolerates S=1-2 Euler steps where the base flow
needs S>=8 (measured: benchmarks/reflow_ablation.py ->
BASELINE.md's reflow section). That makes it the TPU serving capstone:
cost per image drops to ONE net eval with measured quality.

Pipeline (all on-device; one host loop over fixed-width chunks):

  1. `load_teacher_params` — restore a trained flow checkpoint
     (EMA weights when present — the sampling convention).
  2. `build_reflow_data` — integrate the teacher ODE from prior draws,
     store rows [x1_hat in [0,1] | x0 raw] of width 2*image_dim
     (losses/flow.py::generate_pairs).
  3. Train the student with Config.flow_reflow=True: the flow loss
     reads the paired x0 from the batch instead of drawing fresh
     noise. Same net, same Trainer, same DP/export/viz paths.
  4. `init_student` — start the student at the teacher's weights
     (rectified-flow practice: reflow is a finetune, not a fresh fit).

CLI: `python train.py --variant flow --reflow-from runs/flow/teacher
--steps 20000` (cli.py wires 1-4; --reflow-fresh-init opts out of 4).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.config import Config


def load_teacher_params(path: str, cfg: Config):
    """Restore a flow checkpoint and return its sampling params (EMA
    when the checkpoint carries one). `cfg` must describe the teacher's
    net (arch/hidden/time dims); reflow-only fields are ignored — the
    state template is net-shaped, not objective-shaped."""
    from generative_models_tpu.losses.registry import get_variant
    from generative_models_tpu.train import step as step_lib
    from generative_models_tpu.utils.checkpoint import restore

    spec = get_variant("flow")
    template = step_lib.init_state(spec, cfg, jax.random.PRNGKey(0))
    state = restore(path, template, cfg.ckpt_backend)
    return state.get("ema", state["params"])


def build_reflow_data(teacher_params, cfg: Config, n_train: int = 60000,
                      n_test: int = 2048, seed: Optional[int] = None,
                      gen_steps: int = 50, gen_solver: str = "heun",
                      batch_size: int = 2048) -> Dict[str, np.ndarray]:
    """Teacher-coupling dataset in the Trainer's data-dict form.

    Generation uses (gen_steps, gen_solver) — default heun/50, the
    measured quality winner (benchmarks/flow_steps_ablation.json) —
    independent of the student's serving-time flow_sample_steps.
    Labels are zeros: the coupling is unconditional (config.py refuses
    flow_reflow + ddpm_cond). The test split holds out fresh teacher
    couplings so `evaluate("test")` reports the distillation loss on
    unseen pairs; REAL-data quality scoring stays with the quality
    harness (benchmarks/reflow_ablation.py scores FID against real
    test digits)."""
    from generative_models_tpu.losses.flow import generate_pairs

    gen_cfg = cfg.replace(flow_sample_steps=gen_steps,
                          flow_solver=gen_solver)
    seed = cfg.seed if seed is None else seed
    # fold the split role into the key so train/test draws never overlap
    k_train = jax.random.fold_in(jax.random.PRNGKey(seed), 0)
    k_test = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
    x_train = np.asarray(generate_pairs(teacher_params, k_train, n_train,
                                        gen_cfg, batch_size=batch_size))
    x_test = np.asarray(generate_pairs(teacher_params, k_test, n_test,
                                       gen_cfg, batch_size=batch_size))
    return {
        "x_train": x_train,
        "y_train": np.zeros((n_train,), np.int32),
        "x_test": x_test,
        "y_test": np.zeros((n_test,), np.int32),
    }


def init_student(trainer, teacher_params) -> None:
    """Start the student at the teacher's weights with a FRESH
    optimizer (reflow finetunes the map; Adam moments from the
    teacher's run would encode the old coupling's curvature)."""
    from generative_models_tpu.train.optim import make_tx

    st = dict(trainer.state)
    st["params"] = jax.tree_util.tree_map(jnp.asarray, teacher_params)
    st["opt"] = make_tx(trainer.cfg, trainer.cfg.g_lr).init(st["params"])
    if "ema" in st:
        st["ema"] = st["params"]
    trainer.state = st
