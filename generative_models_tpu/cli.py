"""CLI — `python -m generative_models_tpu --variant wgangp --epochs 25`.

The reference has no CLI (notebook cells / `__main__` usage only,
SURVEY.md §6); this is the framework's single entry point for training
any variant.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

from generative_models_tpu.config import Config, VARIANTS, variant_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="generative_models_tpu",
        description="TPU-native generative-model tutorial zoo trainer")
    p.add_argument("--variant", default="nsgan", choices=sorted(VARIANTS))
    # Every Config field becomes a flag; variant overrides apply first,
    # explicit flags win.
    for f in dataclasses.fields(Config):
        if f.name == "variant":
            continue
        arg = "--" + f.name.replace("_", "-")
        # Derive the flag type from the field ANNOTATION, not the default:
        # Optional[int] fields defaulting to None (epochs) must still parse
        # as int, or `--epochs 1` would smuggle the string '1' into the
        # trainer (ADVICE r1, high).
        ann = str(f.type)
        if "bool" in ann or isinstance(f.default, bool):
            p.add_argument(arg, dest=f.name, default=None,
                           action=argparse.BooleanOptionalAction)
        else:
            typ = int if "int" in ann else float if "float" in ann else str
            p.add_argument(arg, dest=f.name, default=None, type=typ)
    p.add_argument("--ckpt", default=None, help="checkpoint path "
                   "(save at end; with --resume, restore first)")
    p.add_argument("--reflow-from", default=None, metavar="CKPT",
                   help="flow only: reflow / 2-rectified flow (Liu "
                        "2022 §3.2). Load a trained flow checkpoint as "
                        "the TEACHER, generate (noise, sample) "
                        "couplings from its ODE, and train THIS run on "
                        "them (sets --flow-reflow; student starts at "
                        "the teacher weights unless "
                        "--reflow-fresh-init). Straightens the ODE for "
                        "1-2 step sampling (train/reflow.py)")
    p.add_argument("--reflow-pairs", type=int, default=60000,
                   help="teacher couplings to generate for the train "
                        "split (plus 2048 held-out test pairs)")
    p.add_argument("--reflow-fresh-init", action="store_true",
                   help="random-init the student instead of starting "
                        "from the teacher weights")
    p.add_argument("--reflow-gen-steps", type=int, default=50,
                   help="teacher ODE steps when generating couplings")
    p.add_argument("--reflow-gen-solver", default="heun",
                   choices=("euler", "heun"),
                   help="teacher ODE solver when generating couplings")
    p.add_argument("--vq-from", default=None, metavar="CKPT",
                   help="vqprior only: two-stage training (Oord 2017 "
                        "§3.3). Load a trained vqvae checkpoint as the "
                        "FROZEN tokenizer (sets --vq-freeze-tokenizer) "
                        "and train only the latent prior on its tokens "
                        "(train/vq.py). Without it, vqprior trains "
                        "tokenizer + prior jointly")
    p.add_argument("--echo-every", type=int, default=100)
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (the zoo's sanitizer: "
                        "fail loudly at the op that produced a NaN)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() for "
                        "multi-host DCN runs (args from TPU env)")
    p.add_argument("--score-samples", action="store_true",
                   help="train a held-out classifier and report "
                        "IS-style sample-quality scores at the end")
    p.add_argument("--sample-only", action="store_true",
                   help="no training: restore --ckpt and write a "
                        "sample grid (the reference's post-training "
                        "generate_images call)")
    p.add_argument("--export-sampler", default=None, metavar="PATH",
                   help="after training (or from --ckpt with "
                        "--sample-only), serialize the sampler as a "
                        "self-contained StableHLO artifact: "
                        "seed -> [sample_n, 784] images, params baked "
                        "in, loadable without this framework "
                        "(utils/export.py)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    overrides = {
        f.name: getattr(args, f.name)
        for f in dataclasses.fields(Config)
        if f.name != "variant" and getattr(args, f.name, None) is not None
    }
    cfg = variant_config(args.variant, **overrides)

    import jax
    devices = None  # default: jax.devices() inside the mesh builders
    if args.multihost:
        from generative_models_tpu.parallel.multihost import init_multihost
        devices = init_multihost()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    mesh = None
    if cfg.tp > 1:
        from generative_models_tpu.parallel.tp import make_mesh_2d
        mesh = make_mesh_2d(cfg.dp, cfg.tp, devices=devices)
    elif cfg.dp > 1:
        from generative_models_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(cfg.dp, devices=devices)

    from generative_models_tpu.train.trainer import Trainer
    from generative_models_tpu.utils.checkpoint import exists as ckpt_exists
    data = None
    teacher = None
    if args.reflow_from:
        if args.sample_only:
            print("--sample-only samples a trained model: pass the "
                  "student's --ckpt, not --reflow-from", file=sys.stderr)
            return 2
        from generative_models_tpu.train.reflow import (
            build_reflow_data,
            load_teacher_params,
        )
        cfg = cfg.replace(flow_reflow=True)  # validates variant == flow
        teacher = load_teacher_params(args.reflow_from, cfg)
        data = build_reflow_data(
            teacher, cfg, n_train=args.reflow_pairs,
            gen_steps=args.reflow_gen_steps,
            gen_solver=args.reflow_gen_solver)
        print(f"reflow: {args.reflow_pairs} teacher couplings from "
              f"{args.reflow_from} ({args.reflow_gen_solver} "
              f"S={args.reflow_gen_steps})")
    vq_params = None
    if args.vq_from:
        if args.sample_only:
            print("--sample-only samples a trained model: pass the "
                  "prior run's --ckpt, not --vq-from", file=sys.stderr)
            return 2
        from generative_models_tpu.train.vq import load_vqvae_params
        cfg = cfg.replace(vq_freeze_tokenizer=True)  # vqprior-only guard
        vq_params = load_vqvae_params(args.vq_from, cfg)
        print(f"vqprior: frozen tokenizer from {args.vq_from}")
    t = Trainer(config=cfg, data=data, mesh=mesh)
    if teacher is not None and not args.reflow_fresh_init:
        from generative_models_tpu.train.reflow import init_student
        init_student(t, teacher)
    if vq_params is not None:
        from generative_models_tpu.train.vq import init_prior_with_vqvae
        init_prior_with_vqvae(t, vq_params)
    if args.sample_only:
        if not args.ckpt or not ckpt_exists(args.ckpt, cfg.ckpt_backend):
            print("--sample-only needs an existing --ckpt", file=sys.stderr)
            return 2
        t.load_model(args.ckpt)
        path = t.generate_images(
            tag=f"samples_step{int(t.state['step']):06d}")
        out = {"variant": cfg.variant, "step": int(t.state["step"]),
               "samples": path}
        if args.export_sampler:
            out["sampler"] = _export_sampler(t, args.export_sampler)
        print(json.dumps(out))
        return 0
    if args.ckpt and cfg.resume and ckpt_exists(args.ckpt, cfg.ckpt_backend):
        t.load_model(args.ckpt)
        print(f"resumed from {args.ckpt} at step "
              f"{int(t.state['step'])}")

    run_dir = os.path.join(cfg.out_dir, cfg.variant)
    os.makedirs(run_dir, exist_ok=True)

    if cfg.profile:
        import jax
        jax.profiler.start_trace(os.path.join(run_dir, "trace"))

    t.train(num_epochs=cfg.epochs,
            steps=None if cfg.epochs else cfg.steps,
            log_path=os.path.join(run_dir, "metrics.jsonl"),
            echo_every=args.echo_every,
            ckpt_path=args.ckpt)  # periodic when cfg.ckpt_every > 0

    if cfg.profile:
        import jax
        jax.profiler.stop_trace()

    sps = t.steps_done / t.wall_time
    eval_metrics = t.evaluate("test", max_batches=10)
    print(json.dumps({
        "variant": cfg.variant,
        "steps": t.steps_done,
        "wall_s": round(t.wall_time, 3),
        "steps_per_sec": round(sps, 2),
        "eval": {k: round(v, 4) for k, v in eval_metrics.items()},
    }))
    t.generate_images(tag="final")
    t.viz_loss()
    if args.score_samples:
        from generative_models_tpu.utils.quality import (
            classifier_accuracy,
            fid_score,
            score_samples,
            train_classifier,
        )
        # train_split_f32 decodes uint8-resident storage; feeding raw
        # t.x_train would train the classifier at 255x model scale
        xs, ys = t.train_split_f32()
        clf = train_classifier(xs, ys)
        acc = classifier_accuracy(clf, t.x_test, t.y_test)
        samples = t.sample(1024)
        scores = score_samples(clf, samples)
        scores["fid"] = fid_score(clf, t.x_test[:1024], samples)
        print(json.dumps({"classifier_test_acc": round(acc, 4),
                          **{k: round(v, 4) for k, v in scores.items()}}))
    # checkpoint FIRST: an export failure must never cost the run
    if args.ckpt:
        print("saved:", t.save_model(args.ckpt))
    if args.export_sampler:
        print("exported:", _export_sampler(t, args.export_sampler))
    return 0


def _export_sampler(t, path: str) -> str:
    from generative_models_tpu.utils.export import save_sampler
    return save_sampler(path, t.spec, t.cfg, t.generator_params,
                        t.cfg.sample_n)


if __name__ == "__main__":
    sys.exit(main())
