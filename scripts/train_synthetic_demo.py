"""Train a registration model from scratch on procedural scenes (real TPU).

End-to-end demonstration that the full stack learns: generate structured
multi-view scenes -> train a DiT with the Pallas attention kernels
(fwd+bwd) -> evaluate registration recall on held-out scenes with the full
ODE sampler + Kabsch + metric suite. Writes an orbax checkpoint and a JSON
summary.

Round-2 capability levers (docs/synthetic_training.md):
  --yaw-aug        yaw-only per-part/global rotations (the reference's
                   DEFAULT augmentation regime, ref dataset.py:321,808-809)
  --t-scheme late_heavy   concentrate timestep sampling at t->1
  --pose-loss-weight      auxiliary Kabsch pose loss (registration.py)
  --eval-rotated   additionally score the yaw-rotated val protocol

Usage: timeout 5400 python scripts/train_synthetic_demo.py \
           [--steps 4000] [--scenes 400] [--out demo_run]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

logging.basicConfig(level=logging.INFO, stream=sys.stderr)
logger = logging.getLogger("train_synthetic_demo")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--scenes", type=int, default=400)
    ap.add_argument("--points-per-view", type=int, default=2048)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--overlap", default="medium", choices=["medium", "high"],
                    help="view overlap regime: 'high' crops ~90%%-overlapping "
                         "views (easy correspondence), 'medium' the default")
    ap.add_argument("--out", default="demo_run")
    ap.add_argument("--data-root", default="",
                    help="shared dataset dir (default <out>/data); lets "
                         "ablation arms train on identical scenes")
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--lr-decay-steps", default="",
                    help="comma list of absolute step milestones where lr "
                         "halves (MultiStepLR in steps instead of the "
                         "reference's epoch milestones, which never trigger "
                         "at synthetic-run scale); empty = constant lr")
    ap.add_argument("--batch-tokens", type=int, default=32_768)
    ap.add_argument("--t-scheme", default="u_shaped",
                    choices=["u_shaped", "logit_normal", "mode", "uniform",
                             "late_heavy"])
    ap.add_argument("--pose-loss-weight", type=float, default=0.0)
    ap.add_argument("--yaw-aug", action="store_true",
                    help="yaw-only rotations with 5 deg roll/pitch (the "
                         "reference default augmentation regime)")
    ap.add_argument("--features", default="geometric",
                    choices=["geometric", "zero", "spinnet"],
                    help="condition descriptors: geometric = eigenvalue/"
                         "curvature local features; spinnet = MiniSpinNet "
                         "descriptors (VERDICT item 5 — the reference's "
                         "conditioning path, extract_sample_features.py:584)")
    ap.add_argument("--spinnet-checkpoint", default="",
                    help="torch .pth for spinnet features (random init if "
                         "empty)")
    ap.add_argument("--spinnet-des-r", type=float, default=1.0,
                    help="descriptor radius in scene meters")
    ap.add_argument("--prefetch", type=int, default=4,
                    help="loader prefetch depth (0 = load batches inline; "
                         "use 0 if the remote-TPU tunnel stalls during the "
                         "first compile with a live prefetch thread)")
    ap.add_argument("--save-every", type=int, default=0,
                    help="checkpoint every N steps (0 = only at the end)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from <out>/ckpts/last if present")
    ap.add_argument("--gen-only", action="store_true",
                    help="stop after the dataset (scenes + feature sidecars "
                         "+ generation_params.json) is ready — lets an "
                         "orchestrator bound datagen (e.g. the on-TPU "
                         "SpinNet sidecar pass) with its own timeout")
    ap.add_argument("--eval-only", default="", help="checkpoint dir to eval")
    ap.add_argument("--eval-splits", default="val",
                    help="comma-separated splits to evaluate (train,val)")
    ap.add_argument("--eval-rotated", action="store_true",
                    help="also evaluate val under train-style yaw rotations "
                         "(augment_eval protocol)")
    ap.add_argument("--eval-rotated-decompose", action="store_true",
                    help="with --eval-rotated: additionally evaluate the "
                         "global_only / parts_only decomposition of the "
                         "rotated protocol, attributing any rotated-vs-"
                         "unrotated recall difference to the scene frame "
                         "vs the per-part pose posterior (run-8 inversion "
                         "diagnostic, docs/synthetic_training.md)")
    ap.add_argument("--eval-steps", type=int, default=10,
                    help="ODE steps at eval")
    ap.add_argument("--eval-limit", type=int, default=0,
                    help="cap val-split evals to N strided scenes "
                         "(DatasetConfig.limit_val_samples; 0 = all). Keeps "
                         "the 4-protocol eval tractable at 12k-scene scale")
    ap.add_argument("--eval-schedule", default="uniform",
                    help="ODE timestep grid at eval: uniform | cosine | "
                         "power:<k> (core/sampler.make_schedule)")
    ap.add_argument("--eval-generations", type=int, default=1,
                    help=">1 applies the reference benchmark protocol "
                         "(test_script_example.sh): best-of-N + "
                         "rigidity-selected sections")
    ap.add_argument("--eval-icp", action="store_true",
                    help="measure errors through the reference's "
                         "available-but-off ICP protocol (ref eval/metrics.py"
                         ":177-261 use_icp=True)")
    ap.add_argument("--eval-icp-refine", action="store_true",
                    help="post-refine predicted poses with batched trimmed "
                         "ICP against the anchor before scoring "
                         "(registration.refine_poses_icp; beyond-reference)")
    ap.add_argument("--eval-icp-trim", type=float, default=0.7,
                    help="trimmed-ICP correspondence fraction for "
                         "--eval-icp-refine")
    ap.add_argument("--eval-icp-restarts", type=int, default=1,
                    help="yaw-restart count for --eval-icp-refine (>1 tries "
                         "K yaw-rotated ICP inits per part, keeps the lowest "
                         "trimmed residual)")
    args = ap.parse_args(argv)

    # Remote-TPU tunnel: initialize the backend and run the first device op
    # on the MAIN thread before any loader prefetch thread touches the
    # device — client init from a daemon thread can wedge the tunnel session
    # (observed as a futex-blocked process with no tunnel connection).
    logger.info("devices: %s", jax.devices())
    jax.block_until_ready(jax.numpy.zeros(8))

    from rap_tpu.data import BatchLoader, DatasetConfig, LoaderConfig, PointCloudDataset
    from rap_tpu.data.synthetic_scenes import generate_dataset
    from rap_tpu.eval.runner import evaluate_split
    from rap_tpu.models import DiTConfig
    from rap_tpu.models.dit import init_dit_params, param_count
    from rap_tpu.registration import RPFConfig
    from rap_tpu.train import (
        OptimizerConfig, TrainState, build_optimizer, make_train_step,
    )
    from rap_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from rap_tpu.train.tracking import ExperimentTracker

    out = Path(args.out)
    data_root = Path(args.data_root) if args.data_root else out / "data"
    gen_params = {
        "scenes": args.scenes,
        "points_per_view": args.points_per_view,
        "overlap": args.overlap,
        "views": args.views,
        "features": args.features,
    }
    params_file = data_root / "generation_params.json"
    names = None
    if not (data_root / "data_split" / "train.txt").exists():
        logger.info("generating %d scenes ...", args.scenes)
        names = generate_dataset(
            data_root, n_scenes=args.scenes, n_views=args.views,
            max_points_per_view=args.points_per_view,
            keep_radius_frac=(0.9, 0.98) if args.overlap == "high" else (0.55, 0.8),
            features=args.features == "geometric",
        )
    elif not params_file.exists():
        # generation_params.json is written LAST: scenes exist but the
        # feature-sidecar pass was interrupted (e.g. a bounded datagen
        # phase timed out mid-SpinNet-extraction). Redo the idempotent
        # sidecar pass over the recorded splits instead of silently
        # training on mixed features.
        names = []
        for split in ("train.txt", "val.txt"):
            f = data_root / "data_split" / split
            if f.exists():
                names += [ln.strip() for ln in f.read_text().splitlines() if ln.strip()]
        logger.warning(
            "dataset at %s has splits but no generation_params.json — "
            "finishing the %s feature sidecars for %d scenes",
            data_root, args.features, len(names),
        )
    if names is not None:
        if args.features == "spinnet":
            # overwrite the geometric sidecars with MiniSpinNet descriptors:
            # each view is its own context cloud, every point a keypoint
            # (the reference conditions the flow on exactly these,
            # extract_sample_features.py:584-617)
            from rap_tpu.spinnet import build_feature_extractor
            from rap_tpu.utils import ply as plyio

            fx = build_feature_extractor(args.spinnet_checkpoint)
            t_fx = time.time()
            n_done = n_skip = 0
            for name in names:
                d = data_root / name
                for ply_path in sorted(d.glob("*.ply")):
                    sidecar = d / f"features_{ply_path.stem}.npy"
                    if sidecar.exists():  # resumable after a bounded timeout
                        n_skip += 1
                        continue
                    pts = plyio.read_ply(ply_path, read_faces=False)["points"]
                    feats = fx(pts, pts, args.spinnet_des_r)
                    np.save(sidecar, feats)
                    n_done += 1
            logger.info("spinnet features: %d views (%d already present), %.0fs",
                        n_done, n_skip, time.time() - t_fx)
        params_file.write_text(json.dumps(gen_params))
        logger.info("wrote %d samples", len(names))
    else:
        existing = (
            json.loads(params_file.read_text()) if params_file.exists() else None
        )
        if existing != gen_params:
            logger.warning(
                "REUSING existing dataset at %s generated with %s — the "
                "requested parameters %s are IGNORED (delete the dir to "
                "regenerate)", data_root, existing, gen_params,
            )
        else:
            logger.info("reusing existing dataset at %s", data_root)
    if args.gen_only:
        logger.info("--gen-only: dataset ready, exiting")
        return

    model = DiTConfig(num_layers=args.layers)   # 512-dim, 8 heads, bf16
    pipe = RPFConfig(
        model=model, inference_sampling_steps=args.eval_steps,
        rigidity_forcing=True, timestep_sampling=args.t_scheme,
        pose_loss_weight=args.pose_loss_weight,
    )
    ds_kw = dict(data_path=str(data_root), dataset_name="synth",
                 load_features=args.features != "zero",
                 yaw_augmentation=args.yaw_aug,
                 limit_val_samples=args.eval_limit)
    train_ds = PointCloudDataset(DatasetConfig(split="train", **ds_kw))
    val_ds = PointCloudDataset(DatasetConfig(split="val", **ds_kw))
    logger.info("train %d samples, val %d", len(train_ds), len(val_ds))
    if len(train_ds) == 0:
        raise RuntimeError(
            f"empty train split under {data_root} — generation produced too "
            "few scenes (raise --scenes) or the dataset dir is corrupt"
        )

    params = init_dit_params(jax.random.key(0), model)
    opt_cfg = OptimizerConfig(name="muon", lr=args.lr, grad_clip=0.5)
    steps_per_epoch = max(len(train_ds) // 8, 1)
    if args.lr_decay_steps:
        opt_cfg = dataclasses.replace(
            opt_cfg,
            lr_milestones=tuple(
                int(s) for s in args.lr_decay_steps.split(",")
            ),
        )
        steps_per_epoch = 1  # milestones are absolute steps
    tx = build_optimizer(opt_cfg, steps_per_epoch=steps_per_epoch)
    state = TrainState.create(params, tx, jax.random.key(1))
    logger.info("model: %.1fM params", param_count(params) / 1e6)

    if not args.eval_only:
        total = 0
        last_dir = out / "ckpts" / "last"
        from rap_tpu.train.checkpoint import resolve_checkpoint_dir
        if args.resume and (
            resolve_checkpoint_dir(last_dir) / "rap_metadata.json"
        ).exists():
            state = restore_checkpoint(last_dir, state)
            total = int(np.asarray(state.step))
            logger.info("resumed at step %d", total)
        loader = BatchLoader(
            [train_ds],
            LoaderConfig(max_points_per_batch=args.batch_tokens, shuffle=True,
                         prefetch=args.prefetch),
        )
        step_fn = make_train_step(pipe, tx, remat=True)
        tracker = ExperimentTracker(out / "ckpts", config=None, use_wandb=False,
                                    snapshot=False)
        epoch = 0
        t_start = time.time()
        done_at_start = total
        while total < args.steps:
            for batch, names, _ in loader.epoch(epoch):
                state, metrics = step_fn(state, batch)
                total += 1
                if total % 100 == 0:
                    tracker.log(total, metrics)
                if args.save_every and total % args.save_every == 0:
                    save_checkpoint(last_dir, state, {"steps": total})
                if total >= args.steps:
                    break
            epoch += 1
        jax.block_until_ready(state.params)
        dt = time.time() - t_start
        logger.info("trained %d steps in %.0fs (%.2f steps/s)",
                    total - done_at_start, dt, (total - done_at_start) / max(dt, 1e-9))
        save_checkpoint(out / "ckpts" / "final", state, {"steps": total})
        tracker.finish()
    else:
        state = restore_checkpoint(Path(args.eval_only), state)

    # ---- eval: full sampling + pose recovery + recall -----------------------
    def run_eval(ds, tag):
        return evaluate_split(
            state.params, pipe, ds,
            batch_tokens=args.batch_tokens, num_steps=args.eval_steps, tag=tag,
            schedule=args.eval_schedule,
            n_generations=args.eval_generations, use_icp=args.eval_icp,
            icp_refine=args.eval_icp_refine,
            icp_refine_trim=args.eval_icp_trim,
            icp_refine_restarts=args.eval_icp_restarts,
        )

    summary = {
        "steps": args.steps if not args.eval_only else "eval-only",
        "config": {k: v for k, v in vars(args).items()
                   if k not in ("out", "eval_only")},
    }
    for split in args.eval_splits.split(","):
        ds = train_ds if split == "train" else val_ds
        summary[split] = run_eval(ds, f"{split} scenes")
    if args.eval_rotated:
        rot_ds = PointCloudDataset(
            DatasetConfig(split="val", augment_eval=True, **ds_kw)
        )
        summary["val_rotated"] = run_eval(rot_ds, "val scenes (rotated)")
        if args.eval_rotated_decompose:
            for mode in ("global_only", "parts_only"):
                mds = PointCloudDataset(DatasetConfig(
                    split="val", augment_eval=True,
                    augment_eval_mode=mode, **ds_kw,
                ))
                summary[f"val_rotated_{mode}"] = run_eval(
                    mds, f"val scenes (rotated:{mode})"
                )
    out.mkdir(parents=True, exist_ok=True)  # eval-only: out may not exist yet
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
