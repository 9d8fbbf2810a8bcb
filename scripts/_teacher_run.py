"""Teacher training driver (round-2 reflow study), probe-shaped.

Same recipe as scripts/train_synthetic_demo.py with the run-8 levers
(yaw-aug, late-heavy t, pose loss 0.1), structured exactly like the
minimal driver that runs reliably through the remote-TPU tunnel: every
phase logs immediately with flushing so a stall is visible at the step
where it happens.

Usage: timeout 1500 python scripts/_teacher_run.py --steps 2500 \
           --data-root runs/teacher/data --out runs/teacher
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--out", default="runs/teacher")
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--batch-tokens", type=int, default=32_768)
    ap.add_argument("--save-every", type=int, default=500)
    ap.add_argument("--eval", action="store_true", default=True)
    ap.add_argument("--init-npz", default="",
                    help="warm-start params from a save_params_npz export "
                         "(e.g. the committed reflow student) instead of "
                         "random init. NOTE: npz exports are bf16-cast "
                         "params only — optimizer state starts fresh; this "
                         "is NOT equivalent to resuming via "
                         "restore_checkpoint (full-precision params + "
                         "optimizer moments + RNG)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    # Force backend init + first device op on the MAIN thread before any
    # loader worker thread touches the device (tunnel-client init from a
    # daemon thread has been observed to wedge in this environment).
    log("devices:", jax.devices())
    jnp.zeros((8, 8)).block_until_ready()
    log("warmup ok")

    from rap_tpu.data import (
        BatchLoader, DatasetConfig, LoaderConfig, PointCloudDataset,
    )
    from rap_tpu.models import DiTConfig
    from rap_tpu.models.dit import init_dit_params, param_count
    from rap_tpu.registration import RPFConfig
    from rap_tpu.train import (
        OptimizerConfig, TrainState, build_optimizer, make_train_step,
    )
    from rap_tpu.train.checkpoint import save_checkpoint

    out = Path(args.out)
    model = DiTConfig(num_layers=args.layers)
    pipe = RPFConfig(
        model=model, inference_sampling_steps=10, rigidity_forcing=True,
        timestep_sampling="late_heavy", pose_loss_weight=0.1,
    )
    ds_kw = dict(data_path=args.data_root, dataset_name="synth",
                 load_features=True, yaw_augmentation=True)
    train_ds = PointCloudDataset(DatasetConfig(split="train", **ds_kw))
    val_ds = PointCloudDataset(DatasetConfig(split="val", **ds_kw))
    log("datasets:", len(train_ds), "train /", len(val_ds), "val")

    loader = BatchLoader(
        [train_ds],
        LoaderConfig(max_points_per_batch=args.batch_tokens, shuffle=True,
                     prefetch=0),
    )
    first = next(iter(loader.epoch(0)))[0]
    log("first batch ready", first.points.shape)
    tx = build_optimizer(
        OptimizerConfig(name="muon", lr=args.lr, grad_clip=0.5),
        steps_per_epoch=max(len(train_ds) // 8, 1),
    )
    params = init_dit_params(jax.random.key(0), model)
    if args.init_npz:
        from rap_tpu.train.checkpoint import load_params_npz

        params = load_params_npz(args.init_npz, params)
        log("warm-started params from", args.init_npz)
    state = TrainState.create(params, tx, jax.random.key(1))
    step_fn = make_train_step(pipe, tx, remat=True)
    log(f"model: {param_count(params) / 1e6:.1f}M params")
    t0 = time.time()
    state, metrics = step_fn(state, first)
    jax.block_until_ready(state.params)
    log(f"first step (compile): {time.time() - t0:.1f}s "
        f"loss={float(metrics['loss']):.4f}")

    mfile = (out / "ckpts" / "metrics.jsonl")
    mfile.parent.mkdir(parents=True, exist_ok=True)
    mlog = open(mfile, "a")
    total, epoch, t0 = 1, 1, time.time()
    while total < args.steps:
        for batch, names, _ in loader.epoch(epoch):
            state, metrics = step_fn(state, batch)
            total += 1
            if total <= 3 or total % 100 == 0:
                loss = float(metrics["loss"])
                log(f"step {total} loss={loss:.4f} "
                    f"({total / (time.time() - t0):.2f} steps/s)")
                mlog.write(json.dumps(
                    {"step": total,
                     **{f"train/{k}": float(np.asarray(v))
                        for k, v in metrics.items()}}) + "\n")
                mlog.flush()
            if args.save_every and total % args.save_every == 0:
                save_checkpoint(out / "ckpts" / "last", state, {"steps": total})
                log(f"checkpointed at {total}")
            if total >= args.steps:
                break
        epoch += 1
    jax.block_until_ready(state.params)
    dt = time.time() - t0
    log(f"trained {total} steps in {dt:.0f}s ({total / dt:.2f} steps/s)")
    save_checkpoint(out / "ckpts" / "final", state, {"steps": total})

    summary = {"steps": total, "train_seconds": dt}
    if args.eval:
        from rap_tpu.eval.runner import evaluate_split

        summary["val"] = evaluate_split(
            state.params, pipe, val_ds, batch_tokens=args.batch_tokens,
            num_steps=10, tag="val scenes",
        )
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
