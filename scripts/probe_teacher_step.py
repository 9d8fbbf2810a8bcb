"""Quick step-time probe for the capability-teacher config (round 3).

Measures the jitted train step (6-layer DiT, 32k-token batches) with and
without the auxiliary Kabsch pose loss, to size the 40k-step teacher run
before committing ~4-5 h of TPU time to it. See BASELINE.md training-step
table for the rap_12/8k-token numbers this complements.

Usage: timeout 900 python scripts/probe_teacher_step.py --data-root runs/teacher3/data
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--batch-tokens", type=int, default=32_768)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args(argv)

    print("devices:", jax.devices(), flush=True)
    jax.block_until_ready(jax.numpy.zeros(8))

    from rap_tpu.data import (
        BatchLoader, DatasetConfig, LoaderConfig, PointCloudDataset,
    )
    from rap_tpu.models import DiTConfig
    from rap_tpu.models.dit import init_dit_params
    from rap_tpu.registration import RPFConfig
    from rap_tpu.train import (
        OptimizerConfig, TrainState, build_optimizer, make_train_step,
    )

    model = DiTConfig(num_layers=args.layers)
    ds = PointCloudDataset(DatasetConfig(
        split="train", data_path=args.data_root, dataset_name="synth",
        load_features=True, yaw_augmentation=True,
    ))
    loader = BatchLoader(
        [ds], LoaderConfig(max_points_per_batch=args.batch_tokens,
                           shuffle=True, prefetch=0),
    )
    # keep one bucket shape only — each distinct (G, N) shape is its own
    # compilation, and mixing shapes in the timing loop measures the compiler
    it = iter(loader.epoch(0))
    first = next(it)[0]
    batches = [first]
    for b, _, _ in it:
        if b.points.shape == first.points.shape:
            batches.append(b)
        if len(batches) >= 4:
            break
    print("batch shape:", first.points.shape, flush=True)

    tx = build_optimizer(OptimizerConfig(name="muon", lr=3e-4, grad_clip=0.5),
                         steps_per_epoch=1000)

    for tag, kw in (
        ("velocity only", dict(timestep_sampling="late_heavy")),
        ("late_heavy + pose 0.1",
         dict(timestep_sampling="late_heavy", pose_loss_weight=0.1)),
    ):
        pipe = RPFConfig(model=model, rigidity_forcing=True, **kw)
        step_fn = make_train_step(pipe, tx, remat=True)
        # fresh params per config: the step donates its input state, so the
        # previous config's loop consumed the old buffers
        params = init_dit_params(jax.random.key(0), model)
        state = TrainState.create(params, tx, jax.random.key(1))
        t0 = time.time()
        state, m = step_fn(state, batches[0])
        jax.block_until_ready(state.params)
        print(f"{tag}: compile+first {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        for i in range(args.reps):
            state, m = step_fn(state, batches[i % len(batches)])
        jax.block_until_ready(state.params)
        dt = (time.time() - t0) / args.reps
        print(f"{tag}: {dt * 1e3:.1f} ms/step "
              f"({args.batch_tokens / dt / 1e6:.2f} Mtok/s)", flush=True)


if __name__ == "__main__":
    main()
