"""Step-count quality sweep for a committed npz model (real TPU).

Quality sweep used to assess whether recall holds at k<10 ODE steps:
evaluates one checkpoint over an ODE step-count sweep on held-out synthetic
val scenes with the full metric protocol
(rap_tpu.eval.runner.evaluate_split — same recalls as the reference
evaluator.py:69-106), plus the trajectory-linearity probe. A student whose
few-step recalls match its 10-step recalls licenses the few-step bench
protocol (bench.py BENCH_STEPS); whether a given committed checkpoint
clears that bar is recorded in BASELINE.md, not assumed here.

The reference always runs 10 Euler steps (sampler.py:11-92,
RAP_inference.yaml:52-65); a reflow-distilled student holding recall at
k<10 steps cuts per-pair FLOPs by 10/k — the only remaining throughput
lever once the kernels sit at their matmul floor (BASELINE.md).

Usage:
  timeout 1800 python scripts/eval_student_sweep.py \
      --ckpt demo_data/ckpts/reflow_student.npz --data-root runs/reflow9/data \
      --sweep 1,2,4,10 --out runs/reflow9/student_sweep.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="demo_data/ckpts/reflow_student.npz")
    ap.add_argument("--data-root", default="runs/reflow9/data")
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--batch-tokens", type=int, default=32_768)
    ap.add_argument("--sweep", default="1,2,4,10")
    ap.add_argument("--split", default="val")
    ap.add_argument("--out", default="runs/reflow9/student_sweep.json")
    ap.add_argument("--icp-refine", action="store_true",
                    help="post-refine predicted poses with batched trimmed "
                         "ICP before scoring (registration.refine_poses_icp)"
                         " — the VERDICT-r4 keep-or-kill measurement; rows "
                         "are comparable to the non-ICP sweep on the same "
                         "data-root/seed")
    ap.add_argument("--icp-trim", type=float, default=0.7)
    ap.add_argument("--icp-restarts", type=int, default=1)
    ap.add_argument("--skip-linearity", action="store_true",
                    help="skip the 10-step trajectory-linearity probe "
                         "(already committed for the claim npz)")
    args = ap.parse_args(argv)

    # main-thread backend init before any loader thread (CLAUDE.md gotcha)
    log("devices:", jax.devices())
    jax.block_until_ready(jnp.zeros(8))

    from rap_tpu.core.sampler import compute_linearity
    from rap_tpu.data import (
        BatchLoader, DatasetConfig, LoaderConfig, PointCloudDataset,
    )
    from rap_tpu.eval.runner import evaluate_split
    from rap_tpu.models import DiTConfig
    from rap_tpu.models.dit import init_dit_params
    from rap_tpu.registration import RPFConfig, sample
    from rap_tpu.train.checkpoint import load_params_npz

    model = DiTConfig(num_layers=args.layers)
    params = load_params_npz(
        args.ckpt, init_dit_params(jax.random.key(0), model)
    )
    ds = PointCloudDataset(DatasetConfig(
        split=args.split, data_path=args.data_root, dataset_name="synth",
        load_features=True,
    ))
    log(f"{len(ds)} {args.split} scenes from {args.data_root}")

    pipe = RPFConfig(model=model, rigidity_forcing=True)
    summary: dict = {"ckpt": args.ckpt, "split": args.split}
    for tok in args.sweep.split(","):
        # token: "<k>" or "<k>p<c>x<f>" — k ODE steps with the first c on a
        # 1/f token subsample (registration.RPFConfig.prune_coarse_steps)
        import dataclasses as _dc
        import re as _re

        m = _re.fullmatch(r"(\d+)(?:p(\d+)x(\d+))?", tok)
        if not m:
            raise ValueError(f"bad sweep token {tok!r} (want k or kpcxf)")
        k = int(m.group(1))
        tok_pipe = pipe
        if m.group(2):
            tok_pipe = _dc.replace(
                pipe, prune_coarse_steps=int(m.group(2)),
                prune_factor=int(m.group(3)),
            )
        t0 = time.time()
        res = evaluate_split(
            params, tok_pipe, ds, batch_tokens=args.batch_tokens,
            num_steps=k, tag=f"student@{tok}steps",
            icp_refine=args.icp_refine,
            icp_refine_trim=args.icp_trim,
            icp_refine_restarts=args.icp_restarts,
        )
        summary[f"student@{tok}steps"] = res
        log(f"@{k} steps ({time.time() - t0:.0f}s): "
            + ", ".join(f"{m}={res[m]:.3f}" for m in (
                "average_rotation_error (deg)",
                "average_translation_error (m)",
                "recall_at_10deg_5m (map)",
                "recall_at_10deg_0.2m (nss)",
                "recall_at_chamfer_0.2m",
            ) if m in res))
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(summary, indent=2))

    if args.skip_linearity:
        Path(args.out).write_text(json.dumps(summary, indent=2))
        print(json.dumps(summary))
        return

    loader = BatchLoader(
        [ds], LoaderConfig(max_points_per_batch=args.batch_tokens,
                           shuffle=False)
    )
    batch = next(iter(loader.epoch(0)))[0]

    @jax.jit
    def probe(params, batch):
        o = sample(params, pipe, batch, jax.random.key(42),
                   return_trajectory=True, num_steps=10)
        lin = compute_linearity(o["trajectory"], batch.point_mask)
        return lin.sum() / jnp.maximum(batch.point_mask.sum(), 1)

    summary["linearity"] = float(probe(params, batch))
    log("linearity:", summary["linearity"])
    Path(args.out).write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
