"""Long-context hardware line (VERDICT r4 weak #5): map-merging-scale
inference on ONE real chip.

The reference routinely evals packed batches up to a 400k-token budget and
parts up to 40k points on one GPU (/root/reference/config/RAP_inference.yaml
:34-36 max_tokens/max_parts). The rebuild's claim that long scenes fit and
run on a v5e has so far been a compile-time fact (CPU ring dryrun at T=512,
single-chip bench at 8k tokens). This probe runs a ladder of single-scene
(S=1) multi-part shapes through the FULL serving program — ODE sample with
rigidity forcing + per-step batched Kabsch + final pose fit — on the real
TPU and records ms/scene, tokens/s, and peak HBM per shape, walking up
until compile or memory fails.

Writes one JSON line per shape to --out (jsonl).

Usage: timeout 1800 python scripts/longcontext_probe.py \
          --out docs/data/longcontext_r5.jsonl
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
import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, file=sys.stderr, flush=True)


# ladder of (parts, points_per_part): 32k -> 262k tokens per scene
LADDER = [(8, 4096), (8, 8192), (12, 8192), (16, 8192), (24, 8192),
          (32, 8192)]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/data/longcontext_r5.jsonl")
    ap.add_argument("--ckpt", default="demo_data/ckpts/teacher3_last.npz")
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ladder", default="",
                    help="override rungs as comma list of PARTSxPOINTS "
                         "(e.g. '40x8192,48x8192' probes toward the "
                         "reference's 400k-token eval budget)")
    args = ap.parse_args(argv)
    ladder = LADDER
    if args.ladder:
        ladder = [tuple(int(v) for v in r.split("x"))
                  for r in args.ladder.split(",")]

    log("devices:", jax.devices())
    jax.block_until_ready(jnp.zeros(8))

    from rap_tpu.core.batch import make_regular_synthetic_batch
    from rap_tpu.models import DiTConfig
    from rap_tpu.models.dit import init_dit_params
    from rap_tpu.registration import RPFConfig, predict_poses, sample
    from rap_tpu.train.checkpoint import load_params_npz

    cfg = RPFConfig(
        model=DiTConfig(num_layers=args.layers),
        inference_sampling_steps=args.steps,
        rigidity_forcing=True,
    )
    params = init_dit_params(jax.random.key(0), cfg.model)
    if args.ckpt and Path(args.ckpt).exists():
        params = load_params_npz(args.ckpt, params)

    @jax.jit
    def generate(params, batch, key):
        out = sample(params, cfg, batch, key, return_trajectory=False)
        R, t = predict_poses(batch, out["points"])
        return out["points"], R, t

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    rows = []
    for parts, npts in ladder:
        tokens = parts * npts
        row = {"parts": parts, "points_per_part": npts, "tokens": tokens,
               "layers": args.layers, "ode_steps": args.steps}
        try:
            batch = make_regular_synthetic_batch(
                jax.random.key(0), points_per_part=[[npts] * parts],
                N=npts, P=parts, S=1, feat_dim=cfg.model.local_feat_dim,
            )
            t0 = time.time()
            pts, R, t = generate(params, batch, jax.random.key(1))
            jax.block_until_ready((pts, R, t))
            row["compile_s"] = round(time.time() - t0, 1)
            if not bool(jnp.isfinite(pts).all()):
                row["error"] = "non-finite output"
            else:
                times = []
                for i in range(args.reps):
                    t0 = time.time()
                    pts, R, t = generate(
                        params, batch, jax.random.fold_in(jax.random.key(2), i)
                    )
                    jax.block_until_ready((pts, R, t))
                    times.append(time.time() - t0)
                dt = float(np.median(times))
                row["ms_per_scene"] = round(dt * 1e3, 1)
                row["tokens_per_s"] = round(tokens / dt)
                stats = jax.local_devices()[0].memory_stats() or {}
                peak = stats.get("peak_bytes_in_use", 0)
                row["peak_hbm_gb"] = round(peak / 2**30, 2)
        except Exception as e:  # noqa: BLE001 — record OOM/compile failure
            row["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        log(row)
        rows.append(row)
        out_path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        if "error" in row:
            break
    print(json.dumps(rows[-1]))


if __name__ == "__main__":
    main()
