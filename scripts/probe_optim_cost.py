"""Isolate the optimizer's share of the rap_12 train step (VERDICT r4 #6).

The r4 device profile (docs/data/kernels_r4.txt) shows ~57 ms/step inside
`conditional.*` / `branch_1_fun.*` ops. The traced program contains ZERO
conditionals (verified: stableHLO of make_train_step has no case/if ops) —
they are introduced by the XLA:TPU backend's conditional code motion, which
hoists the scalar-predicate non-finite-guard selects (train/step.py keep())
into a conditional wrapping the whole optimizer update. The time inside is
therefore the update math itself, dominated by Muon's Newton-Schulz
orthogonalization (~15 matmul dispatches x 5 iterations over stacked
per-layer weight matrices, small-matrix shapes that run far below the MXU
flash-attention floor).

This probe measures the same train step under (a) muon, (b) adamw, and
(c) muon with the non-finite guard disabled, attributing the residual over
the fwd+bwd floor to optimizer math vs guard/conditional overhead. Writes
one JSON object to --out.

Usage: timeout 900 python scripts/probe_optim_cost.py \
          --out docs/data/optim_cost_r5.json
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/data/optim_cost_r5.json")
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--tokens", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=15)
    args = ap.parse_args(argv)

    print("devices:", jax.devices(), flush=True)
    jax.block_until_ready(jax.numpy.zeros(8))

    from rap_tpu.core.batch import make_regular_synthetic_batch
    from rap_tpu.models import DiTConfig
    from rap_tpu.models.dit import init_dit_params
    from rap_tpu.registration import RPFConfig
    from rap_tpu.train import (
        OptimizerConfig, TrainState, build_optimizer, make_train_step,
    )

    N = args.tokens // 2
    cfg = RPFConfig(model=DiTConfig(num_layers=args.layers))
    batch = make_regular_synthetic_batch(
        jax.random.key(0), points_per_part=[[N, N]], N=N, P=2, S=1,
        feat_dim=cfg.model.local_feat_dim,
    )

    results = {"layers": args.layers, "tokens": args.tokens}
    for name in ("muon", "adamw"):
        tx = build_optimizer(OptimizerConfig(name=name), steps_per_epoch=100)
        params = init_dit_params(jax.random.key(1), cfg.model)
        state = TrainState.create(params, tx, jax.random.key(2))
        step = make_train_step(cfg, tx)
        t0 = time.time()
        state, m = step(state, batch)
        jax.block_until_ready(m["loss"])
        print(f"{name}: compile+first {time.time() - t0:.1f}s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(args.reps):
                state, m = step(state, batch)
            jax.block_until_ready(m["loss"])
            ts.append((time.time() - t0) / args.reps)
        results[f"{name}_ms"] = round(float(np.median(ts)) * 1e3, 1)
        print(f"{name}: {results[f'{name}_ms']} ms/step", flush=True)

    results["muon_minus_adamw_ms"] = round(
        results["muon_ms"] - results["adamw_ms"], 1
    )
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
