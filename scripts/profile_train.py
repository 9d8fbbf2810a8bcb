"""Device-trace the training step and aggregate per-op time (real TPU).

Same protocol as scripts/profile_bench.py but for make_train_step at the
reference training shape (rap_12, 8192 tokens/batch): shows where the
backward spends time (pallas attention bwd vs XLA-recompute backward of the
fused projection/FF kernels) to decide whether fused backward kernels are
worth building.
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def main():
    from rap_tpu.core.batch import make_regular_synthetic_batch
    from rap_tpu.models import DiTConfig
    from rap_tpu.models.dit import init_dit_params
    from rap_tpu.registration import RPFConfig
    from rap_tpu.train import (
        OptimizerConfig, TrainState, build_optimizer, make_train_step,
    )

    N = 4096
    cfg = RPFConfig(model=DiTConfig(num_layers=12))
    batch = make_regular_synthetic_batch(
        jax.random.key(0),
        points_per_part=[[N, N]],
        N=N, P=2, S=1,
        feat_dim=cfg.model.local_feat_dim,
    )
    tx = build_optimizer(OptimizerConfig(name="muon"), steps_per_epoch=100)
    params = init_dit_params(jax.random.key(1), cfg.model)
    state = TrainState.create(params, tx, jax.random.key(2))
    step = make_train_step(cfg, tx)

    t0 = time.time()
    state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    print(f"compile+first step: {time.time() - t0:.1f}s loss={float(m['loss']):.4f}")

    # steady state timing
    ts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(5):
            state, m = step(state, batch)
        jax.block_until_ready(m["loss"])
        ts.append((time.time() - t0) / 5)
    dt = float(np.median(ts))
    # rap_12 train fwd+bwd ~= 3x inference fwd FLOPs per step at 8k tokens
    tf = 3 * 4.1  # ~4.1 TFLOP fwd at 8192 tokens (41 TFLOP/pair / 10 steps)
    print(f"steady train step: {dt*1e3:.1f} ms  (~{tf/dt:.0f} TFLOP/s effective)")

    tdir = "/tmp/rap_train_trace"
    with jax.profiler.trace(tdir):
        for _ in range(3):
            state, m = step(state, batch)
        jax.block_until_ready(m["loss"])

    js = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True))
    if not js:
        print("no trace.json.gz")
        return
    with gzip.open(js[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n and "pjrt" not in n.lower()}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith(("while", "jit_", "body")):
            continue  # container events double-count their children
        agg[name] += float(e.get("dur", 0.0))
        total += float(e.get("dur", 0.0))
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:30]
    print(f"leaf device-op time: {total/1e3:.1f} ms over 3 steps")
    for name, dur in rows:
        print(f"  {dur/1e3:9.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
