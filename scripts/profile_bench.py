"""Capture a device trace of the bench protocol and aggregate leaf-op time.

Writes the trace under /tmp/rap_trace and prints a per-op-category table
(attention kernels vs fusions vs copies) from the trace .pb via the
tensorflow-free xplane parser in jax.
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
import jax.numpy as jnp


def main():
    from rap_tpu.core.batch import make_regular_synthetic_batch
    from rap_tpu.models import DiTConfig
    from rap_tpu.models.dit import init_dit_params
    from rap_tpu.registration import RPFConfig, predict_poses, sample

    PAIRS, POINTS, STEPS = 2, 4096, 10
    cfg = RPFConfig(
        model=DiTConfig(num_layers=12),
        inference_sampling_steps=STEPS,
        rigidity_forcing=True,
    )
    batch = make_regular_synthetic_batch(
        jax.random.key(0),
        points_per_part=[[POINTS, POINTS] for _ in range(PAIRS)],
        N=POINTS, P=2, S=PAIRS,
        feat_dim=cfg.model.local_feat_dim,
    )
    params = init_dit_params(jax.random.key(1), cfg.model)

    @jax.jit
    def generate(params, batch, key):
        out = sample(params, cfg, batch, key, return_trajectory=False)
        R, t = predict_poses(batch, out["points"])
        return out["points"], R, t

    key = jax.random.key(2)
    r = generate(params, batch, key)
    jax.block_until_ready(r)

    tdir = "/tmp/rap_trace"
    with jax.profiler.trace(tdir):
        for _ in range(3):
            r = generate(params, batch, key)
            jax.block_until_ready(r)

    # locate newest xplane pb
    pbs = sorted(glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True))
    print("trace:", pbs[-1] if pbs else "NONE")
    if not pbs:
        return
    try:
        from tensorflow.python.profiler import profiler_client  # noqa
    except Exception:
        pass
    # parse with the xplane proto bundled in tensorboard_plugin_profile or
    # fall back to perfetto-style trace.json.gz
    js = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True))
    if not js:
        print("no trace.json.gz; xplane-only (inspect offline)")
        return
    with gzip.open(js[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-thread events: aggregate wall duration by name
    agg = defaultdict(float)
    total = 0.0
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n and "pjrt" not in n.lower()}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))
        agg[name] += dur
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
    print(f"total device-op time: {total/1e3:.1f} ms over 3 iters")
    for name, dur in rows:
        print(f"  {dur/1e3:9.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
