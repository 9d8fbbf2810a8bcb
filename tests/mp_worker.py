"""Worker for the multi-process data-parallel test (spawned by
tests/test_multiprocess.py). Runs one member of a 2-process x 4-device CPU
mesh: builds the SAME deterministic global batch on every process, slices its
local S-shard, assembles global arrays, and runs jitted train steps over the
8-device mesh. Prints the per-step losses as JSON on stdout.

Usage: python tests/mp_worker.py <process_id> <num_processes> <port> [n_local_devices]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

proc_id = int(sys.argv[1])
n_proc = int(sys.argv[2])
port = int(sys.argv[3])
n_local = int(sys.argv[4]) if len(sys.argv) > 4 else 4

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", n_local)
if n_proc > 1:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_proc,
        process_id=proc_id,
    )

import numpy as np  # noqa: E402

from rap_tpu.core.batch import make_regular_synthetic_batch  # noqa: E402
from rap_tpu.models import DiTConfig  # noqa: E402
from rap_tpu.models.dit import init_dit_params  # noqa: E402
from rap_tpu.parallel.distributed import make_global_batch, slice_local_batch  # noqa: E402
from rap_tpu.parallel.mesh import make_mesh  # noqa: E402
from rap_tpu.registration import RPFConfig  # noqa: E402
from rap_tpu.train import (  # noqa: E402
    OptimizerConfig,
    TrainState,
    build_optimizer,
    make_train_step,
)

assert jax.device_count() == 8, jax.devices()

model = DiTConfig(num_layers=2, embed_dim=64, num_heads=4, local_feat_dim=8)
cfg = RPFConfig(model=model)
S, P, N = 8, 2, 32
# deterministic on every process: built from fixed jax.random keys
global_batch = make_regular_synthetic_batch(
    jax.random.key(0),
    points_per_part=[[N, N // 2] for _ in range(S)],
    N=N,
    P=P,
    S=S,
    feat_dim=8,
)
mesh = make_mesh(8)
local = slice_local_batch(global_batch, proc_id, n_proc) if n_proc > 1 else global_batch
batch = make_global_batch(local, mesh)

tx = build_optimizer(OptimizerConfig(name="muon"), steps_per_epoch=1)
params = init_dit_params(jax.random.key(1), model)
state = TrainState.create(params, tx, jax.random.key(2))
step = make_train_step(cfg, tx, mesh=mesh)

losses = []
for _ in range(3):
    state, metrics = step(state, batch)
    losses.append(float(metrics["loss"]))
assert all(np.isfinite(l) for l in losses), losses

# cross-host metric reduce with DIVERGENT key sets (stride-mode eval gives
# hosts different batches, so keys differ; a host can even have none)
meter_out = {}
if n_proc > 1:
    from rap_tpu.eval.meter import MetricsMeter  # noqa: E402

    meter = MetricsMeter()
    registry = ["dsA", "dsB"]
    if proc_id == 0:
        meter.add_metrics(
            "dsA", {"shared": np.array([1.0, 3.0]), "only0": np.array([5.0, 5.0])},
            valid=np.array([True, True]), num_parts=np.array([2, 3]),
        )
    else:
        meter.add_metrics(
            "dsB", {"shared": np.array([7.0]), "only1": np.array([9.0])},
            valid=np.array([True]), num_parts=np.array([4]),
        )
    meter.reduce_across_hosts(registry)
    avg = meter.compute_average()
    meter_out = {
        "dsA_shared": avg.get("dsA", {}).get("shared"),
        "dsB_shared": avg.get("dsB", {}).get("shared"),
        "dsA_only0": avg.get("dsA", {}).get("only0"),
        "dsB_only1": avg.get("dsB", {}).get("only1"),
        "overall_shared": avg["overall"].get("shared"),
        "samples": meter.get_sample_counts(),
        "part_ranges": {k: list(v) for k, v in meter.get_part_count_ranges().items()},
    }

print("RESULT " + json.dumps(
    {"process": proc_id, "losses": losses, "meter": meter_out}
))
