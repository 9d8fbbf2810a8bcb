"""Multi-process (multi-host) runtime initialization and batch assembly.

TPU-native replacement for the reference's torchrun/Lightning-DDP process
bootstrap (SURVEY.md §2.4; /root/reference/config/trainer/main.yaml `strategy:
ddp`). The model is JAX's: one Python process per host, every process calls
:func:`initialize`, and from then on jitted computations operate on *global*
logical arrays whose shards live on each process's addressable devices.

The data contract differs fundamentally from DDP and is the part the reference
gets to ignore: under pjit/GSPMD every process must participate in the SAME
program over the SAME global batch. So instead of striding whole batches
across ranks (reference DynamicBatchSampler, datamodule.py:104-142), every
process computes the identical batch *plan* (deterministic seeded packing) and
loads only its slice of the sample axis; :func:`make_global_batch` then stitches
the local shards into global `jax.Array`s via
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.batch import PartBatch
from .mesh import DATA_AXIS


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Initialize jax.distributed when running multi-process; no-op otherwise.

    Args may come from the environment (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) — the TPU-pod case auto-detects and
    needs none of them. Returns (process_index, process_count).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    # cluster hints under which jax.distributed's own auto-detection works
    # without explicit coordinates (TPU pod metadata, SLURM, OpenMPI).
    # SLURM/OpenMPI must advertise MORE THAN ONE task: in a single-task
    # allocation initialize() would block at the coordinator barrier waiting
    # for peers that never come (a hang, not a catchable error).
    def _env_gt1(var: str) -> bool:
        try:
            return int(os.environ.get(var, "1")) > 1
        except ValueError:
            return False

    auto_detectable = (
        "TPU_WORKER_HOSTNAMES" in os.environ
        or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
        or ("SLURM_JOB_ID" in os.environ and _env_gt1("SLURM_NTASKS"))
        or _env_gt1("OMPI_COMM_WORLD_SIZE")
    )
    if coordinator_address or num_processes or auto_detectable:
        try:
            already = jax.distributed.is_initialized()
        except AttributeError:  # older JAX without the public probe
            already = False
        if not already:
            if coordinator_address or num_processes:
                try:
                    jax.distributed.initialize(
                        coordinator_address=coordinator_address,
                        num_processes=num_processes,
                        process_id=process_id,
                    )
                except RuntimeError as e:
                    if "already" not in str(e).lower():
                        raise  # double-init is fine; anything else is real
            else:
                # cluster auto-detect from the env hint; a hint can be
                # spurious (e.g. TPU_WORKER_HOSTNAMES=localhost on a
                # single-host tunnel), so failed detection degrades to
                # single-process instead of raising
                try:
                    jax.distributed.initialize()
                except (RuntimeError, ValueError):
                    pass
    return jax.process_index(), jax.process_count()


def process_slice(S_global: int) -> tuple[int, int]:
    """This process's contiguous [lo, hi) sample-slot range of a global batch.

    Contiguity matches leading-axis sharding over ``jax.devices()`` order
    (process-major), so each process's local slice is exactly the data its
    addressable devices own.
    """
    n = jax.process_count()
    assert S_global % n == 0, f"S={S_global} not divisible by {n} processes"
    per = S_global // n
    lo = jax.process_index() * per
    return lo, lo + per


def slice_local_batch(batch: PartBatch, process_index: int | None = None, process_count: int | None = None) -> PartBatch:
    """Host-side: take this process's contiguous S-slice of a global PartBatch.

    Per-sample arrays (S leading) slice to [lo, hi); per-part/point arrays
    (G = S*P leading, sample-major) slice to [lo*P, hi*P). ``sample_of_part``
    values stay GLOBAL (required by make_global_batch).
    """
    n = process_count if process_count is not None else jax.process_count()
    k = process_index if process_index is not None else jax.process_index()
    S = batch.S
    assert S % n == 0, f"S={S} not divisible by {n} processes"
    P = batch.G // S
    per = S // n
    lo, hi = k * per, (k + 1) * per

    def sl(x):
        x = np.asarray(x)
        if x.shape[0] == S:
            return x[lo:hi]
        assert x.shape[0] == S * P, f"unexpected leading dim {x.shape}"
        return x[lo * P : hi * P]

    return jax.tree.map(sl, batch)


def make_global_batch(local: PartBatch, mesh: Mesh) -> PartBatch:
    """Assemble per-process local PartBatch shards into global jax.Arrays.

    ``local`` holds this process's contiguous slice of the sample axis (and
    the matching contiguous slice of the part axis, since G = S*P is
    sample-major). Single-process: plain device_put with the mesh sharding.

    NOTE: ``local.sample_of_part`` must hold GLOBAL sample indices (the
    collator takes a ``sample_offset``) because jitted gathers see the global
    logical array.
    """
    lead = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    n_data = mesh.shape[DATA_AXIS]

    def spec_for(x):
        # leaves whose leading axis can't split (e.g. per-sample arrays of an
        # S=1 map-merge batch) replicate; everything else shards on axis 0
        return lead if np.asarray(x).shape[0] % n_data == 0 else repl

    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, spec_for(x)), local)

    n = jax.process_count()

    def shard(x):
        x = np.asarray(x)
        g0 = x.shape[0] * n
        # local slices cannot be replicated after the fact — the loader's
        # s_multiple (a multiple of the device count in the trainer) must
        # make every leading axis shardable; fail loudly otherwise
        assert g0 % n_data == 0, (
            f"global leading dim {g0} not divisible by the {n_data}-device "
            "data axis; set the loader's s_multiple to the device count"
        )
        global_shape = (g0,) + x.shape[1:]
        return jax.make_array_from_process_local_data(lead, x, global_shape)

    return jax.tree.map(shard, local)
