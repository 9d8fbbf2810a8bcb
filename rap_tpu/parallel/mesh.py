"""Device mesh + sharding helpers.

TPU-native replacement for the reference's Lightning DDP/NCCL setup
(SURVEY.md §2.4): a single `jax.sharding.Mesh` with a ``data`` axis over
ICI/DCN; batches shard along their leading (part/sample) axis, parameters
replicate, and XLA inserts the gradient all-reduce — no manual collectives.
A ``model`` axis slot is reserved for future tensor parallelism (the models
are <100M params, so DP is the reference-parity requirement).

The PartBatch regular layout (sample-major, G = S*P) makes leading-axis
sharding consistent: G-dim arrays split into (S/n)*P chunks that own exactly
the samples of the matching S-dim chunks, so parts of one sample always land
on one device and the attention reshapes (G,N,D) <-> (S,P*N,D) stay local.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.batch import PartBatch

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None, model_parallel: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    assert n % model_parallel == 0
    arr = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for a PartBatch, as a jit in_shardings *prefix*
    (one sharding applies to every leaf — this stays valid whatever static
    metadata, e.g. ``no_padding``, the concrete batch pytree carries)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a time-stacked PartBatch pytree (leading (steps, ...)
    axis, e.g. the scanned-train-steps input): steps replicate, the batch
    axis (axis 1) shards over data."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_batch(batch: PartBatch, mesh: Mesh) -> PartBatch:
    """Put a host batch on the mesh with leading-axis sharding over the data
    axis. Multi-process: ``batch`` is this process's local sample-axis slice
    (see parallel/distributed.py for the contract)."""
    from .distributed import make_global_batch

    return make_global_batch(batch, mesh)
