"""RAP-TPU: TPU-native multi-view point-cloud registration via Rectified Point Flow.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of PRBonn/RAP
(reference: /root/reference). Registration is cast as conditional generation:
a DiT-style transformer learns a point-wise velocity field transporting
Gaussian noise to the registered scene, conditioned on the unposed input
point clouds; per-view rigid poses are recovered by batched weighted
Kabsch/SVD, with optional rigidity forcing inside the ODE loop.

Design principles (TPU-first, not a port):
  - Static shapes everywhere: the reference's packed `(TP, 3)+cu_seqlens`
    dynamic batching becomes a bucketed `(G, N, ...)` part-major layout
    (see `rap_tpu.core.batch.PartBatch`).
  - All hot loops on-device: the ODE sampler is a `lax.scan`; per-part
    Procrustes is a vmapped masked Kabsch (no Python SVD loops).
  - Attention is segment-masked flash attention (Pallas kernel with
    block skipping; XLA online-softmax fallback).
  - Parallelism via `jax.sharding.Mesh` + shard_map data parallelism,
    not NCCL/DDP.
"""

__version__ = "0.1.0"
