"""Batch packing: variable-size samples -> fixed-shape regular PartBatches.

This replaces the reference's DynamicBatchSampler + variable_collate_fn
(/root/reference/rectified_point_flow/data/datamodule.py:59-198), which greedily
packs samples into one flat (TP,3) tensor under a point budget. XLA wants a
small set of static shapes, so here:

  - every batch is a regular (S, P, N) grid: P = max parts over the batch and
    N = max part size, both rounded UP a bucket ladder (powers of two), S
    padded to a multiple of the shard count;
  - a greedy packer sorts samples by (parts, max-part-size) so batches are
    homogeneous (padding waste stays low) and packs until the *padded* token
    count S*P*N would exceed the budget;
  - one compiled program per distinct (S, P, N) triple; the ladder bounds the
    number of distinct shapes (compile cache stays small).

Per-host sharding replaces rank striding (datamodule.py:104-106): shard s of
n takes samples [s::n] AFTER packing order is fixed, so every host sees the
same batch shapes in the same order (required for pjit).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..core.batch import PartBatch
from .dataset import Sample

N_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536)
P_BUCKETS = (2, 4, 8, 16, 32, 64, 128, 256, 512)


def _bucket(value: int, ladder) -> int:
    for b in ladder:
        if value <= b:
            return b
    raise ValueError(f"value {value} exceeds ladder {ladder[-1]}")


def pad_to_multiple(x: int, m: int) -> int:
    """Ceil x up to a multiple of m."""
    return -(-x // m) * m


@dataclasses.dataclass
class BatchPlan:
    """Indices of the samples in one batch plus its static shape."""

    indices: list[int]
    N: int
    P: int
    S: int  # padded sample count (>= len(indices))


def plan_batches(
    part_counts: list[int],
    max_part_points: list[int],
    max_points_per_batch: int,
    shuffle: bool = False,
    seed: int = 0,
    s_multiple: int = 1,
    sort_by_size: bool = True,
) -> list[BatchPlan]:
    """Greedy shape-aware packing. Returns batch plans covering all samples."""
    n = len(part_counts)
    order = np.arange(n)
    if shuffle:
        order = np.random.default_rng(seed).permutation(n)
    if sort_by_size:
        # stable sort by (bucketed parts, bucketed size) for homogeneity;
        # shuffle (above) still randomizes within equal keys
        keys = [
            (_bucket(part_counts[i], P_BUCKETS), _bucket(max(max_part_points[i], 1), N_BUCKETS))
            for i in order
        ]
        order = order[np.argsort(np.array([k[0] * 10**9 + k[1] for k in keys], dtype=np.int64), kind="stable")]

    plans: list[BatchPlan] = []
    cur: list[int] = []
    cur_P = 0
    cur_N = 0

    def flush():
        nonlocal cur, cur_P, cur_N
        if cur:
            S = pad_to_multiple(len(cur), s_multiple)
            plans.append(BatchPlan(indices=cur, N=cur_N, P=cur_P, S=S))
        cur, cur_P, cur_N = [], 0, 0

    for i in order:
        P_i = _bucket(part_counts[i], P_BUCKETS)
        N_i = _bucket(max(max_part_points[i], 1), N_BUCKETS)
        new_P = max(cur_P, P_i)
        new_N = max(cur_N, N_i)
        new_S = pad_to_multiple(len(cur) + 1, s_multiple)
        cur_shape = cur_P * cur_N * pad_to_multiple(max(len(cur), 1), s_multiple)
        # flush on budget overflow — UNLESS the padded shape is unchanged:
        # the sample then fills an S slot the batch already pays for (an
        # over-budget singleton padded to S=s_multiple must not spawn
        # s_multiple singleton batches of the identical compiled shape)
        if (
            cur
            and new_S * new_P * new_N > max_points_per_batch
            and new_S * new_P * new_N != cur_shape
        ):
            flush()
            new_P, new_N = P_i, N_i
        cur.append(int(i))
        cur_P, cur_N = new_P, new_N
        if (
            cur_P * cur_N * pad_to_multiple(len(cur), s_multiple)
            >= max_points_per_batch
            and len(cur) % s_multiple == 0
        ):
            flush()
    flush()
    return plans


def collate_to_part_batch(
    samples: list[Sample],
    N: int,
    P: int,
    S: int | None = None,
    feat_dim: int | None = None,
    sample_offset: int = 0,
) -> tuple[PartBatch, list[str]]:
    """Build a regular-layout PartBatch (numpy-backed) from Samples.

    Oversized parts are an error — the packer chooses N >= max part size;
    datasets enforce their own point budgets upstream (FPS preprocessing).

    ``sample_offset`` shifts ``sample_of_part`` to GLOBAL sample-slot indices
    when this collation builds one process's local shard of a multi-process
    global batch (parallel/distributed.py): jitted gathers on sample_of_part
    index the *global* per-sample arrays.
    """
    import jax.numpy as jnp

    S = len(samples) if S is None else S
    assert len(samples) <= S
    if feat_dim is None:
        feat_dim = samples[0].features[0].shape[1] if samples else 32
    G = S * P
    points = np.zeros((G, N, 3), np.float32)
    points_gt = np.zeros((G, N, 3), np.float32)
    feats = np.zeros((G, N, feat_dim), np.float32)
    mask = np.zeros((G, N), bool)
    part_valid = np.zeros(G, bool)
    anchor = np.zeros(G, bool)
    rots = np.tile(np.eye(3, dtype=np.float32), (G, 1, 1))
    trans = np.zeros((G, 3), np.float32)
    scale = np.ones(S, np.float32)
    sample_valid = np.zeros(S, bool)
    g_rot = np.tile(np.eye(3, dtype=np.float32), (S, 1, 1))
    g_trans = np.zeros((S, 3), np.float32)
    names: list[str] = []

    for s, smp in enumerate(samples):
        assert smp.num_parts <= P, f"sample {smp.name}: {smp.num_parts} > P={P}"
        for p in range(smp.num_parts):
            g = s * P + p
            pts = smp.points[p]
            n = len(pts)
            assert n <= N, f"part with {n} pts exceeds bucket N={N}"
            points[g, :n] = pts
            points_gt[g, :n] = smp.points_gt[p]
            f = smp.features[p]
            feats[g, :n, : f.shape[1]] = f[:, :feat_dim]
            mask[g, :n] = True
            part_valid[g] = True
            rots[g] = smp.rotations[p]
            trans[g] = smp.translations[p]
            anchor[g] = p == smp.anchor_idx
        scale[s] = smp.scale
        sample_valid[s] = True
        g_rot[s] = smp.global_rotation
        g_trans[s] = smp.global_translation
        names.append(smp.name)
    names += [f"_pad_{i}" for i in range(S - len(samples))]

    batch = PartBatch(
        points=jnp.asarray(points),
        points_gt=jnp.asarray(points_gt),
        local_feats=jnp.asarray(feats),
        point_mask=jnp.asarray(mask),
        part_valid=jnp.asarray(part_valid),
        sample_of_part=jnp.repeat(
            sample_offset + jnp.arange(S, dtype=jnp.int32), P
        ),
        anchor_part=jnp.asarray(anchor),
        rotations_gt=jnp.asarray(rots),
        translations_gt=jnp.asarray(trans),
        scale=jnp.asarray(scale),
        sample_valid=jnp.asarray(sample_valid),
        global_rotation=jnp.asarray(g_rot),
        global_translation=jnp.asarray(g_trans),
        # static flag: a fully dense batch lets attention skip mask plumbing.
        # (Distinct flag values compile distinct programs — two variants max.)
        no_padding=bool(mask.all() and part_valid.all() and sample_valid.all()),
    )
    return batch, names


def pack_samples(
    samples: list[Sample],
    max_points_per_batch: int = 400_000,
    shuffle: bool = False,
    seed: int = 0,
    s_multiple: int = 1,
) -> list[tuple[PartBatch, list[str]]]:
    """Convenience: plan + collate a full list of samples."""
    plans = plan_batches(
        [s.num_parts for s in samples],
        [s.max_part_points for s in samples],
        max_points_per_batch,
        shuffle=shuffle,
        seed=seed,
        s_multiple=s_multiple,
    )
    return [
        collate_to_part_batch([samples[i] for i in p.indices], p.N, p.P, p.S)
        for p in plans
    ]
