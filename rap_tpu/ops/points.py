"""Point-cloud preprocessing ops: voxel ops, FPS, kNN, outlier removal.

TPU/host-native replacements for the reference's external native kernels
(SURVEY.md §2.5): pytorch3d `sample_farthest_points` / `ball_query`, Open3D
statistical outlier removal, and the torch scatter-reduce voxel downsampler
(dataset_process/utils/dataset_utils.py:279-322) plus the allocation logic of
dataset_process/utils/point_sampling_utils.py.

Device ops (FPS, kNN, ball query) are JAX with static shapes and masks; host
ops (voxel hashing) are numpy — they live in the input pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HIGH = jax.lax.Precision.HIGHEST


# --------------------------------------------------------------------------
# Host-side voxel ops (input pipeline)
# --------------------------------------------------------------------------

def voxel_keys(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Integer voxel id per point (collision-free via lexicographic encode)."""
    ijk = np.floor(points / voxel_size).astype(np.int64)
    ijk -= ijk.min(axis=0)
    dims = ijk.max(axis=0) + 1
    return (ijk[:, 0] * dims[1] + ijk[:, 1]) * dims[2] + ijk[:, 2]


def voxel_coverage(points: np.ndarray, voxel_size: float) -> int:
    """Number of occupied voxels (ref point_sampling_utils.py:11-31)."""
    if len(points) == 0:
        return 0
    return int(np.unique(voxel_keys(points, voxel_size)).size)


def voxel_downsample(
    points: np.ndarray,
    voxel_size: float,
    attrs: np.ndarray | None = None,
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """Average points (and optional per-point attrs) per voxel."""
    if len(points) == 0:
        return points if attrs is None else (points, attrs)
    if attrs is None:
        from .. import native

        fast = native.voxel_downsample(points, voxel_size)
        if fast is not None:
            return fast.astype(points.dtype, copy=False)
    keys = voxel_keys(points, voxel_size)
    uniq, inv, counts = np.unique(keys, return_inverse=True, return_counts=True)
    sums = np.zeros((uniq.size, 3), np.float64)
    np.add.at(sums, inv, points)
    out = (sums / counts[:, None]).astype(points.dtype)
    if attrs is None:
        return out
    asum = np.zeros((uniq.size, attrs.shape[1]), np.float64)
    np.add.at(asum, inv, attrs)
    return out, (asum / counts[:, None]).astype(attrs.dtype)


def random_downsample(
    points: np.ndarray, k: int, rng: np.random.Generator
) -> np.ndarray:
    if len(points) <= k:
        return np.arange(len(points))
    return rng.choice(len(points), k, replace=False)


# --------------------------------------------------------------------------
# Farthest point sampling (device, exact, masked)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k",))
def farthest_point_sampling(
    points: jax.Array,      # (B, N, 3)
    mask: jax.Array,        # (B, N) bool
    k: int,
    start_idx: jax.Array | None = None,  # (B,) optional seed indices
) -> jax.Array:
    """Exact FPS; returns (B, k) indices into N. Parts with fewer than k valid
    points repeat their farthest points (callers mask by count). Equivalent to
    pytorch3d sample_farthest_points with random start."""
    B, N, _ = points.shape
    pts = points.astype(jnp.float32)
    big = jnp.float32(1e30)
    valid = mask.astype(jnp.float32)

    if start_idx is None:
        start_idx = jnp.argmax(mask, axis=1)

    def dist2_to(idx):
        p = jnp.take_along_axis(pts, idx[:, None, None], axis=1)  # (B,1,3)
        d = pts - p
        return jnp.sum(d * d, axis=-1)  # (B, N)

    idxs0 = jnp.zeros((B, k), jnp.int32).at[:, 0].set(start_idx.astype(jnp.int32))
    min_d2 = jnp.where(mask, dist2_to(start_idx), -big)

    def step(i, carry):
        min_d2, idxs = carry
        nxt = jnp.argmax(min_d2, axis=1).astype(jnp.int32)  # (B,)
        idxs = idxs.at[:, i].set(nxt)
        d2 = dist2_to(nxt)
        min_d2 = jnp.where(mask, jnp.minimum(min_d2, d2), -big)
        return min_d2, idxs

    _, idxs = jax.lax.fori_loop(1, k, step, (min_d2, idxs0))
    return idxs


def fps_numpy(points: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """Host FPS (exact, random start); native C++ core when built."""
    n = len(points)
    if n <= k:
        return np.arange(n)
    start = int(rng.integers(n))
    from .. import native

    fast = native.fps(points, k, start)
    if fast is not None:
        return fast
    idxs = np.empty(k, np.int64)
    idxs[0] = start
    d2 = np.sum((points - points[idxs[0]]) ** 2, axis=1)
    for i in range(1, k):
        idxs[i] = int(np.argmax(d2))
        nd = np.sum((points - points[idxs[i]]) ** 2, axis=1)
        np.minimum(d2, nd, out=d2)
    return idxs


# --------------------------------------------------------------------------
# kNN / ball query (device, chunked)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn(
    queries: jax.Array,   # (Q, 3)
    points: jax.Array,    # (N, 3)
    mask: jax.Array,      # (N,) bool
    k: int,
    chunk: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """k nearest valid points per query: (Q, k) distances², (Q, k) indices."""
    Q = queries.shape[0]
    pad = (-Q) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    y2 = jnp.sum(points * points, axis=-1)

    def body(_, qi):
        d2 = (
            jnp.sum(qi * qi, axis=-1)[:, None]
            - 2.0 * jnp.einsum("qd,nd->qn", qi, points, precision=HIGH)
            + y2[None, :]
        )
        d2 = jnp.where(mask[None, :], d2, jnp.inf)
        neg, idx = jax.lax.top_k(-d2, k)
        return _, (-neg, idx)

    qc = qp.reshape(-1, chunk, 3)
    _, (d2s, idxs) = jax.lax.scan(body, None, qc)
    d2s = d2s.reshape(-1, k)[:Q]
    idxs = idxs.reshape(-1, k)[:Q]
    return jnp.maximum(d2s, 0.0), idxs


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def ball_query(
    queries: jax.Array,   # (Q, 3)
    points: jax.Array,    # (N, 3)
    mask: jax.Array,      # (N,)
    radius: float,
    k: int,
    chunk: int = 1024,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Up to k points within radius per query (pytorch3d ball_query semantics:
    the FIRST k in index order, not the nearest). Returns (idx (Q,k), count
    (Q,), within (Q,k) bool). Slots beyond `count` replicate the first hit so
    gathers stay valid (ref patch_embedder.py:122-131 replaces invalid
    neighbors with a valid one)."""
    Q = queries.shape[0]
    N = points.shape[0]
    pad = (-Q) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    y2 = jnp.sum(points * points, axis=-1)
    r2 = radius * radius

    def body(_, qi):
        d2 = (
            jnp.sum(qi * qi, axis=-1)[:, None]
            - 2.0 * jnp.einsum("qd,nd->qn", qi, points, precision=HIGH)
            + y2[None, :]
        )
        ok = (d2 <= r2) & mask[None, :]
        # first-k-in-order: rank = position among hits; select rank < k
        rank = jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1
        sel = ok & (rank < k)
        # scatter indices of selected hits into slots [0, k)
        slot = jnp.where(sel, rank, k)  # invalid -> overflow slot
        cols = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), d2.shape)
        idx = jnp.full((qi.shape[0], k + 1), 0, jnp.int32)
        idx = idx.at[
            jnp.broadcast_to(jnp.arange(qi.shape[0])[:, None], d2.shape), slot
        ].max(jnp.where(sel, cols, 0))
        idx = idx[:, :k]
        cnt = jnp.minimum(jnp.sum(ok, axis=1), k)
        within = jnp.arange(k)[None, :] < cnt[:, None]
        # replicate the first hit into empty slots
        first = idx[:, :1]
        idx = jnp.where(within, idx, first)
        return _, (idx, cnt, within)

    qc = qp.reshape(-1, chunk, 3)
    _, (idx, cnt, within) = jax.lax.scan(body, None, qc)
    return (
        idx.reshape(-1, k)[:Q],
        cnt.reshape(-1)[:Q],
        within.reshape(-1, k)[:Q],
    )


# --------------------------------------------------------------------------
# Statistical outlier removal (Open3D semantics)
# --------------------------------------------------------------------------

def shape_bucket(n: int, minimum: int = 256) -> int:
    """Next power-of-two >= n. Host-facing device ops pad their inputs to
    bucketed shapes so a many-sample offline run compiles O(log N) programs
    instead of one per distinct cloud size."""
    b = minimum
    while b < n:
        b *= 2
    return b


def statistical_outlier_removal(
    points: np.ndarray, nb_neighbors: int = 20, std_ratio: float = 2.0
) -> np.ndarray:
    """Indices of inliers: mean kNN distance <= global mean + ratio * std
    (Open3D remove_statistical_outlier semantics; ref
    extract_sample_features.py:356-413)."""
    n = len(points)
    if n <= nb_neighbors:
        return np.arange(n)
    nb = shape_bucket(n)
    padded = np.zeros((nb, 3), np.float32)
    padded[:n] = points
    mask = np.arange(nb) < n
    d2, _ = knn(
        jnp.asarray(padded), jnp.asarray(padded), jnp.asarray(mask),
        nb_neighbors + 1,
    )
    # drop self (distance 0, first column); padded query rows sliced off
    mean_d = np.asarray(jnp.mean(jnp.sqrt(d2[:n, 1:]), axis=1))
    mu, sd = mean_d.mean(), mean_d.std()
    return np.where(mean_d <= mu + std_ratio * sd)[0]


# --------------------------------------------------------------------------
# Allocation (host; ref point_sampling_utils.py)
# --------------------------------------------------------------------------

def adaptive_sample_counts(
    parts: list[np.ndarray],
    voxel_size: float,
    voxel_ratio: float,
    min_points_per_part: int,
    max_sample_points: int,
) -> list[int]:
    """voxel_adaptive: occupied voxels * ratio, clamped (ref :33-84)."""
    out = []
    for pts in parts:
        if len(pts) == 0:
            out.append(0)
            continue
        c = int(voxel_coverage(pts, voxel_size) * voxel_ratio)
        c = max(min_points_per_part, c)
        c = min(len(pts), c, max_sample_points)
        out.append(c)
    return out


def allocate_by_point_count(
    pts_per_part: np.ndarray,
    num_points: int,
    min_points_per_part: int,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Proportional allocation with min constraints + stochastic remainder
    balancing (ref :151-215).

    Corner case (matches the reference): when even the scaled-down minimums
    exceed the budget, the 1-point-per-part floor wins and the returned total
    can exceed ``num_points`` — callers with hard budgets must re-check."""
    rng = rng or np.random.default_rng(0)
    pts_per_part = np.asarray(pts_per_part)
    min_per = np.minimum(min_points_per_part, pts_per_part)
    if min_per.sum() > num_points:
        scale = num_points / min_per.sum()
        min_per = np.maximum(1, np.round(min_per * scale).astype(int))
    target = min_per.copy()
    remaining = num_points - target.sum()
    if remaining > 0:
        cap = pts_per_part - target
        if cap.sum() > 0:
            extra = np.round(cap * remaining / cap.sum()).astype(int)
            target = np.minimum(target + extra, pts_per_part)
            diff = num_points - target.sum()
            while diff != 0:
                valid = target < pts_per_part if diff > 0 else target > min_per
                if not valid.any():
                    break
                i = rng.choice(np.where(valid)[0])
                target[i] += 1 if diff > 0 else -1
                diff += -1 if diff > 0 else 1
    return target


def allocate_by_spatial_coverage(
    parts: list[np.ndarray],
    num_points: int,
    min_points_per_part: int,
    voxel_size: float,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Allocation proportional to per-part voxel coverage rather than point
    count (ref point_sampling_utils.py:194-261): extras distributed by the
    share of occupied voxels, remainder balanced one point at a time with
    coverage-weighted (deficit) / inverse-coverage-weighted (surplus) draws.
    Favors spatially large sparse parts over dense small ones."""
    rng = rng or np.random.default_rng(0)
    pts_per_part = np.array([len(p) for p in parts])
    coverage = np.array(
        [voxel_coverage(p, voxel_size) if len(p) else 0 for p in parts],
        np.float64,
    )
    min_per = np.minimum(min_points_per_part, pts_per_part)
    if min_per.sum() > num_points:
        scale = num_points / min_per.sum()
        min_per = np.maximum(1, np.round(min_per * scale).astype(int))
    target = min_per.copy()
    remaining = num_points - target.sum()
    if remaining > 0 and coverage.sum() > 0:
        cap = pts_per_part - target
        extra = np.round(coverage / coverage.sum() * remaining).astype(int)
        target = target + np.minimum(extra, cap)
        diff = num_points - target.sum()
        for _ in range(abs(int(diff)) + len(parts)):
            if diff == 0:
                break
            valid = target < pts_per_part if diff > 0 else target > min_per
            if not valid.any():
                break
            idx = np.where(valid)[0]
            w = coverage[idx]
            if w.sum() > 0:
                w = (w if diff > 0 else 1.0 / (w + 1e-8))
                i = idx[rng.choice(len(idx), p=w / w.sum())]
            else:
                i = rng.choice(idx)
            target[i] += 1 if diff > 0 else -1
            diff += -1 if diff > 0 else 1
    return target
