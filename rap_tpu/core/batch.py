"""Bucketed part-major batch representation.

This is the TPU-native replacement for the reference's packed variable-length
representation (a flat ``(TP, 3)`` tensor + ``cu_seqlens_batch``/``cu_seqlens_part``
prefix sums; see /root/reference/rectified_point_flow/data/datamodule.py:169-198 and
utils/point_clouds.py). XLA wants static shapes, so a batch here is a fixed-shape
part-major layout:

  - ``G`` parts ("views"), each padded to ``N`` points (``N`` from a bucket ladder),
  - ``S`` sample slots; parts of one sample occupy a *contiguous* run of part slots
    (this contiguity is what lets the attention kernels skip off-diagonal blocks),
  - boolean masks for padded points / parts / samples.

Per-sample scalars (timestep, scale) live in ``(S,)`` arrays and are broadcast to
parts/points by gathers on ``sample_of_part`` — the static-shape equivalent of the
reference's ``repeat_by_cu_seqlens`` (utils/point_clouds.py:161-184).

Invariants (checked by :func:`validate`):
  - ``sample_of_part`` is non-decreasing, in ``[0, S)``, and
    ``part_valid=False`` on padded slots. Two padded-slot id conventions
    exist and both are legal: the regular collator
    (data/packer.py collate_to_part_batch) gives every slot its own sample
    id (``repeat(arange(S), P)``); the irregular synthetic builder reuses
    the last valid sample's id. Segment masks stay block-diagonal either
    way because invalid parts are masked out.
  - invalid points have ``point_mask=False`` and zeroed coordinates.
  - each valid sample has >=1 valid part, exactly one anchor part among them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class PartBatch(struct.PyTreeNode):
    """A fixed-shape batch of multi-part point clouds.

    Shapes: ``G`` = padded part count, ``N`` = padded points per part,
    ``S`` = padded sample count, ``F`` = local feature dim.
    """

    # Per-point
    points: jax.Array          # (G, N, 3) f32 — condition coords (unposed, augmented)
    points_gt: jax.Array       # (G, N, 3) f32 — registered GT coords (scaled space)
    local_feats: jax.Array     # (G, N, F) f32 — e.g. MiniSpinNet descriptors (or zeros)
    point_mask: jax.Array      # (G, N) bool

    # Per-part
    part_valid: jax.Array      # (G,) bool
    sample_of_part: jax.Array  # (G,) i32 — owning sample slot
    anchor_part: jax.Array     # (G,) bool — True => anchor (largest) part
    rotations_gt: jax.Array    # (G, 3, 3) f32 — GT rotation: pts @ R^T + t == pts_gt
    translations_gt: jax.Array  # (G, 3) f32

    # Per-sample
    scale: jax.Array           # (S,) f32 — normalization scale (meters per unit)
    sample_valid: jax.Array    # (S,) bool
    # preprocessing global pose (ref dataset.py:411-448 sample dict): the
    # rotation/centering applied to the whole scene before augmentation, in
    # meters; consumed by the evaluator's global-transform artifacts
    # (ref evaluator.py:372-383). None when the source doesn't provide it.
    global_rotation: jax.Array | None = None     # (S, 3, 3) f32
    global_translation: jax.Array | None = None  # (S, 3) f32

    # Static (non-pytree) metadata: True iff point_mask is all-True AND every
    # part/sample slot is valid — i.e. the batch carries zero padding. Set by
    # the packer/constructors host-side; lets the attention layers take the
    # mask-free pallas fast path (ops/pallas_attention.py no-padding kernel).
    no_padding: bool = struct.field(pytree_node=False, default=False)

    # ---- static shape helpers -------------------------------------------------
    @property
    def G(self) -> int:
        return self.points.shape[0]

    @property
    def N(self) -> int:
        return self.points.shape[1]

    @property
    def S(self) -> int:
        return self.scale.shape[0]

    @property
    def num_tokens(self) -> int:
        return self.G * self.N

    # ---- broadcast helpers ----------------------------------------------------
    def per_sample_to_part(self, x: jax.Array) -> jax.Array:
        """Gather (S, ...) -> (G, ...) by owning sample."""
        return jnp.take(x, self.sample_of_part, axis=0)

    def per_sample_to_point(self, x: jax.Array) -> jax.Array:
        """Broadcast (S, ...) -> (G, N, ...)."""
        g = self.per_sample_to_part(x)
        return jnp.broadcast_to(
            g[:, None, ...], (self.G, self.N) + x.shape[1:]
        )

    def per_part_to_point(self, x: jax.Array) -> jax.Array:
        """Broadcast (G, ...) -> (G, N, ...)."""
        return jnp.broadcast_to(x[:, None, ...], (self.G, self.N) + x.shape[1:])

    @property
    def anchor_point_mask(self) -> jax.Array:
        """(G, N) bool — True for valid points of anchor parts."""
        return self.point_mask & self.anchor_part[:, None]

    @property
    def points_per_part(self) -> jax.Array:
        """(G,) i32 — valid point count per part."""
        return jnp.sum(self.point_mask.astype(jnp.int32), axis=1)

    @property
    def part_seg_ids(self) -> jax.Array:
        """(G*N,) i32 segment ids for part-wise attention; -1 for invalid tokens."""
        ids = jnp.broadcast_to(
            jnp.arange(self.G, dtype=jnp.int32)[:, None], (self.G, self.N)
        )
        return jnp.where(self.point_mask, ids, -1).reshape(-1)

    @property
    def sample_seg_ids(self) -> jax.Array:
        """(G*N,) i32 segment ids for global (per-sample) attention; -1 invalid."""
        ids = jnp.broadcast_to(
            self.sample_of_part.astype(jnp.int32)[:, None], (self.G, self.N)
        )
        return jnp.where(self.point_mask, ids, -1).reshape(-1)


def make_synthetic_batch(
    key: jax.Array,
    parts_per_sample: list[int],
    points_per_part: list[list[int]],
    N: int,
    G: int | None = None,
    S: int | None = None,
    feat_dim: int = 32,
) -> PartBatch:
    """Build a synthetic PartBatch for tests: random GT clouds, random rigid poses.

    Mirrors the label contract of the reference dataset transform
    (/root/reference/rectified_point_flow/data/dataset.py:733-900): per part,
    ``points = (points_gt_centered) @ R_aug`` and the stored GT pose satisfies
    ``points @ R^T + t == points_gt``; the anchor (largest) part has R=I.
    """
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    n_samples = len(parts_per_sample)
    total_parts = sum(parts_per_sample)
    G = G or total_parts
    S = S or n_samples
    assert G >= total_parts and S >= n_samples

    points = np.zeros((G, N, 3), np.float32)
    points_gt = np.zeros((G, N, 3), np.float32)
    feats = np.zeros((G, N, feat_dim), np.float32)
    mask = np.zeros((G, N), bool)
    part_valid = np.zeros(G, bool)
    sample_of_part = np.zeros(G, np.int32)
    anchor = np.zeros(G, bool)
    rots = np.tile(np.eye(3, dtype=np.float32), (G, 1, 1))
    trans = np.zeros((G, 3), np.float32)
    scale = np.ones(S, np.float32)
    sample_valid = np.zeros(S, bool)

    g = 0
    for s in range(n_samples):
        counts = points_per_part[s]
        assert len(counts) == parts_per_sample[s]
        anchor_idx = int(np.argmax(counts))
        for p, cnt in enumerate(counts):
            assert 0 < cnt <= N
            gt = rng.standard_normal((cnt, 3)).astype(np.float32)
            # random rigid augmentation: center part, random rotation
            from scipy.spatial.transform import Rotation

            center = gt.mean(0)
            if p == anchor_idx:
                R_inv = np.eye(3, dtype=np.float32)
                aug = gt.copy()
                t = np.zeros(3, np.float32)
            else:
                R_fwd = Rotation.random(random_state=rng).as_matrix().astype(np.float32)
                aug = (gt - center) @ R_fwd.T
                R_inv = R_fwd.T  # pose rotation: aug @ R_inv^T + center == gt
                t = center
            points_gt[g, :cnt] = gt
            points[g, :cnt] = aug
            feats[g, :cnt] = rng.standard_normal((cnt, feat_dim)).astype(np.float32)
            mask[g, :cnt] = True
            part_valid[g] = True
            sample_of_part[g] = s
            anchor[g] = p == anchor_idx
            rots[g] = R_inv
            trans[g] = t
            g += 1
        sample_valid[s] = True
    # padded part slots keep the last sample id (preserves block-diagonal layout)
    if g < G:
        sample_of_part[g:] = sample_of_part[g - 1] if g > 0 else 0

    return PartBatch(
        points=jnp.asarray(points),
        points_gt=jnp.asarray(points_gt),
        local_feats=jnp.asarray(feats),
        point_mask=jnp.asarray(mask),
        part_valid=jnp.asarray(part_valid),
        sample_of_part=jnp.asarray(sample_of_part),
        anchor_part=jnp.asarray(anchor),
        rotations_gt=jnp.asarray(rots),
        translations_gt=jnp.asarray(trans),
        scale=jnp.asarray(scale),
        sample_valid=jnp.asarray(sample_valid),
        global_rotation=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (S, 3, 3)),
        global_translation=jnp.zeros((S, 3), jnp.float32),
        no_padding=bool(mask.all() and part_valid.all() and sample_valid.all()),
    )


def make_regular_synthetic_batch(
    key: jax.Array,
    points_per_part: list[list[int]],
    N: int,
    P: int,
    S: int | None = None,
    feat_dim: int = 32,
) -> PartBatch:
    """Synthetic batch in the *regular* layout the model requires:
    G = S*P, ``sample_of_part == repeat(arange(S), P)``; each sample's parts
    occupy its own P-slot block (padded slots have part_valid=False).
    """
    n_samples = len(points_per_part)
    S = S or n_samples
    assert all(len(c) <= P for c in points_per_part)
    b = make_synthetic_batch(
        key,
        parts_per_sample=[len(c) for c in points_per_part],
        points_per_part=points_per_part,
        N=N,
        G=sum(len(c) for c in points_per_part),
        S=S,
        feat_dim=feat_dim,
    )
    # scatter the compact parts into per-sample P-blocks
    G = S * P
    idx = []
    src = 0
    for s in range(n_samples):
        for p in range(len(points_per_part[s])):
            idx.append((s * P + p, src))
            src += 1
    dst = np.array([d for d, _ in idx])
    srcs = np.array([s0 for _, s0 in idx])

    def scatter(arr, fill=0):
        out = np.full((G,) + arr.shape[1:], fill, dtype=arr.dtype)
        out[dst] = np.asarray(arr)[srcs]
        return jnp.asarray(out)

    rots = np.array(np.asarray(scatter(np.asarray(b.rotations_gt))))
    rots[~np.isin(np.arange(G), dst)] = np.eye(3, dtype=np.float32)
    return PartBatch(
        points=scatter(b.points),
        points_gt=scatter(b.points_gt),
        local_feats=scatter(b.local_feats),
        point_mask=scatter(b.point_mask, fill=False),
        part_valid=scatter(b.part_valid, fill=False),
        sample_of_part=jnp.repeat(jnp.arange(S, dtype=jnp.int32), P),
        anchor_part=scatter(b.anchor_part, fill=False),
        rotations_gt=jnp.asarray(rots),
        translations_gt=scatter(b.translations_gt),
        scale=b.scale,
        sample_valid=b.sample_valid,
        global_rotation=b.global_rotation,
        global_translation=b.global_translation,
        no_padding=b.no_padding and len(dst) == G,
    )


def validate(batch: PartBatch) -> None:
    """Host-side invariant checks (for tests / data pipeline debugging)."""
    sop = np.asarray(batch.sample_of_part)
    pv = np.asarray(batch.part_valid)
    pm = np.asarray(batch.point_mask)
    sv = np.asarray(batch.sample_valid)
    anc = np.asarray(batch.anchor_part)
    assert (np.diff(sop) >= 0).all(), "sample_of_part must be non-decreasing"
    assert sop.min() >= 0 and sop.max() < batch.S
    # masked point slots must hold zeroed coordinates (ops that sum-then-
    # divide over the point axis rely on padded zeros)
    pts = np.asarray(batch.points)
    gts = np.asarray(batch.points_gt)
    pad = ~pm[..., None]
    assert not (pts * pad).any(), "masked points carry nonzero coordinates"
    assert not (gts * pad).any(), "masked GT points carry nonzero coordinates"
    assert not (anc & ~pv).any(), "anchor flags on invalid parts"
    assert not (pm.any(axis=1) & ~pv).any(), "points on invalid parts"
    assert (pm.any(axis=1) | ~pv).all(), "valid parts must have >=1 point"
    for s in range(batch.S):
        sel = (sop == s) & pv
        if sv[s]:
            assert sel.any(), f"valid sample {s} has no parts"
            assert anc[sel].sum() == 1, f"sample {s} needs exactly one anchor"
        else:
            assert not sel.any(), f"invalid sample {s} has parts"
