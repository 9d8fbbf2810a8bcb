"""Evaluation metrics, fully batched over the PartBatch layout.

Parity with /root/reference/rectified_point_flow/eval/metrics.py — same
definitions, but every per-sample/per-part Python loop becomes a masked
batched computation (the reference's metric loops are hot spot #3 in
SURVEY.md §3):

  - chamfer RMSE: sqrt(0.5 * (mean_x min_y d2 + mean_y min_x d2))
    (metrics.py:14-48), via chunked masked pairwise distances.
  - anchor-relative rotation/translation errors (metrics.py:165-303):
    relative poses w.r.t. each sample's anchor part, Rodrigues-trace angle,
    translation scaled back to meters; mean over valid non-anchor parts.
  - direct (anchor-free) errors over all valid parts (metrics.py:305-383).
  - rigidity RMSE: transformed-input vs generated, point- or part-averaged
    (metrics.py:511-622).
  - pairwise correspondence RMSE @ GT-proximity 5 cm (metrics.py:386-469).
  - overlap ratios at taus (metrics.py:625-691).
  - ECDF of errors (metrics.py:694-733).

All functions return (S,) per-sample values; invalid sample slots yield 0
(filter with batch.sample_valid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.batch import PartBatch
from ..core.procrustes import transform_points

HIGH = jax.lax.Precision.HIGHEST
INF = jnp.inf


def _sample_tokens(batch: PartBatch, pts: jax.Array):
    """(G,N,3) -> (S, P*N, 3) plus (S, P*N) mask (regular layout)."""
    S = batch.S
    P = batch.G // S
    N = batch.N
    return pts.reshape(S, P * N, 3), batch.point_mask.reshape(S, P * N)


def _masked_min_dist2(x, xm, y, ym, chunk: int = 2048):
    """Per row of x: min squared distance to valid rows of y.

    x: (S,Tx,3), y: (S,Ty,3), masks (S,T*) -> (S,Tx); invalid x rows get 0.
    Memory-chunked over Tx.
    """
    S, Tx, _ = x.shape
    pad = (-Tx) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        xm = jnp.pad(xm, ((0, 0), (0, pad)))
    nch = x.shape[1] // chunk
    xc = x.reshape(S, nch, chunk, 3).transpose(1, 0, 2, 3)
    y2 = jnp.sum(y * y, axis=-1)  # (S, Ty)

    def body(carry, xi):
        # xi: (S, chunk, 3)
        d2 = (
            jnp.sum(xi * xi, axis=-1)[..., None]
            - 2.0 * jnp.einsum("sct,syt->scy", xi, y, precision=HIGH)
            + y2[:, None, :]
        )
        d2 = jnp.where(ym[:, None, :], d2, INF)
        return carry, jnp.min(d2, axis=-1)  # (S, chunk)

    _, mins = jax.lax.scan(body, None, xc)
    mins = mins.transpose(1, 0, 2).reshape(S, Tx + pad)[:, :Tx]
    mins = jnp.maximum(mins, 0.0)  # numerical negatives
    return jnp.where(xm[:, :Tx] if pad else xm, mins, 0.0)


def chamfer_rmse(batch: PartBatch, pred: jax.Array) -> jax.Array:
    """Symmetric chamfer RMSE per sample in *scaled* space (ref compute_cd)."""
    x, xm = _sample_tokens(batch, batch.points_gt)
    y, ym = _sample_tokens(batch, pred)
    d_xy = _masked_min_dist2(x, xm, y, ym)
    d_yx = _masked_min_dist2(y, ym, x, xm)
    cnt_x = jnp.maximum(jnp.sum(xm, axis=1), 1.0)
    cnt_y = jnp.maximum(jnp.sum(ym, axis=1), 1.0)
    cd = jnp.sum(d_xy, axis=1) / cnt_x + jnp.sum(d_yx, axis=1) / cnt_y
    return jnp.sqrt(0.5 * cd)


def _per_part_view(batch: PartBatch, x: jax.Array):
    """(G, ...) -> (S, P, ...)."""
    S = batch.S
    P = batch.G // S
    return x.reshape((S, P) + x.shape[1:])


def _rot_angle_deg(delta_R: jax.Array) -> jax.Array:
    tr = jnp.trace(delta_R, axis1=-2, axis2=-1)
    cos = jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def transform_errors(
    batch: PartBatch,
    rotations_pred: jax.Array,     # (G, 3, 3)
    translations_pred: jax.Array,  # (G, 3)
    anchor_relative: bool = True,
):
    """Mean per-sample rotation (deg) / translation (m) errors.

    anchor_relative=True: errors of poses relative to the sample's anchor
    part, averaged over valid non-anchor parts (ref metrics.py:165-303).
    anchor_relative=False: direct GT-vs-pred errors over all valid parts
    (ref metrics.py:305-383).
    """
    S = batch.S
    P = batch.G // S
    Rg = _per_part_view(batch, batch.rotations_gt)       # (S,P,3,3)
    tg = _per_part_view(batch, batch.translations_gt)    # (S,P,3)
    Rp = _per_part_view(batch, rotations_pred)
    tp = _per_part_view(batch, translations_pred)
    valid = _per_part_view(batch, batch.part_valid)      # (S,P)
    anchor = _per_part_view(batch, batch.anchor_part)    # (S,P)

    if anchor_relative:
        # index of the (single) anchor part per sample; identity if none
        has_anchor = jnp.any(anchor, axis=1)
        a_idx = jnp.argmax(anchor, axis=1)               # (S,)
        take = lambda arr: jnp.take_along_axis(  # noqa: E731
            arr, a_idx.reshape((S, 1) + (1,) * (arr.ndim - 2)), axis=1
        ).squeeze(1)
        eye = jnp.broadcast_to(jnp.eye(3), (S, 3, 3))
        Rg_a = jnp.where(has_anchor[:, None, None], take(Rg), eye)
        tg_a = jnp.where(has_anchor[:, None], take(tg), 0.0)
        Rp_a = jnp.where(has_anchor[:, None, None], take(Rp), eye)
        tp_a = jnp.where(has_anchor[:, None], take(tp), 0.0)

        # relative pose: R_rel = R_a^T R_p ; t_rel = R_a^T (t_p - t_a)
        rel = lambda Ra, ta, R, t: (  # noqa: E731
            jnp.einsum("sji,spjk->spik", Ra, R, precision=HIGH),
            jnp.einsum("sji,spj->spi", Ra, t - ta[:, None, :], precision=HIGH),
        )
        Rg_rel, tg_rel = rel(Rg_a, tg_a, Rg, tg)
        Rp_rel, tp_rel = rel(Rp_a, tp_a, Rp, tp)
        delta_R = jnp.einsum("spji,spjk->spik", Rg_rel, Rp_rel, precision=HIGH)
        delta_t = (tp_rel - tg_rel) * batch.scale[:, None, None]
        count_mask = valid & ~anchor
    else:
        delta_R = jnp.einsum("spji,spjk->spik", Rg, Rp, precision=HIGH)
        delta_t = (tp - tg) * batch.scale[:, None, None]
        count_mask = valid

    rot_err = _rot_angle_deg(delta_R)                  # (S,P)
    trans_err = jnp.linalg.norm(delta_t, axis=-1)      # (S,P)
    m = count_mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return (
        jnp.sum(rot_err * m, axis=1) / n,
        jnp.sum(trans_err * m, axis=1) / n,
    )


def rigidity_rmse(
    batch: PartBatch,
    pred: jax.Array,               # (G, N, 3)
    rotations_pred: jax.Array,     # (G, 3, 3)
    translations_pred: jax.Array,  # (G, 3)
    in_meters: bool = True,
    average_per_part: bool = False,
) -> jax.Array:
    """RMSE between rigidly-transformed inputs and the generation (per sample)."""
    transformed = transform_points(rotations_pred, translations_pred, batch.points)
    se = jnp.sum((transformed - pred) ** 2, axis=-1)   # (G, N)
    m = batch.point_mask.astype(jnp.float32)
    S = batch.S
    P = batch.G // S
    if average_per_part:
        cnt = jnp.maximum(jnp.sum(m, axis=1), 1.0)     # (G,)
        part_rmse = jnp.sqrt(jnp.sum(se * m, axis=1) / cnt)
        pv = _per_part_view(batch, batch.part_valid).astype(jnp.float32)
        pr = part_rmse.reshape(S, P)
        out = jnp.sum(pr * pv, axis=1) / jnp.maximum(jnp.sum(pv, axis=1), 1.0)
    else:
        se_s = (se * m).reshape(S, -1).sum(axis=1)
        cnt_s = jnp.maximum(m.reshape(S, -1).sum(axis=1), 1.0)
        out = jnp.sqrt(se_s / cnt_s)
    if in_meters:
        out = out * batch.scale
    return out


def correspondence_rmse_pairs(
    batch: PartBatch,
    rotations_pred: jax.Array,
    translations_pred: jax.Array,
    distance_threshold: float = 0.05,
):
    """Pairwise correspondence RMSE in meters (ref metrics.py:386-469).

    For samples with exactly 2 valid parts: GT correspondences = nearest
    neighbors between the *metric-scaled* GT parts within the threshold; RMSE
    is between the pose-transformed inputs at those correspondences. Also
    returns the Redwood-style approximate transform-error RMSE.
    Samples without a valid pair get inf RMSE / 0 ratio.
    """
    S = batch.S
    P = batch.G // S
    assert P >= 2
    scale_pt = batch.per_sample_to_point(batch.scale)[..., None]  # (G,N,1)
    gt_m = (batch.points_gt * scale_pt).reshape(S, P, batch.N, 3)
    in_m = (batch.points * scale_pt).reshape(S, P, batch.N, 3)
    mask = batch.point_mask.reshape(S, P, batch.N)

    Rp = _per_part_view(batch, rotations_pred)
    tp = _per_part_view(batch, translations_pred) * batch.scale[:, None, None]
    pred_m = (
        jnp.einsum("spij,spnj->spni", Rp, in_m, precision=HIGH)
        + tp[:, :, None, :]
    )

    src_gt, tgt_gt = gt_m[:, 0], gt_m[:, 1]          # (S,N,3)
    src_m, tgt_m = mask[:, 0], mask[:, 1]
    src_pred, tgt_pred = pred_m[:, 0], pred_m[:, 1]

    # nearest valid GT target per GT source point (chunked)
    def nn(x, y, ym, chunk=2048):
        Tx = x.shape[1]
        pad = (-Tx) % chunk
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        nch = xp.shape[1] // chunk
        xc = xp.reshape(S, nch, chunk, 3).transpose(1, 0, 2, 3)
        y2 = jnp.sum(y * y, axis=-1)

        def body(_, xi):
            d2 = (
                jnp.sum(xi * xi, axis=-1)[..., None]
                - 2.0 * jnp.einsum("sct,syt->scy", xi, y, precision=HIGH)
                + y2[:, None, :]
            )
            d2 = jnp.where(ym[:, None, :], d2, INF)
            return _, (jnp.min(d2, axis=-1), jnp.argmin(d2, axis=-1))

        _, (mind2, idx) = jax.lax.scan(body, None, xc)
        mind2 = mind2.transpose(1, 0, 2).reshape(S, -1)[:, :Tx]
        idx = idx.transpose(1, 0, 2).reshape(S, -1)[:, :Tx]
        return jnp.sqrt(jnp.maximum(mind2, 0.0)), idx

    mind, nn_idx = nn(src_gt, tgt_gt, tgt_m)
    corr = src_m & (mind <= distance_threshold)       # (S,N)
    n_corr = jnp.sum(corr, axis=1)

    tgt_pred_at = jnp.take_along_axis(tgt_pred, nn_idx[..., None], axis=1)
    se = jnp.sum((src_pred - tgt_pred_at) ** 2, axis=-1)
    rmse = jnp.sqrt(
        jnp.sum(se * corr, axis=1) / jnp.maximum(n_corr, 1)
    )
    ratio = n_corr / jnp.maximum(jnp.sum(src_m, axis=1), 1)

    # pairwise-sample gate: the reference computes these metrics only for
    # 2-part samples (metrics.py:386-469); in a mixed batch with P>2 slots a
    # sample with more valid parts must not be scored on its first two
    valid_parts = jnp.sum(
        batch.part_valid.reshape(S, P).astype(jnp.int32), axis=1
    )
    pair_ok = (
        (valid_parts == 2)
        & (jnp.sum(mask[:, 0], axis=1) > 0)
        & (jnp.sum(mask[:, 1], axis=1) > 0)
        & (n_corr > 0)
    )
    rmse = jnp.where(pair_ok, rmse, INF)
    ratio = jnp.where(pair_ok, ratio, 0.0)

    # Redwood-style approximate transform error (identity covariance):
    # er = [dt, qx, qy, qz]; sqrt(er^T er) (ref metrics.py:487-508)
    Rg = _per_part_view(batch, batch.rotations_gt)
    tg = _per_part_view(batch, batch.translations_gt) * batch.scale[:, None, None]
    rel = lambda R, t: (  # noqa: E731  T_rel = T_1 o T_0^-1
        jnp.einsum("sij,skj->sik", R[:, 1], R[:, 0], precision=HIGH),
        t[:, 1]
        - jnp.einsum(
            "sij,skj,sk->si", R[:, 1], R[:, 0], t[:, 0], precision=HIGH
        ),
    )
    Rrel_gt, trel_gt = rel(Rg, tg)
    Rrel_p, trel_p = rel(Rp, tp)
    dR = jnp.einsum("sji,sjk->sik", Rrel_gt, Rrel_p, precision=HIGH)
    dt = trel_p - trel_gt
    # quaternion xyz from rotation matrix (w>=0 branch is fine for errors)
    qw = jnp.sqrt(jnp.maximum(1.0 + jnp.trace(dR, axis1=-2, axis2=-1), 1e-12)) / 2.0
    qx = (dR[:, 2, 1] - dR[:, 1, 2]) / jnp.maximum(4 * qw, 1e-12)
    qy = (dR[:, 0, 2] - dR[:, 2, 0]) / jnp.maximum(4 * qw, 1e-12)
    qz = (dR[:, 1, 0] - dR[:, 0, 1]) / jnp.maximum(4 * qw, 1e-12)
    er = jnp.concatenate([dt, jnp.stack([qx, qy, qz], -1)], axis=-1)
    terr = jnp.sqrt(jnp.sum(er * er, axis=-1))
    terr = jnp.where(pair_ok, terr, INF)
    return rmse, ratio, terr


def overlap_ratio(
    batch: PartBatch, pred: jax.Array, taus=(0.005, 0.01, 0.02)
) -> jax.Array:
    """Fraction of points with a cross-part neighbor within tau (T, S)."""
    S = batch.S
    P = batch.G // S
    N = batch.N
    pts = pred.reshape(S, P * N, 3)
    mask = batch.point_mask.reshape(S, P * N)
    part_id = jnp.broadcast_to(
        jnp.arange(P)[:, None], (P, N)
    ).reshape(1, P * N)

    # pad-safe: pad points already masked; chunked min over others
    T = P * N
    pad = (-T) % 1024
    if pad:
        pts_p = jnp.pad(pts, ((0, 0), (0, pad), (0, 0)))
        mask_p = jnp.pad(mask, ((0, 0), (0, pad)))
        pid_p = jnp.pad(part_id, ((0, 0), (0, pad)), constant_values=-1)
    else:
        pts_p, mask_p, pid_p = pts, mask, part_id
    y2 = jnp.sum(pts_p * pts_p, axis=-1)
    pid_full = jnp.broadcast_to(pid_p, (S, T + pad))

    def body(_, i0):
        xi = jax.lax.dynamic_slice_in_dim(pts_p, i0, 1024, axis=1)
        pi = jax.lax.dynamic_slice_in_dim(pid_full, i0, 1024, axis=1)
        d2 = (
            jnp.sum(xi * xi, axis=-1)[..., None]
            - 2.0 * jnp.einsum("sct,syt->scy", xi, pts_p, precision=HIGH)
            + y2[:, None, :]
        )
        ok = (pi[:, :, None] != pid_full[:, None, :]) & mask_p[:, None, :]
        d2 = jnp.where(ok, d2, INF)
        return _, jnp.min(d2, axis=-1)

    starts = jnp.arange(0, T + pad, 1024)
    _, mins = jax.lax.scan(body, None, starts)
    mind = jnp.sqrt(jnp.maximum(mins.transpose(1, 0, 2).reshape(S, -1)[:, :T], 0.0))
    cnt = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    out = []
    for tau in taus:
        flags = (mind <= tau) & mask
        out.append(jnp.sum(flags, axis=1) / cnt)
    return jnp.stack(out)


def _masked_nn(x, xm, y, ym, chunk: int = 2048):
    """Nearest valid y row per x row: returns (dist (B,Tx), idx (B,Tx)).

    Chunked over Tx; invalid y rows are never selected. Rows of x are NOT
    masked here (caller applies xm).
    """
    B, Tx, _ = x.shape
    pad = (-Tx) % chunk
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
    nch = xp.shape[1] // chunk
    xc = xp.reshape(B, nch, chunk, 3).transpose(1, 0, 2, 3)
    y2 = jnp.sum(y * y, axis=-1)

    def body(_, xi):
        d2 = (
            jnp.sum(xi * xi, axis=-1)[..., None]
            - 2.0 * jnp.einsum("sct,syt->scy", xi, y, precision=HIGH)
            + y2[:, None, :]
        )
        d2 = jnp.where(ym[:, None, :], d2, INF)
        return _, (jnp.min(d2, axis=-1), jnp.argmin(d2, axis=-1))

    _, (mind2, idx) = jax.lax.scan(body, None, xc)
    mind2 = mind2.transpose(1, 0, 2).reshape(B, -1)[:, :Tx]
    idx = idx.transpose(1, 0, 2).reshape(B, -1)[:, :Tx]
    return jnp.sqrt(jnp.maximum(mind2, 0.0)), idx


def icp_point_to_point(
    src: jax.Array,       # (B, N, 3)
    src_mask: jax.Array,  # (B, N)
    tgt: jax.Array,       # (B, M, 3)
    tgt_mask: jax.Array,  # (B, M)
    iters: int = 20,
    trim_fraction: float = 1.0,
    init: tuple[jax.Array, jax.Array] | None = None,
    return_residual: bool = False,
):
    """Batched point-to-point ICP: returns (R, t) with src @ R^T + t ≈ tgt.

    ``init``: optional (R0 (B,3,3), t0 (B,3)) starting pose — the basis for
    multi-restart refinement. ``return_residual`` additionally returns the
    final trimmed mean NN distance (B,) for ranking restarts.

    TPU-native replacement for pytorch3d ``iterative_closest_point`` (used by
    ref metrics.py:50-90 align_anchor and :177-261 use_icp refinement): a
    fixed-iteration ``lax.scan`` of masked NN + batched Kabsch instead of a
    convergence loop — fully vmappable, no host sync. Empty clouds return
    (I, 0).

    ``trim_fraction`` < 1 runs *trimmed* ICP: each iteration keeps only the
    closest ``trim_fraction`` of valid correspondences for the Kabsch fit,
    which makes the alignment robust to partial overlap (source points with
    no true counterpart in the target stop dragging the fit). No reference
    counterpart — pytorch3d's ICP is untrimmed; this is what makes
    post-registration refinement between partially-overlapping views work.
    """
    from ..core.procrustes import kabsch_masked

    src = src.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)

    def _trim_keep(d):
        """Validity mask of the closest trim_fraction of correspondences."""
        if trim_fraction >= 1.0:
            return src_mask
        dv = jnp.where(src_mask, d, jnp.inf)
        n_valid = jnp.sum(src_mask, axis=-1)                     # (B,)
        k = jnp.maximum(
            (n_valid.astype(jnp.float32) * trim_fraction).astype(jnp.int32),
            3,
        )
        ds = jnp.sort(dv, axis=-1)
        thr = jnp.take_along_axis(
            ds, jnp.minimum(k - 1, dv.shape[-1] - 1)[:, None], axis=-1
        )                                                        # (B,1)
        return src_mask & (dv <= thr)

    def body(carry, _):
        R, t = carry
        cur = transform_points(R, t, src)
        d, idx = _masked_nn(cur, src_mask, tgt, tgt_mask)
        corr = jnp.take_along_axis(tgt, idx[..., None], axis=1)  # (B,N,3)
        keep = _trim_keep(d)
        R, t = kabsch_masked(src, corr, keep)
        return (R, t), None

    B = src.shape[0]
    if init is None:
        R0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
        t0 = jnp.zeros((B, 3), jnp.float32)
    else:
        R0, t0 = (a.astype(jnp.float32) for a in init)
    (R, t), _ = jax.lax.scan(body, (R0, t0), None, length=iters)
    if not return_residual:
        return R, t
    d, _ = _masked_nn(transform_points(R, t, src), src_mask, tgt, tgt_mask)
    keep = _trim_keep(d)
    res = jnp.sum(jnp.where(keep, d, 0.0), axis=-1) / jnp.maximum(
        jnp.sum(keep, axis=-1), 1
    )
    return R, t, res


def align_anchor(batch: PartBatch, pred: jax.Array, iters: int = 20) -> jax.Array:
    """ICP-align each sample's predicted anchor part to its GT anchor part and
    apply the recovered transform to the whole predicted sample
    (ref metrics.py:50-90)."""
    S = batch.S
    P = batch.G // S
    N = batch.N
    anchor = _per_part_view(batch, batch.anchor_part)              # (S,P)
    a_idx = jnp.argmax(anchor, axis=1)                             # (S,)
    pred_p = pred.reshape(S, P, N, 3)
    gt_p = batch.points_gt.reshape(S, P, N, 3)
    mask_p = batch.point_mask.reshape(S, P, N)
    take = lambda arr: jnp.take_along_axis(  # noqa: E731
        arr, a_idx.reshape((S, 1) + (1,) * (arr.ndim - 2)), axis=1
    ).squeeze(1)
    src = take(pred_p)
    tgt = take(gt_p)
    m = take(mask_p)
    R, t = icp_point_to_point(src, m, tgt, m, iters=iters)
    aligned = transform_points(R[:, None], t[:, None], pred_p)     # (S,P,N,3)
    return aligned.reshape(batch.G, N, 3)


def transform_errors_icp(
    batch: PartBatch,
    rotations_pred: jax.Array,     # (G, 3, 3)
    translations_pred: jax.Array,  # (G, 3)
    iters: int = 20,
):
    """ICP-refined per-part errors (ref metrics.py:177-261 ``use_icp=True``):
    for each non-anchor part, ICP the GT part onto the pose-transformed
    condition part; the residual (delta R, delta t) IS the error."""
    transformed = transform_points(
        rotations_pred, translations_pred, batch.points
    )  # (G, N, 3)
    dR, dt = icp_point_to_point(
        batch.points_gt, batch.point_mask, transformed, batch.point_mask,
        iters=iters,
    )
    rot_err = _rot_angle_deg(_per_part_view(batch, dR))            # (S,P)
    scale = batch.scale[:, None]
    trans_err = jnp.linalg.norm(_per_part_view(batch, dt), axis=-1) * scale
    valid = _per_part_view(batch, batch.part_valid)
    anchor = _per_part_view(batch, batch.anchor_part)
    m = (valid & ~anchor).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return (
        jnp.sum(rot_err * m, axis=1) / n,
        jnp.sum(trans_err * m, axis=1) / n,
    )


def part_chamfer_matrix(batch: PartBatch, pred: jax.Array) -> jax.Array:
    """(S, P, P) pairwise part chamfer: cd[i, j] = CD(gt part i, pred part j)
    in scaled space (pytorch3d convention: sum of the two mean-squared-
    distance directions; ref compute_part_acc, metrics.py:121-152).
    Pairs with an empty part get +inf.
    """
    S = batch.S
    P = batch.G // S
    N = batch.N
    gt = batch.points_gt.reshape(S, P, N, 3)
    pr = pred.reshape(S, P, N, 3)
    mask = batch.point_mask.reshape(S, P, N)
    cnt = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)                 # (S,P)

    def pair_cd(ij):
        i, j = ij // P, ij % P
        x = jax.lax.dynamic_index_in_dim(gt, i, axis=1, keepdims=False)
        xm = jax.lax.dynamic_index_in_dim(mask, i, axis=1, keepdims=False)
        y = jax.lax.dynamic_index_in_dim(pr, j, axis=1, keepdims=False)
        ym = jax.lax.dynamic_index_in_dim(mask, j, axis=1, keepdims=False)
        d_xy = _masked_min_dist2(x, xm, y, ym, chunk=1024)         # (S,N)
        d_yx = _masked_min_dist2(y, ym, x, xm, chunk=1024)
        ci = jax.lax.dynamic_index_in_dim(cnt, i, axis=1, keepdims=False)
        cj = jax.lax.dynamic_index_in_dim(cnt, j, axis=1, keepdims=False)
        cd = jnp.sum(d_xy, axis=1) / ci + jnp.sum(d_yx, axis=1) / cj
        empty = (jnp.sum(xm, axis=1) == 0) | (jnp.sum(ym, axis=1) == 0)
        return jnp.where(empty, INF, cd)                           # (S,)

    cds = jax.lax.map(pair_cd, jnp.arange(P * P))                  # (P*P, S)
    return cds.T.reshape(S, P, P)


def part_accuracy(
    batch: PartBatch,
    pred: jax.Array,
    threshold: float = 0.01,
) -> tuple[np.ndarray, np.ndarray]:
    """Hungarian-matched part accuracy (ref metrics.py:92-163).

    Returns (part_acc (S,), matched_ids (S, P)): the fraction of parts whose
    best-assignment chamfer (scaled space) is under ``threshold``; matching by
    scipy ``linear_sum_assignment`` on the binary over-threshold cost, exactly
    like the reference (assignment over valid parts only). Device computes the
    (S,P,P) chamfer matrix; the tiny assignment runs on host.
    """
    from scipy.optimize import linear_sum_assignment

    S = batch.S
    P = batch.G // S
    cd = np.asarray(part_chamfer_matrix(batch, pred))              # (S,P,P)
    valid = np.asarray(_per_part_view(batch, batch.part_valid))    # (S,P)
    acc = np.zeros(S, np.float32)
    matched = np.tile(np.arange(P, dtype=np.int64), (S, 1))
    for s in range(S):
        idx = np.flatnonzero(valid[s])
        if len(idx) == 0:
            continue
        sub = cd[s][np.ix_(idx, idx)]
        cost = (sub >= threshold).astype(np.float64)
        rows, cols = linear_sum_assignment(cost)
        ok = sub[rows, cols] < threshold
        acc[s] = float(ok.sum()) / len(idx)
        matched[s, idx[rows]] = idx[cols]
    return acc, matched


def recall_at(values: jax.Array, threshold: float) -> jax.Array:
    return (values <= threshold).astype(jnp.float32)


def combined_recall(rot_err, trans_err, rot_thresh, trans_thresh) -> jax.Array:
    return ((rot_err <= rot_thresh) & (trans_err <= trans_thresh)).astype(
        jnp.float32
    )


def ecdf(errors: np.ndarray, splits) -> tuple[np.ndarray, float, float]:
    """ECDF values at splits + mean + median (host-side; ref metrics.py:694)."""
    errors = np.asarray(errors)
    vals = np.array([np.mean(errors < s) for s in splits], np.float32)
    return vals, float(np.mean(errors)), float(np.median(errors))
