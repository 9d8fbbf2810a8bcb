"""Rectified Point Flow orchestration: training forward, sampling, pose fitting.

The TPU-native equivalent of /root/reference/rectified_point_flow/modeling.py
(RectifiedPointFlow LightningModule): pure functions over (params, config,
PartBatch) instead of a stateful module; train/eval steps are jitted by the
trainer (rap_tpu/train) and the apps (rap_tpu/apps).

Parity notes:
  - training target and loss: modeling.py:186-201, 284-302.
  - timestep schemes: modeling.py:134-166 (core/flow.py).
  - sampling wrapper incl. transformer-feature capture on the final step:
    modeling.py:632-741 — here features come from one extra forward at the
    final x_t (cheap relative to the ODE loop, keeps the scan clean).
  - multi-generation best-of-N / rigidity-selection logic lives in
    rap_tpu/eval/evaluator.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .core import flow, procrustes
from .core.batch import PartBatch
from .core.sampler import SampleResult, flow_sampler
from .models.config import DiTConfig
from .models.dit import dit_forward


@dataclasses.dataclass(frozen=True)
class RPFConfig:
    """Pipeline configuration (reference RAP_inference.yaml + modeling.py)."""

    model: DiTConfig = dataclasses.field(default_factory=DiTConfig)
    loss_type: str = "mse"
    timestep_sampling: str = "u_shaped"
    inference_sampling_steps: int = 10
    inference_sampler: str = "euler"
    # ODE timestep grid (core/sampler.make_schedule): uniform (the reference
    # protocol), cosine, or power:<k>. A non-uniform grid re-allocates the
    # step budget at inference time with no retraining.
    inference_schedule: str = "uniform"
    n_generations: int = 1
    rigidity_forcing: bool = True
    return_end_point_trajectory: bool = True
    # TPU-side training extension (no reference counterpart): auxiliary
    # Kabsch pose loss on the implied endpoint x0_hat = x_t - t*v_pred.
    # Pointwise velocity MSE buries the pose signal at t->1 (a blurry
    # posterior-mean prediction has low MSE but a meaningless pose); fitting
    # the per-part rigid pose of x0_hat and penalizing its rotation/translation
    # error supervises exactly the quantity the evaluator scores. 0 = off.
    pose_loss_weight: float = 0.0
    # TPU-side inference extension (no reference counterpart; the sampler is
    # the only per-step cost, ref sampler.py:79-92): run the first
    # ``prune_coarse_steps`` ODE steps on a 1/prune_factor random subsample
    # of every part, reconstruct the full-resolution state EXACTLY at the
    # switch, and finish full-res. Exactness: under rigidity forcing the
    # state is x_t = (1-t)·(R_g·cond_g + t_g) + t·x_1 — fully determined by
    # per-part poses (recovered from the subset by Kabsch, exact on a
    # rigid-by-construction cloud) plus the stored noise; only the velocity
    # QUERIES are approximated on the subset. The field at t→1 is
    # low-frequency (docs/synthetic_training.md t-binned loss analysis),
    # which is why coarse early queries lose little. Attention cost is
    # quadratic in tokens, so each pruned step costs ~1/factor² of a full
    # step. Requires rigidity_forcing. 0 = off.
    prune_coarse_steps: int = 0
    prune_factor: int = 4


def parts_per_sample(batch: PartBatch) -> int:
    """Static P of the regular layout (G == S * P)."""
    assert batch.G % batch.S == 0, "batch is not in regular layout"
    return batch.G // batch.S


def velocity_fn(params, cfg: RPFConfig, batch: PartBatch, **fwd_kw):
    """Build the (x_t, t_scalar) -> v closure used by the ODE sampler."""
    P = parts_per_sample(batch)

    def fn(x_t: jax.Array, t) -> jax.Array:
        ts = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (batch.S,))
        return dit_forward(
            params, cfg.model, x_t, ts, batch, parts_per_sample=P, **fwd_kw
        )

    return fn


def training_forward(
    params,
    cfg: RPFConfig,
    batch: PartBatch,
    rng: jax.Array,
    remat: bool = True,
    x_1: jax.Array | None = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """One training forward: sample t, build flow target, predict v, loss.

    ``x_1`` overrides the fresh Gaussian noise endpoint — the reflow /
    distillation hook (Liu et al., rectified flow): training on stored
    (x_0=teacher endpoint, x_1=the exact noise the teacher integrated from)
    couples straightens the learned ODE so 1-4 Euler steps match the 10-step
    teacher. No reference counterpart (the reference always trains the
    1-rectified flow, modeling.py:186-201); this is the TPU-side route past
    the per-pair-FLOP ceiling documented in BASELINE.md.
    """
    k_t, k_noise, k_drop = jax.random.split(rng, 3)
    t_sample = flow.sample_timesteps(k_t, batch.S, cfg.timestep_sampling)  # (S,)
    # invalid sample slots keep a valid t (masked out of the loss anyway)
    x_0 = batch.points_gt
    if x_1 is None:
        x_1 = jax.random.normal(k_noise, x_0.shape, x_0.dtype)
    t_point = batch.per_sample_to_point(t_sample)[..., None]  # (G, N, 1)
    x_t, v_t = flow.flow_interpolate(x_0, x_1, t_point)

    v_pred = dit_forward(
        params,
        cfg.model,
        x_t,
        t_sample,
        batch,
        parts_per_sample=parts_per_sample(batch),
        remat=remat,
        dropout_key=k_drop if cfg.model.dropout_rate > 0.0 else None,
    )
    loss = flow.velocity_loss(v_pred, v_t, batch.point_mask, cfg.loss_type)
    n_pred, n_t = flow.velocity_norms(v_pred, v_t, batch.point_mask)
    metrics = {"loss": loss, "norm_v_pred": n_pred, "norm_v_t": n_t}
    if cfg.pose_loss_weight > 0.0:
        # pose of the implied endpoint: fit condition -> x0_hat per part and
        # compare against the GT pose labels (1-cos geodesic + squared
        # translation error, masked over valid parts)
        x0_hat = x_t - t_point * v_pred.astype(x_t.dtype)
        R_hat, t_hat = procrustes.fit_transformations(
            batch.points, x0_hat, batch.point_mask
        )
        tr = jnp.einsum("gij,gij->g", R_hat, batch.rotations_gt)
        rot_l = 1.0 - jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
        trans_l = jnp.sum((t_hat - batch.translations_gt) ** 2, axis=-1)
        pw = (
            batch.part_valid & batch.per_sample_to_part(batch.sample_valid)
        ).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(pw), 1.0)
        pose_loss = jnp.sum((rot_l + trans_l) * pw) / denom
        loss = loss + cfg.pose_loss_weight * pose_loss
        metrics["pose_loss"] = pose_loss
    # t-binned loss: the shortcut-learning signature lives at t->1 (the pose
    # must come from the condition there; docs/synthetic_training.md) — log
    # it so training health is observable without a separate probe
    P = parts_per_sample(batch)
    se = jnp.sum((v_pred - v_t) ** 2 * batch.point_mask[..., None], axis=(1, 2))
    cnt = 3.0 * jnp.sum(batch.point_mask, axis=1)                 # (G,)
    se_s = se.reshape(batch.S, P).sum(1)                          # (S,)
    cnt_s = jnp.maximum(cnt.reshape(batch.S, P).sum(1), 1.0)
    loss_s = se_s / cnt_s
    valid = batch.sample_valid.astype(jnp.float32)
    for lo, hi, name in ((0.0, 0.5, "loss_t<0.5"), (0.5, 0.9, "loss_t0.5-0.9"),
                         (0.9, 1.01, "loss_t>0.9")):
        w = ((t_sample >= lo) & (t_sample < hi)).astype(jnp.float32) * valid
        metrics[name] = jnp.sum(loss_s * w) / jnp.maximum(jnp.sum(w), 1.0)
    return loss, metrics


def sample(
    params,
    cfg: RPFConfig,
    batch: PartBatch,
    rng: jax.Array,
    x_1: jax.Array | None = None,
    return_trajectory: bool = True,
    return_transformer_features: bool = False,
    num_steps: int | None = None,
    schedule: str | None = None,
    ring_mesh=None,
) -> dict[str, Any]:
    """Generate a registered scene by integrating the learned flow.

    Returns dict with 'points' (G,N,3), optional 'end_point_trajectory' /
    'trajectory' (steps,G,N,3), optional 'transformer_features' (G,N,D).
    """
    if x_1 is None:
        x_1 = jax.random.normal(rng, batch.points.shape, jnp.float32)
    steps = num_steps or cfg.inference_sampling_steps
    # config knob gates trajectory capture; the call-site arg can only
    # further disable it (memory: two (steps, G, N, 3) stacks)
    return_trajectory = return_trajectory and cfg.return_end_point_trajectory
    # ring_mesh: sequence-sharded global attention for S==1 ultra-long
    # samples (multi-chip map merging; models/dit.py _attention_block)
    vfn = velocity_fn(params, cfg, batch, ring_mesh=ring_mesh)
    coarse = min(cfg.prune_coarse_steps, steps - 1)
    if coarse > 0 and cfg.rigidity_forcing and not return_trajectory:
        # ---- pruned coarse-then-fine sampling (see RPFConfig docstring) ----
        from .core.sampler import make_schedule

        ts = make_schedule(steps, schedule or cfg.inference_schedule)
        N = batch.points.shape[1]
        n_sub = max(-(-N // cfg.prune_factor) // 128 * 128, 128)
        n_sub = min(n_sub, N)
        # random subsample (sorted for contiguous-ish gathers); one shared
        # index set across parts keeps the gather a single static take
        idx = jnp.sort(
            jax.random.permutation(jax.random.fold_in(rng, 0x5B5), N)[:n_sub]
        )
        sub = batch.replace(
            points=batch.points[:, idx],
            points_gt=batch.points_gt[:, idx],
            local_feats=batch.local_feats[:, idx],
            point_mask=batch.point_mask[:, idx],
        )
        vfn_sub = velocity_fn(params, cfg, sub, ring_mesh=ring_mesh)
        x_1_sub = x_1[:, idx]
        res1 = flow_sampler(
            vfn_sub,
            x_1=x_1_sub,
            condition=sub.points,
            point_mask=sub.point_mask,
            rigidity_forcing=True,
            return_trajectory=False,
            method=cfg.inference_sampler,
            ts=ts[: coarse + 1],
        )
        # reconstruct the full-res state at t_s exactly: invert the forcing
        # blend to the rigid endpoint, Kabsch the per-part pose (exact — the
        # cloud is rigid by construction), re-apply at full resolution
        t_s = ts[coarse]
        x0_rigid_sub = (res1.x_final - t_s * x_1_sub) / (1.0 - t_s)
        R, tr = procrustes.fit_transformations(
            sub.points, x0_rigid_sub, sub.point_mask
        )
        x0_full = procrustes.transform_points(R, tr, batch.points)
        x_switch = (1.0 - t_s) * x0_full + t_s * x_1
        res = flow_sampler(
            vfn,
            x_1=x_1,
            x_start=x_switch,
            condition=batch.points,
            point_mask=batch.point_mask,
            rigidity_forcing=True,
            return_trajectory=False,
            method=cfg.inference_sampler,
            ts=ts[coarse:],
        )
    else:
        res = flow_sampler(
            vfn,
            x_1=x_1,
            condition=batch.points,
            point_mask=batch.point_mask,
            num_steps=steps,
            rigidity_forcing=cfg.rigidity_forcing,
            return_trajectory=return_trajectory,
            method=cfg.inference_sampler,
            schedule=schedule or cfg.inference_schedule,
        )
    out: dict[str, Any] = {"points": res.x_final}
    if return_trajectory:
        out["end_point_trajectory"] = res.end_point_trajectory
        out["trajectory"] = res.trajectory
    if return_transformer_features:
        # one extra forward at the final state, t ~ 0 (ref modeling.py:676-698)
        # — with the same sharding as the ODE loop (an unsharded forward here
        # would OOM on exactly the ultra-long scenes ring_mesh exists for)
        P = parts_per_sample(batch)
        ts = jnp.full((batch.S,), 1.0 / steps, jnp.float32)
        _, feats = dit_forward(
            params,
            cfg.model,
            res.x_final,
            ts,
            batch,
            parts_per_sample=P,
            return_features=True,
            ring_mesh=ring_mesh,
        )
        out["transformer_features"] = feats
    return out


def predict_poses(batch: PartBatch, predicted_points: jax.Array):
    """Per-part rigid poses condition -> prediction (ref modeling.py:389-393)."""
    return procrustes.fit_transformations(
        batch.points, predicted_points, batch.point_mask
    )


def refine_poses_icp(
    batch: PartBatch,
    rotations: jax.Array,     # (G, 3, 3)
    translations: jax.Array,  # (G, 3)
    iters: int = 30,
    trim_fraction: float = 0.7,
    yaw_restarts: int = 1,
):
    """Trimmed-ICP pose refinement: snap each non-anchor part onto the anchor.

    TPU-native post-registration step with no reference counterpart (the
    reference always reports the raw flow+Kabsch pose; its ICP machinery is
    only used to *measure* errors, ref eval/metrics.py:177-261). The flow
    gives a coarse global registration; when that coarse pose is within the
    ICP convergence basin, point-to-point refinement between the actual
    condition clouds recovers the fine alignment the generative endpoint
    blurs away. Fully batched over (S·P) parts — one vmapped trimmed ICP, no
    host loop.

    For each valid non-anchor part p of sample s: align the pose-transformed
    part onto the pose-transformed anchor part of s, keeping only the closest
    ``trim_fraction`` of correspondences per iteration (partial overlap).
    The refined pose composes the ICP delta with the input pose; anchor parts
    and invalid parts are returned unchanged.

    ``yaw_restarts`` > 1 additionally tries K yaw-rotated initializations of
    each part (evenly spaced over 2π about the part's centroid) and keeps the
    pose with the lowest trimmed NN residual — a near-global yaw search for
    gravity-aligned scans (scan yaw is the dominant unknown in terrestrial
    LiDAR; roll/pitch are IMU-pinned). Cost is K sequential ICPs via
    ``lax.map``; the flow's pose supplies the translation + roll/pitch, so
    small K (4-8) covers the circle.
    """
    from .eval.metrics import icp_point_to_point

    S = batch.S
    P = parts_per_sample(batch)
    N = batch.N
    Rv = rotations.reshape(S, P, 3, 3)
    tv = translations.reshape(S, P, 3)
    pts = batch.points.reshape(S, P, N, 3)
    mask = batch.point_mask.reshape(S, P, N)
    anchor = batch.anchor_part.reshape(S, P)

    a_idx = jnp.argmax(anchor, axis=1)                                  # (S,)
    take = lambda arr: jnp.take_along_axis(  # noqa: E731
        arr, a_idx.reshape((S, 1) + (1,) * (arr.ndim - 2)), axis=1
    ).squeeze(1)
    aR, at = take(Rv), take(tv)                                         # (S,3,3),(S,3)
    a_pts = jnp.einsum("sij,snj->sni", aR, take(pts)) + at[:, None]     # (S,N,3)
    a_mask = take(mask)                                                 # (S,N)

    cur = jnp.einsum("spij,spnj->spni", Rv, pts) + tv[:, :, None]       # (S,P,N,3)
    src = cur.reshape(S * P, N, 3)
    src_m = mask.reshape(S * P, N)
    tgt = jnp.broadcast_to(a_pts[:, None], (S, P, N, 3)).reshape(S * P, N, 3)
    tgt_m = jnp.broadcast_to(a_mask[:, None], (S, P, N)).reshape(S * P, N)

    if yaw_restarts <= 1:
        dR, dt = icp_point_to_point(
            src, src_m, tgt, tgt_m, iters=iters, trim_fraction=trim_fraction
        )                                                               # (G,3,3),(G,3)
    else:
        # K yaw-perturbed inits about each part's (posed) centroid; keep the
        # lowest-residual result per part
        cnt = jnp.maximum(src_m.sum(-1, keepdims=True), 1)              # (G,1)
        c = jnp.sum(jnp.where(src_m[..., None], src, 0.0), axis=1) / cnt

        def one(delta):
            ca, sa = jnp.cos(delta), jnp.sin(delta)
            Rz = jnp.array([[ca, -sa, 0.0], [sa, ca, 0.0], [0.0, 0.0, 1.0]])
            G2 = src.shape[0]
            R0 = jnp.broadcast_to(Rz, (G2, 3, 3))
            t0 = c - jnp.einsum("ij,gj->gi", Rz, c)
            return icp_point_to_point(
                src, src_m, tgt, tgt_m, iters=iters,
                trim_fraction=trim_fraction, init=(R0, t0),
                return_residual=True,
            )

        angles = jnp.arange(yaw_restarts) * (2.0 * jnp.pi / yaw_restarts)
        Rk, tk, resk = jax.lax.map(one, angles)         # (K,G,3,3),(K,G,3),(K,G)
        best = jnp.argmin(resk, axis=0)                                 # (G,)
        dR = jnp.take_along_axis(Rk, best[None, :, None, None], axis=0)[0]
        dt = jnp.take_along_axis(tk, best[None, :, None], axis=0)[0]

    R_new = jnp.einsum("gij,gjk->gik", dR, rotations)
    t_new = jnp.einsum("gij,gj->gi", dR, translations) + dt

    keep = batch.anchor_part | ~batch.part_valid                        # (G,)
    R_out = jnp.where(keep[:, None, None], rotations, R_new)
    t_out = jnp.where(keep[:, None], translations, t_new)
    return R_out, t_out
