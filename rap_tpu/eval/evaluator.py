"""Evaluator: metric dict per batch, multi-generation aggregation, artifacts.

Parity with /root/reference/rectified_point_flow/eval/evaluator.py and the
multi-generation selection logic of modeling.py:333-630:

  - per-batch metric dict with the reference's metric names/units
    (evaluator.py:30-250), computed fully batched (eval/metrics.py).
  - best-of-N: max over generations for acc/recall/success/ecdf keys, min
    otherwise (modeling.py:434-451).
  - rigidity-selected: pick the generation with the smallest rigidity RMSE,
    optionally averaged over ALL trajectory steps — the reference refits
    poses serially per step (its hottest loop); here it is one vmapped
    Kabsch over (steps, G, ...) (modeling.py:458-530).
  - overlap-selected: pick the generation with the largest overlap ratio
    (modeling.py:590-618).
  - artifacts: per-sample JSON, per-part 4x4 transform .txt files (the
    contract demo.py consumes, evaluator.py:383-496), merged/part PLYs.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.batch import PartBatch
from ..core.procrustes import fit_transformations
from . import metrics as M

# keys where bigger is better (best-of-N takes max) — ref modeling.py:438
_MAX_KEYS = ("acc", "recall", "success", "ecdf", "overlap_ratio", "correspondence_ratio")


def _is_max_key(key: str) -> bool:
    return any(k in key for k in _MAX_KEYS)


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    rmse_eval_on: bool = False            # pairwise correspondence RMSE metrics
    overlap_eval_on: bool = False         # overlap-ratio metrics
    ecdf_eval_on: bool = False            # ECDF of R/t errors (ref metrics.py:694)
    part_acc_eval_on: bool = False        # Hungarian part accuracy (ref :92-163)
    part_acc_threshold: float = 0.01      # chamfer threshold (scaled space)
    use_icp: bool = False                 # ICP-refined transform errors (ref :177)
    use_average_rigidity_rmse: bool = True
    save_results: bool = False
    save_json: bool = True
    save_pointcloud_parts: bool = False
    save_merged_pointcloud_steps: bool = False
    # point-cloud artifacts only for the first K valid samples per batch
    # (ref evaluator.py:352 max_samples_per_batch; 0 = no limit). JSON and
    # transform files are always written for every sample, like the reference.
    max_artifact_samples_per_batch: int = 0
    output_dir: str = "results"
    folder_suffix: str | None = None


class Evaluator:
    def __init__(self, cfg: EvalConfig = EvalConfig()):
        self.cfg = cfg

    # ---- single-generation metrics (jit-friendly) -------------------------
    def compute_metrics(
        self,
        batch: PartBatch,
        pred: jax.Array,
        rotations_pred: jax.Array | None = None,
        translations_pred: jax.Array | None = None,
    ) -> dict[str, jax.Array]:
        cd = M.chamfer_rmse(batch, pred)
        cd_m = cd * batch.scale
        out: dict[str, jax.Array] = {
            "chamfer_l2 (m)": cd_m,
            "object_chamfer": cd,
        }
        if rotations_pred is not None:
            if self.cfg.use_icp:
                # ICP-refined per-part errors (ref metrics.py:177-261)
                rot_err, trans_err = M.transform_errors_icp(
                    batch, rotations_pred, translations_pred
                )
            else:
                rot_err, trans_err = M.transform_errors(
                    batch, rotations_pred, translations_pred, anchor_relative=True
                )
            rig = M.rigidity_rmse(batch, pred, rotations_pred, translations_pred)
            out.update(
                {
                    "average_rotation_error (deg)": rot_err,
                    "average_translation_error (m)": trans_err,
                    "recall_at_10deg_0.2m (nss)": M.combined_recall(
                        rot_err, trans_err, 10, 0.2
                    ),
                    "recall_at_15deg_0.3m (indoor_bufferx)": M.combined_recall(
                        rot_err, trans_err, 15, 0.3
                    ),
                    "recall_at_5deg_2m (outdoor_bufferx)": M.combined_recall(
                        rot_err, trans_err, 5, 2.0
                    ),
                    "recall_at_10deg_5m (map)": M.combined_recall(
                        rot_err, trans_err, 10, 5.0
                    ),
                    "recall_at_chamfer_0.2m": M.recall_at(cd_m, 0.2),
                    "rigidity_rmse (m)": rig,
                }
            )
            if self.cfg.rmse_eval_on and batch.G // batch.S >= 2:
                rmse, ratio, terr = M.correspondence_rmse_pairs(
                    batch, rotations_pred, translations_pred
                )
                # non-pair samples carry inf rmse; their recalls become NaN
                # so the meter excludes them instead of counting misses
                pair = jnp.isfinite(rmse)
                nanify = lambda v: jnp.where(pair, v, jnp.nan)  # noqa: E731
                out.update(
                    {
                        "correspondence_rmse (m)": rmse,
                        "correspondence_ratio": nanify(ratio),
                        "recall_at_rmse_0.2m": nanify(M.recall_at(rmse, 0.2)),
                        "transform_error_rmse (m)": terr,
                        "recall_at_transform_error_rmse_0.2m": nanify(
                            M.recall_at(terr, 0.2)
                        ),
                    }
                )
        if self.cfg.overlap_eval_on:
            ors = M.overlap_ratio(batch, pred)
            out["overlap_ratio_at_0.5%"] = ors[0]
            out["overlap_ratio_at_1%"] = ors[1]
            out["overlap_ratio_at_2%"] = ors[2]
        if self.cfg.part_acc_eval_on:
            acc, _ = M.part_accuracy(
                batch, pred, threshold=self.cfg.part_acc_threshold
            )
            out["part_accuracy"] = jnp.asarray(acc)
        if self.cfg.ecdf_eval_on and rotations_pred is not None:
            # batch-level ECDF broadcast per sample so the meter averages it
            # sample-weighted (the ref computes it the same way, metrics.py:694)
            valid = np.asarray(batch.sample_valid)
            re_np = np.asarray(out["average_rotation_error (deg)"])[valid]
            te_np = np.asarray(out["average_translation_error (m)"])[valid]
            S = batch.S
            for thr in (3, 5, 10, 30, 45):
                v = float(np.mean(re_np < thr)) if len(re_np) else 0.0
                out[f"ecdf_rotation_at_{thr}deg"] = jnp.full((S,), v)
            for thr in (0.05, 0.1, 0.25, 0.5, 0.75):
                v = float(np.mean(te_np < thr)) if len(te_np) else 0.0
                out[f"ecdf_translation_at_{thr}m"] = jnp.full((S,), v)
        return out

    # ---- multi-generation aggregation --------------------------------------
    def aggregate_generations(
        self,
        batch: PartBatch,
        gen_results: list[dict[str, jax.Array]],
        gen_trajectories: list[jax.Array] | None = None,
    ) -> dict[str, np.ndarray | dict]:
        """Average / best-of-N / rigidity-selected / overlap-selected metrics.

        gen_results: one metric dict per generation, each (S,) arrays.
        gen_trajectories: optional per-generation end-point trajectories
            (steps, G, N, 3) for trajectory-averaged rigidity selection.
        """
        n = len(gen_results)
        keys = list(gen_results[0].keys())
        stacked = {
            k: np.stack([np.asarray(r[k]) for r in gen_results]) for k in keys
        }  # (n, S)
        agg: dict[str, Any] = {"avg": {k: stacked[k].mean(0) for k in keys}}
        if n > 1:
            agg[f"best_of_{n}"] = {
                k: (stacked[k].max(0) if _is_max_key(k) else stacked[k].min(0))
                for k in keys
            }
            # rigidity selection
            if "rigidity_rmse (m)" in stacked:
                if self.cfg.use_average_rigidity_rmse and gen_trajectories:
                    rig = np.stack(
                        [
                            np.asarray(
                                trajectory_rigidity_rmse(batch, traj)
                            ).mean(0)
                            for traj in gen_trajectories
                        ]
                    )  # (n, S)
                else:
                    rig = stacked["rigidity_rmse (m)"]
                best = np.argmin(rig, axis=0)  # (S,)
                sel = {
                    k: stacked[k][best, np.arange(stacked[k].shape[1])]
                    for k in keys
                }
                agg["rigidity_selected"] = sel
                agg["rigidity_selected_gen"] = best
            if "overlap_ratio_at_1%" in stacked:
                best = np.argmax(stacked["overlap_ratio_at_1%"], axis=0)
                agg["overlap_ratio_selected"] = {
                    k: stacked[k][best, np.arange(stacked[k].shape[1])]
                    for k in keys
                }
                agg["overlap_ratio_selected_gen"] = best
        return agg

    # ---- artifact persistence ----------------------------------------------
    def save_sample_results(
        self,
        batch: PartBatch,
        pred: np.ndarray,
        rotations_pred: np.ndarray,
        translations_pred: np.ndarray,
        metrics_dict: dict[str, np.ndarray],
        sample_names: list[str],
        dataset_name: str = "dataset",
        generation_idx: int | str = 0,
        trajectory: np.ndarray | None = None,
        midpoint_trajectory: np.ndarray | None = None,
    ) -> None:
        """Write per-sample JSON + transform .txt files (+ optional PLY/PCDs).

        Two transform flavors per part, both 4x4 row-major in METRIC scale
        (ref evaluator.py:383-496 -> consumed by demo.py:1294-1338):

          - ``part{p:02d}_transform.txt`` — RELATIVE-TO-GT: maps the GT-posed
            part into the predicted pose, R_rel = R_pred @ R_gt^T,
            t_rel = t_pred_m - t_gt_m @ R_rel^T; composed with the inverse
            preprocessing global transform when available (ref :466-489).
          - ``part{p:02d}_pose.txt`` — the raw predicted pose (condition part
            -> registered scene), which is what our demo CLI applies.
          - ``global_transform.txt`` — the preprocessing global 4x4.

        ``trajectory`` (end-point x_0_hat) and ``midpoint_trajectory`` (x_t)
        additionally save per-ODE-step merged clouds as part-colored
        ``generation/{endpoint,midpoint}/step_k.pcd`` plus the merged input
        cloud (ref evaluator.py:352-369, :744-825).
        """
        from ..utils import ply as plyio
        from ..utils.render import part_ids_to_colors

        root = Path(self.cfg.output_dir)
        if self.cfg.folder_suffix:
            root = root.with_name(root.name + f"_{self.cfg.folder_suffix}")
        S = batch.S
        P = batch.G // S
        N = batch.N
        mask = np.asarray(batch.point_mask).reshape(S, P, N)
        pv = np.asarray(batch.part_valid).reshape(S, P)
        scale = np.asarray(batch.scale)
        pred_sp = pred.reshape(S, P, N, 3)
        R_sp = rotations_pred.reshape(S, P, 3, 3)
        t_sp = translations_pred.reshape(S, P, 3)
        Rg_sp = np.asarray(batch.rotations_gt).reshape(S, P, 3, 3)
        tg_sp = np.asarray(batch.translations_gt).reshape(S, P, 3)
        sv = np.asarray(batch.sample_valid)
        g_rot = (
            np.asarray(batch.global_rotation)
            if batch.global_rotation is not None else None
        )
        g_trans = (
            np.asarray(batch.global_translation)
            if batch.global_translation is not None else None
        )

        def _merged(parts_pts, parts_mask, sc):
            pcs = [pp[mm] for pp, mm in zip(parts_pts, parts_mask)]
            ids = np.concatenate(
                [np.full(len(pc), i) for i, pc in enumerate(pcs)]
            ) if pcs else np.zeros(0, int)
            return np.concatenate(pcs, axis=0) * sc, ids

        for s in range(S):
            if not sv[s]:
                continue
            name = sample_names[s] if s < len(sample_names) else f"sample_{s}"
            d = root / dataset_name / name / f"generation_{generation_idx}"
            d.mkdir(parents=True, exist_ok=True)
            if self.cfg.save_json:
                payload = {
                    k: float(np.asarray(v[s]))
                    for k, v in metrics_dict.items()
                }
                payload["scale"] = float(scale[s])
                (d / "metrics.json").write_text(json.dumps(payload, indent=2))

            # global preprocessing transform + its inverse (for composition)
            T_glob_inv = None
            if g_rot is not None and g_trans is not None:
                T_glob = np.eye(4)
                T_glob[:3, :3] = g_rot[s]
                T_glob[:3, 3] = g_trans[s]
                np.savetxt(d / "global_transform.txt", T_glob, fmt="%.8f")
                T_glob_inv = np.linalg.inv(T_glob)

            for p in range(P):
                if not pv[s, p]:
                    continue
                # raw predicted pose (metric)
                T = np.eye(4)
                T[:3, :3] = R_sp[s, p]
                T[:3, 3] = t_sp[s, p] * scale[s]
                np.savetxt(d / f"part{p:02d}_pose.txt", T, fmt="%.8f")
                # relative-to-GT flavor (ref :446-489)
                R_rel = R_sp[s, p] @ Rg_sp[s, p].T
                t_rel = t_sp[s, p] * scale[s] - (tg_sp[s, p] * scale[s]) @ R_rel.T
                T_rel = np.eye(4)
                T_rel[:3, :3] = R_rel
                T_rel[:3, 3] = t_rel
                if T_glob_inv is not None:
                    T_rel = T_rel @ T_glob_inv
                np.savetxt(d / f"part{p:02d}_transform.txt", T_rel, fmt="%.8f")

            # point-cloud artifacts: optionally only the first K samples
            # (JSON + transforms above are always written, ref :348-369)
            if (
                self.cfg.max_artifact_samples_per_batch
                and s >= self.cfg.max_artifact_samples_per_batch
            ):
                continue
            # merged prediction cloud (metric scale)
            merged, _ = _merged(pred_sp[s][pv[s]], mask[s][pv[s]], scale[s])
            plyio.write_ply(d / "merged_pred.ply", merged)
            if self.cfg.save_pointcloud_parts:
                for p in range(P):
                    if pv[s, p]:
                        # zero-padded like the transform files so plain
                        # lexicographic listings stay in part order
                        plyio.write_ply(
                            d / f"part{p:02d}_pred.ply",
                            pred_sp[s, p][mask[s, p]] * scale[s],
                        )
            if self.cfg.save_merged_pointcloud_steps:
                gdir = d / "generation"
                gdir.mkdir(parents=True, exist_ok=True)
                # merged INPUT cloud with part colors (ref :360-361)
                cond_sp = np.asarray(batch.points).reshape(S, P, N, 3)
                inp, ids = _merged(cond_sp[s][pv[s]], mask[s][pv[s]], 1.0)
                plyio.write_pcd(
                    gdir / "merged_input.pcd", inp, part_ids_to_colors(ids)
                )
                for traj, sub in (
                    (trajectory, "endpoint"),
                    (midpoint_trajectory, "midpoint"),
                ):
                    if traj is None:
                        continue
                    steps = traj.shape[0]
                    tdir = gdir / sub
                    tdir.mkdir(parents=True, exist_ok=True)
                    traj_sp = traj.reshape(steps, S, P, N, 3)
                    for st in range(steps):
                        # canonical (scaled) frame, part-colored, like the ref
                        pts_t, ids_t = _merged(
                            traj_sp[st, s][pv[s]], mask[s][pv[s]], 1.0
                        )
                        plyio.write_pcd(
                            tdir / f"step_{st}.pcd",
                            pts_t,
                            part_ids_to_colors(ids_t),
                        )


def trajectory_rigidity_rmse(batch: PartBatch, trajectory: jax.Array) -> jax.Array:
    """Rigidity RMSE for every trajectory step at once: (steps, S).

    The reference refits poses step-by-step in Python (modeling.py:462-500,
    'very hot'); here one vmapped Kabsch handles all steps simultaneously.
    """

    def per_step(step_pts):
        R, t = fit_transformations(batch.points, step_pts, batch.point_mask)
        return M.rigidity_rmse(batch, step_pts, R, t)

    return jax.lax.map(per_step, trajectory)
