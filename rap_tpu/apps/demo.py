"""End-to-end registration demo — the rap_tpu equivalent of reference demo.py.

Usage:
    python -m rap_tpu.apps.demo -i <folder with part PLYs> [-out <dir>]
        [--checkpoint ckpt] [--num-steps 10] [--n-generations 1] ...

Pipeline (parity with /root/reference/demo.py):
  1. load all PLYs in the input folder (optional camera-frame rotation),
  2. adaptive parameters from the median bbox (voxel size by scene scale in
     [200..1200] divisors clamped to [1e-4, 0.4] m; des_r = 20x voxel;
     voxel_ratio retargeted so the median part lands in
     [500, max_points_per_part] points — demo.py:814-928),
  3. per part: voxel downsample -> statistical outlier removal -> FPS to the
     voxel-adaptive allocation -> local features (MiniSpinNet when available,
     zero features otherwise — the reference's rap_12_po path,
     demo.py:962-964),
  4. eval-mode normalization (the dataset label contract) and one jitted
     generation + batched Kabsch pose recovery,
  5. poses re-based to the FIRST part's frame (T <- T_0^-1 T_p,
     demo.py:1294-1338) and applied to the ORIGINAL full-resolution clouds;
     outputs `registered/*.ply` + `part{i}_transform.txt` (4x4, metric).
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_config
from ..data.dataset import augment_sample
from ..ops import points as P
from ..registration import predict_poses, refine_poses_icp, sample
from ..utils import ply as plyio

logger = logging.getLogger("rap_tpu.demo")

# optional camera-frame rotation for 7-scenes/bundlefusion/rgbd-scenes-style
# inputs (ref demo.py:60-63 COORDINATE_TRANSFORM) — one definition, shared
# with the dataset processors' global-frame fix
from ..dataset_process.geometry import CAMERA_FRAME_ROTATION  # noqa: E402


def adaptive_parameters(
    clouds: list[np.ndarray],
    voxel_ratio: float = 0.05,
    max_points_per_part: int = 20_000,
):
    """Scene-scale-adaptive voxel size / descriptor radius / sampling ratio."""
    bboxes = np.array([c.max(0) - c.min(0) for c in clouds if len(c)])
    median_size = float(np.median(np.median(bboxes, axis=0)))
    for limit, div in [(5, 200), (30, 400), (100, 600), (250, 800), (500, 1000)]:
        if median_size < limit:
            divide = div
            break
    else:
        divide = 1200
    voxel_size = float(np.clip(median_size / divide, 1e-4, 0.4))
    des_r = 20.0 * voxel_size

    coverages = [
        P.voxel_coverage(c, 4.0 * voxel_size) for c in clouds if len(c)
    ]
    med_cov = float(np.median(coverages))
    med_count = med_cov * voxel_ratio
    if med_count > max_points_per_part:
        voxel_ratio = max_points_per_part / med_cov
        med_count = med_cov * voxel_ratio
    if med_count < 500:
        voxel_ratio = 500 / med_cov
    return voxel_size, des_r, voxel_ratio


def preprocess_parts(
    clouds: list[np.ndarray],
    voxel_size: float,
    voxel_ratio: float,
    des_r: float,
    max_points_per_part: int,
    min_points_per_part: int = 200,
    outlier_removal: bool = True,
    feature_extractor=None,
    rng: np.random.Generator | None = None,
):
    """Downsample + FPS each part; returns (keypoints, features) per part."""
    rng = rng or np.random.default_rng(0)
    down = [P.voxel_downsample(c.astype(np.float32), voxel_size) for c in clouds]
    if outlier_removal:
        down = [
            c[P.statistical_outlier_removal(c)] if len(c) > 50 else c
            for c in down
        ]
    counts = P.adaptive_sample_counts(
        down, 4.0 * voxel_size, voxel_ratio, min_points_per_part, max_points_per_part
    )
    kpts, feats = [], []
    for cloud, k in zip(down, counts):
        k = max(min(k, len(cloud)), 1)
        idx = P.fps_numpy(cloud, k, rng) if len(cloud) > k else np.arange(len(cloud))
        kp = cloud[idx]
        kpts.append(kp)
        if feature_extractor is not None:
            feats.append(np.asarray(feature_extractor(cloud, kp, des_r)))
        else:
            feats.append(np.zeros((len(kp), 32), np.float32))
    return kpts, feats


def _pose_to_metric(
    R: np.ndarray, t: np.ndarray, scale: float,
    primary_center: np.ndarray, gt_trans: np.ndarray, cond_offset: np.ndarray,
) -> np.ndarray:
    """4x4 metric transform mapping an ORIGINAL part cloud into the
    registered scene, from the scaled-space pose (R, t).

    Derivation: eval-mode normalization maps orig -> cond_p =
    (orig - pc)/s - o_p (o_p = gt_trans + part_center; 0 for the anchor);
    the model registers cond_p -> R cond_p + t in the scaled scene frame,
    and metric(x) = s (x + gt_trans) + pc. Composing:
      registered = R orig + [s (t + g) + pc - R (pc + s o_p)].
    """
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = (
        scale * (t + gt_trans)
        + primary_center
        - R @ (primary_center + scale * cond_offset)
    )
    return T


def run_demo(args) -> int:
    in_dir = Path(args.input)
    ply_files = sorted(in_dir.glob("*.ply"))
    if len(ply_files) < 2:
        logger.error("need at least 2 PLY parts in %s", in_dir)
        return 1
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.n_generations < 1:
        logger.error("--n-generations must be >= 1 (got %d)", args.n_generations)
        return 1
    originals = []
    for f in ply_files:
        pts = plyio.read_ply(f)["points"]
        if len(pts) == 0:
            # an empty part would flow through as NaN centers and poison
            # every pose (all-NaN outputs if it lands at index 0)
            logger.error("%s has zero points — remove or fix the input", f.name)
            return 1
        if args.camera_frame:
            pts = pts @ CAMERA_FRAME_ROTATION.T
        originals.append(pts)
        logger.info("loaded %s: %d points", f.name, len(pts))

    # --- adaptive preprocessing ------------------------------------------
    if args.adaptive_parameters:
        voxel_size, des_r, voxel_ratio = adaptive_parameters(
            originals, args.voxel_ratio, args.max_points_per_part
        )
    else:
        voxel_size, des_r, voxel_ratio = args.voxel_size, args.des_r, args.voxel_ratio
    logger.info(
        "voxel_size=%.4f des_r=%.3f voxel_ratio=%.5f", voxel_size, des_r, voxel_ratio
    )
    feature_extractor = None
    if args.features == "spinnet":
        from ..spinnet import build_feature_extractor

        feature_extractor = build_feature_extractor(args.spinnet_checkpoint)
    elif args.features == "geometric":
        # rotation-invariant eigenvalue/curvature descriptors — what the
        # synthetic-trained distribution checkpoint was conditioned on
        # (data/synthetic_scenes.compute_geometric_features)
        from ..data.synthetic_scenes import compute_geometric_features

        def feature_extractor(cloud, kp, r):
            return compute_geometric_features(kp)
    t0 = time.time()
    kpts, feats = preprocess_parts(
        originals, voxel_size, voxel_ratio, des_r,
        args.max_points_per_part,
        outlier_removal=not args.no_outlier_removal,
        feature_extractor=feature_extractor,
        rng=np.random.default_rng(args.seed),
    )
    logger.info(
        "preprocessing: %.1fs; keypoints per part: %s",
        time.time() - t0, [len(k) for k in kpts],
    )

    # --- normalization (eval-mode label contract) -------------------------
    smp = augment_sample(
        name=in_dir.name, dataset_name="demo", index=0,
        parts_gt=[k.astype(np.float64) for k in kpts],
        features=feats,
        rng=np.random.default_rng(args.seed),
        train=False,
    )
    # eval-mode bookkeeping needed to map poses back to metric coords —
    # read off the Sample the augmentation just built instead of re-deriving
    # the label contract (dataset.py carries exactly these quantities:
    # anchor translation = -gt_trans, per-part translation = cond_offset -
    # gt_trans... see data/dataset.py augment_sample)
    primary = smp.anchor_idx
    primary_center = kpts[primary].mean(0)
    gt_trans = -np.asarray(smp.translations[primary], np.float64)
    cond_offsets = [
        np.asarray(smp.translations[i], np.float64) + gt_trans
        for i in range(len(kpts))
    ]

    # --- model ------------------------------------------------------------
    cfg = load_config(args.config, [
        f"model_name={args.model}",
        f"pipeline.inference_sampling_steps={args.num_steps}",
        f"pipeline.n_generations={args.n_generations}",
        f"pipeline.rigidity_forcing={str(args.rigidity_forcing).lower()}",
    ] + (args.override or []))
    if args.checkpoint:
        cfg = dataclasses.replace(cfg, checkpoint=args.checkpoint)
    from .sample import load_params

    params = load_params(cfg)

    from ..data.packer import collate_to_part_batch, N_BUCKETS, P_BUCKETS, _bucket

    N = _bucket(smp.max_part_points, N_BUCKETS)
    Pp = _bucket(smp.num_parts, P_BUCKETS)
    batch, _ = collate_to_part_batch([smp], N=N, P=Pp, S=1)

    ring_mesh = None
    if args.sequence_sharded:
        # multi-chip map merging: shard the parts + the global-attention
        # sequence across all devices (S==1 here by construction)
        from ..parallel.mesh import make_mesh, shard_batch

        ring_mesh = make_mesh(len(jax.devices()))
        batch = shard_batch(batch, ring_mesh)
        logger.info(
            "sequence-sharded over %d devices (ring attention)",
            len(jax.devices()),
        )

    from ..eval import metrics as M

    @jax.jit
    def generate_best(params, batch, keys):
        """All generations + rigidity-RMSE selection on-device (ref
        rigidity-selected): one lax.scan keeps memory at a single
        generation and avoids a host round-trip per generation."""

        def gen_one(key):
            out = sample(
                params, cfg.pipeline, batch, key, return_trajectory=False,
                ring_mesh=ring_mesh,
            )
            R, t = predict_poses(batch, out["points"])
            rig = M.rigidity_rmse(batch, out["points"], R, t)[0]
            return out["points"], R, t, rig

        pts0, R0, t0, rig0 = gen_one(keys[0])

        def body(best, key):
            pts, R, t, rig = gen_one(key)
            better = rig < best[3]
            pick = lambda a, b: jnp.where(better, a, b)  # noqa: E731
            return (
                pick(pts, best[0]), pick(R, best[1]), pick(t, best[2]),
                pick(rig, best[3]),
            ), rig
        best, rigs = jax.lax.scan(body, (pts0, R0, t0, rig0), keys[1:])
        if args.icp_refine:
            # snap the selected coarse poses onto the anchor with batched
            # trimmed ICP (registration.refine_poses_icp; beyond-reference)
            R_r, t_r = refine_poses_icp(
                batch, best[1], best[2], yaw_restarts=args.icp_restarts
            )
            best = (best[0], R_r, t_r, best[3])
        return best, jnp.concatenate([rig0[None], rigs])

    logger.info("registering (%d steps, %d generation(s))...", args.num_steps, args.n_generations)
    t0 = time.time()
    keys = jnp.stack(
        [jax.random.key(args.seed + g) for g in range(args.n_generations)]
    )
    (pts, R_all, t_all, _), rigs = jax.block_until_ready(
        generate_best(params, batch, keys)
    )
    for g, rig in enumerate(np.asarray(rigs)):
        logger.info("generation %d: rigidity RMSE %.4f m", g, float(rig))
    logger.info("registration: %.1fs", time.time() - t0)
    pts, R_all, t_all = np.asarray(pts), np.asarray(R_all), np.asarray(t_all)

    # --- apply poses to original clouds, re-based to part 0 ----------------
    n_parts = smp.num_parts
    Ts = [
        _pose_to_metric(
            R_all[p], t_all[p], smp.scale, primary_center, gt_trans, cond_offsets[p]
        )
        for p in range(n_parts)
    ]
    T0_inv = np.linalg.inv(Ts[0])
    reg_dir = out_dir / "registered"
    reg_dir.mkdir(exist_ok=True)
    regs = []
    for p, (f, orig) in enumerate(zip(ply_files, originals)):
        T = T0_inv @ Ts[p]
        reg = orig @ T[:3, :3].T + T[:3, 3]
        plyio.write_ply(reg_dir / f.name, reg)
        regs.append(reg)
        np.savetxt(out_dir / f"part{p}_transform.txt", T, fmt="%.8f")
        logger.info("part %d (%s): |t|=%.3f m", p, f.name, np.linalg.norm(T[:3, 3]))
    logger.info("registered clouds written to %s", reg_dir)

    if args.output_generated:
        # the raw generated keypoint parts instead of transformed originals
        # (ref demo.py:1180-1293 --output_generated), mapped to metric coords
        # then re-based to part 0's frame like the registered outputs
        gen_dir = out_dir / "generated"
        gen_dir.mkdir(exist_ok=True)
        mask = np.asarray(batch.point_mask)
        gen_sp = pts.reshape(batch.G, batch.N, 3)
        for p, f in enumerate(ply_files):
            g = gen_sp[p][mask[p]]
            metric = smp.scale * (g + gt_trans) + primary_center
            metric = metric @ T0_inv[:3, :3].T + T0_inv[:3, 3]
            plyio.write_ply(gen_dir / f.name, metric.astype(np.float32))
        logger.info("generated keypoint clouds written to %s", gen_dir)

    if args.render_results:
        # headless stand-in for the reference's Open3D toggle viewer
        # (ref demo.py:392-514): occlusion-correct part-colored renders of
        # the registered scene from two viewpoints
        from ..utils.render import part_ids_to_colors, render_point_cloud_raster, save_image

        merged = np.concatenate(regs)
        ids = np.concatenate([np.full(len(r), i) for i, r in enumerate(regs)])
        cols = part_ids_to_colors(ids)
        for elev, azim in ((25, 45), (25, 135)):
            img = render_point_cloud_raster(
                merged, cols, image_size=800, elev=elev, azim=azim
            )
            save_image(out_dir / f"registered_e{elev}_a{azim}.png", img)
        logger.info("registered-scene renders written to %s", out_dir)
    return 0


def main(argv=None):
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    ap = argparse.ArgumentParser(description=__doc__)
    bundled_pair = Path(__file__).resolve().parents[2] / "demo_data" / "pair"
    ap.add_argument(
        "-i", "--input", default=str(bundled_pair),
        help="folder of part PLYs (default: the bundled demo pair, "
             "resolved relative to the package so it works from any cwd)",
    )
    ap.add_argument("-out", "--output", default="demo_output")
    # like -i: resolved relative to the repo so the demo (and the webapp
    # calling it in-process) works from any cwd
    bundled_cfg = (
        Path(__file__).resolve().parents[2] / "configs" / "rap_inference.yaml"
    )
    ap.add_argument("--config", default=str(bundled_cfg))
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--model", default="rap_12")
    ap.add_argument("--num-steps", type=int, default=10)
    ap.add_argument("--n-generations", type=int, default=1)
    ap.add_argument("--rigidity-forcing", action="store_true", default=True)
    ap.add_argument("--no-rigidity-forcing", dest="rigidity_forcing", action="store_false")
    ap.add_argument("--icp-refine", action="store_true",
                    help="post-refine the selected poses with batched "
                         "trimmed ICP against the anchor part")
    ap.add_argument("--icp-restarts", type=int, default=1,
                    help="with --icp-refine: try K yaw-rotated ICP inits per "
                         "part and keep the lowest trimmed residual (near-"
                         "global yaw search for gravity-aligned scans)")
    ap.add_argument("--adaptive-parameters", action="store_true", default=True)
    ap.add_argument("--no-adaptive-parameters", dest="adaptive_parameters", action="store_false")
    ap.add_argument("--voxel-size", type=float, default=0.25)
    ap.add_argument("--des-r", type=float, default=5.0)
    ap.add_argument("--voxel-ratio", type=float, default=0.05)
    ap.add_argument("--max-points-per-part", type=int, default=20_000)
    ap.add_argument("--no-outlier-removal", action="store_true")
    ap.add_argument("--features", choices=["zero", "spinnet", "geometric"],
                    default="zero")
    ap.add_argument("--spinnet-checkpoint", default="")
    ap.add_argument("--camera-frame", action="store_true")
    ap.add_argument(
        "--output-generated", action="store_true",
        help="also write the generated keypoint clouds (ref --output_generated)",
    )
    ap.add_argument(
        "--render-results", action="store_true",
        help="render part-colored PNGs of the registered scene (headless "
             "equivalent of the reference's Open3D viewer)",
    )
    ap.add_argument(
        "--sequence-sharded", action="store_true",
        help="shard the parts + global attention sequence across all devices "
             "(ring attention) — for map-merge inputs too large for one chip",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--override", action="append", default=[])
    args = ap.parse_args(argv)
    return run_demo(args)


if __name__ == "__main__":
    sys.exit(main())
