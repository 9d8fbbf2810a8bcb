"""Eval suite tests against closed-form cases (SURVEY.md §4 oracles)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from rap_tpu.core.batch import make_regular_synthetic_batch
from rap_tpu.core.procrustes import fit_transformations, transform_points
from rap_tpu.eval import Evaluator, EvalConfig, MetricsMeter, metrics as M
from rap_tpu.eval.evaluator import trajectory_rigidity_rmse


def _batch(key=0, S=2, P=2, N=64):
    return make_regular_synthetic_batch(
        jax.random.key(key),
        points_per_part=[[N, N - 10]] * S,
        N=N,
        P=P,
        S=S,
        feat_dim=4,
    )


class TestChamfer:
    def test_zero_for_perfect_prediction(self):
        b = _batch()
        cd = M.chamfer_rmse(b, b.points_gt)
        np.testing.assert_allclose(np.asarray(cd), 0.0, atol=1e-3)

    def test_known_offset(self):
        """Shifting the prediction by d makes chamfer RMSE <= d (NN may
        re-match), and exactly d for a single faraway point per part."""
        b = _batch(S=1)
        shifted = b.points_gt + jnp.asarray([0.005, 0.0, 0.0])
        cd = float(M.chamfer_rmse(b, shifted)[0])
        assert 0.0 < cd <= 0.005 + 1e-5

    def test_padding_invariance(self):
        b = _batch(S=1)
        pred = b.points_gt
        corrupted = jnp.where(b.point_mask[..., None], pred, 1e3)
        cd1 = float(M.chamfer_rmse(b, pred)[0])
        cd2 = float(M.chamfer_rmse(b, corrupted)[0])
        np.testing.assert_allclose(cd1, cd2, atol=1e-5)


class TestICP:
    def test_recovers_known_rigid_perturbation(self):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((1, 300, 3)).astype(np.float32)
        R_true = Rotation.from_euler("zyx", [8, -5, 3], degrees=True).as_matrix()
        t_true = np.array([0.05, -0.02, 0.03], np.float32)
        tgt = pts @ R_true.T.astype(np.float32) + t_true
        mask = np.ones((1, 300), bool)
        R, t = M.icp_point_to_point(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(tgt), jnp.asarray(mask)
        )
        np.testing.assert_allclose(np.asarray(R[0]), R_true, atol=1e-3)
        np.testing.assert_allclose(np.asarray(t[0]), t_true, atol=1e-3)

    def test_empty_source_identity(self):
        pts = jnp.zeros((1, 16, 3))
        mask = jnp.zeros((1, 16), bool)
        R, t = M.icp_point_to_point(pts, mask, pts + 1.0, jnp.ones((1, 16), bool))
        np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t[0]), 0.0, atol=1e-6)

    def test_align_anchor_fixes_global_offset(self):
        b = _batch(S=1)
        R_g = jnp.asarray(
            Rotation.from_euler("z", 10, degrees=True).as_matrix(), jnp.float32
        )
        pred = jnp.einsum("ij,gnj->gni", R_g, b.points_gt) + jnp.asarray(
            [0.1, 0.0, 0.0]
        )
        pred = jnp.where(b.point_mask[..., None], pred, 0.0)
        aligned = M.align_anchor(b, pred, iters=30)
        err = jnp.abs(
            jnp.where(b.point_mask[..., None], aligned - b.points_gt, 0.0)
        ).max()
        assert float(err) < 5e-3

    def test_icp_transform_errors_zero_for_gt_poses(self):
        b = _batch(S=2)
        re, te = M.transform_errors_icp(b, b.rotations_gt, b.translations_gt)
        assert np.all(np.asarray(re) < 0.5)
        assert np.all(np.asarray(te) < 5e-3)

    @staticmethod
    def _partial_overlap_pair(rng):
        """Two ~57%-overlapping views of a structured scene as a PartBatch
        (anchor + one posed part); returns the batch."""
        from rap_tpu.core.batch import PartBatch
        # structured scene with irregular sampling (a regular grid would give
        # ICP a lattice-shifted local optimum) and three orthogonal surfaces
        # (two would leave one translation axis unconstrained — planes slide)
        floor = np.stack(
            [rng.uniform(-1, 1, 500), rng.uniform(-1, 1, 500), np.zeros(500)], -1
        )
        wall_y = np.stack(
            [rng.uniform(-1, 1, 350), np.ones(350), rng.uniform(0, 1, 350)], -1
        )
        wall_x = np.stack(
            [-np.ones(350), rng.uniform(-1, 1, 350), rng.uniform(0, 1, 350)], -1
        )
        bumps = rng.uniform(-1, 1, (100, 3))
        scene = np.concatenate([floor, wall_y, wall_x, bumps]).astype(np.float32)
        scene += rng.normal(0, 0.005, scene.shape).astype(np.float32)
        rng.shuffle(scene)
        n = len(scene)  # 1252
        v0 = scene[: int(0.7 * n)]          # anchor view
        v1 = scene[int(0.3 * n):]           # ~57% overlap with v0
        N = max(len(v0), len(v1))

        # label contract: points @ R_gt^T + t_gt == points_gt; anchor R=I,t=0
        R_fwd = Rotation.from_euler("zyx", [40, 25, -30], degrees=True).as_matrix()
        c1 = v1.mean(0)
        cond1 = (v1 - c1) @ R_fwd.astype(np.float32)   # = (v1-c1) @ (R_gt)^-1
        R_gt = R_fwd.astype(np.float32)                # cond1 @ R_gt^T + c1 == v1
        pad = lambda a: np.pad(a, ((0, N - len(a)), (0, 0)))  # noqa: E731
        mask = np.zeros((2, N), bool)
        mask[0, : len(v0)] = True
        mask[1, : len(v1)] = True
        b = PartBatch(
            points=jnp.asarray(np.stack([pad(v0), pad(cond1)])),
            points_gt=jnp.asarray(np.stack([pad(v0), pad(v1)])),
            local_feats=jnp.zeros((2, N, 4), jnp.float32),
            point_mask=jnp.asarray(mask),
            part_valid=jnp.ones(2, bool),
            sample_of_part=jnp.zeros(2, jnp.int32),
            anchor_part=jnp.asarray([True, False]),
            rotations_gt=jnp.asarray(np.stack([np.eye(3, dtype=np.float32), R_gt])),
            translations_gt=jnp.asarray(
                np.stack([np.zeros(3, np.float32), c1.astype(np.float32)])
            ),
            scale=jnp.ones(1, jnp.float32),
            sample_valid=jnp.ones(1, bool),
        )
        return b

    def test_trimmed_icp_pose_refinement_partial_overlap(self):
        """refine_poses_icp snaps a coarse pose (6 deg / 0.3 off) onto the
        anchor given ~55% view overlap — the trimmed correspondences keep the
        non-overlapping region from dragging the fit."""
        from rap_tpu.registration import refine_poses_icp

        b = self._partial_overlap_pair(np.random.default_rng(3))
        # perturb ONLY the non-anchor pose (a shared perturbation cancels in
        # anchor-relative errors)
        dR = jnp.asarray(
            Rotation.from_euler("zyx", [4, -3, 2], degrees=True).as_matrix(),
            jnp.float32,
        )
        sel = jnp.asarray([0.0, 1.0])[:, None, None]
        R_pred = jnp.where(
            sel > 0, jnp.einsum("ij,gjk->gik", dR, b.rotations_gt), b.rotations_gt
        )
        t_pred = b.translations_gt + jnp.asarray([0.2, -0.15, 0.1]) * sel[..., 0]
        re0, te0 = M.transform_errors(b, R_pred, t_pred, anchor_relative=True)
        R_ref, t_ref = refine_poses_icp(b, R_pred, t_pred, iters=30,
                                        trim_fraction=0.7)
        re1, te1 = M.transform_errors(b, R_ref, t_ref, anchor_relative=True)
        # the coarse error is ~6 deg / ~0.3; refinement lands well under 1 deg/2cm
        assert float(re0[0]) > 3.0 and float(te0[0]) > 0.2
        assert float(re1[0]) < 1.0, float(re1[0])
        assert float(te1[0]) < 0.02, float(te1[0])

    def test_yaw_restart_icp_recovers_large_yaw_error(self):
        """A pose 120 deg off in yaw sits far outside single-init ICP's
        convergence basin; yaw_restarts=6 tries evenly spaced yaw inits about
        the part centroid and the trimmed-residual selection recovers it."""
        from rap_tpu.registration import refine_poses_icp

        b = self._partial_overlap_pair(np.random.default_rng(3))
        dR = jnp.asarray(
            Rotation.from_euler("z", 120, degrees=True).as_matrix(), jnp.float32
        )
        # pivot the posed part about its own centroid so translation stays
        # plausible: x' = dR (R x + t - c) + c
        mask1 = np.asarray(b.point_mask[1])
        posed1 = np.asarray(b.points[1]) @ np.asarray(b.rotations_gt[1]).T + \
            np.asarray(b.translations_gt[1])
        c = jnp.asarray(posed1[mask1].mean(0), jnp.float32)
        sel = jnp.asarray([0.0, 1.0])[:, None, None]
        R_pred = jnp.where(
            sel > 0, jnp.einsum("ij,gjk->gik", dR, b.rotations_gt),
            b.rotations_gt,
        )
        t_bad = jnp.einsum("ij,j->i", dR, b.translations_gt[1] - c) + c
        t_pred = jnp.stack([b.translations_gt[0], t_bad])

        re0, _ = M.transform_errors(b, R_pred, t_pred, anchor_relative=True)
        assert float(re0[0]) > 100.0
        # single init: stuck in a wrong basin
        R1, t1 = refine_poses_icp(b, R_pred, t_pred, iters=30,
                                  trim_fraction=0.7)
        re1, _ = M.transform_errors(b, R1, t1, anchor_relative=True)
        assert float(re1[0]) > 30.0, float(re1[0])
        # 6 yaw restarts: recovered
        R6, t6 = refine_poses_icp(b, R_pred, t_pred, iters=30,
                                  trim_fraction=0.7, yaw_restarts=6)
        re6, te6 = M.transform_errors(b, R6, t6, anchor_relative=True)
        assert float(re6[0]) < 2.0, float(re6[0])
        assert float(te6[0]) < 0.05, float(te6[0])

    def test_icp_errors_match_direct_errors_for_asymmetric_parts(self):
        # the reference's use_icp=True protocol measures the SAME pose error
        # through ICP alignment (it only differs for shape-symmetric parts,
        # ref metrics.py:182 "factor out the symmetry of parts"): for random
        # asymmetric parts with exact correspondences the ICP delta equals
        # the true perturbation, so errors agree with the direct algebra.
        b = _batch(S=2)
        dR = jnp.asarray(
            Rotation.from_euler("zyx", [4, -3, 2], degrees=True).as_matrix(),
            jnp.float32,
        )
        R_pred = jnp.einsum("ij,gjk->gik", dR, b.rotations_gt)
        t_pred = b.translations_gt + jnp.asarray([0.03, -0.02, 0.01])
        re_raw, _ = M.transform_errors(b, R_pred, t_pred, anchor_relative=False)
        re_icp, _ = M.transform_errors_icp(b, R_pred, t_pred, iters=30)
        valid = np.isfinite(np.asarray(re_raw))
        np.testing.assert_allclose(
            np.asarray(re_icp)[valid], np.asarray(re_raw)[valid], rtol=0.15
        )


class TestPartAccuracy:
    def test_perfect_prediction_gives_one(self):
        b = _batch(S=2)
        acc, matched = M.part_accuracy(b, b.points_gt, threshold=0.01)
        np.testing.assert_allclose(acc, 1.0)
        # identity matching for distinct random parts
        np.testing.assert_array_equal(matched[:, :2], np.tile([0, 1], (2, 1)))

    def test_destroyed_part_fails(self):
        b = _batch(S=1)
        pred = np.asarray(b.points_gt).copy()
        pred[1] += 100.0  # part 1 nowhere near anything
        acc, _ = M.part_accuracy(b, jnp.asarray(pred), threshold=0.01)
        np.testing.assert_allclose(acc, [0.5])

    def test_swapped_parts_still_match(self):
        """Part interchangeability: swapping two identical-shape parts is a
        success under Hungarian matching."""
        rng = np.random.default_rng(1)
        pts = rng.standard_normal((64, 3)).astype(np.float32)
        from rap_tpu.data.packer import collate_to_part_batch
        from rap_tpu.data.dataset import Sample

        smp = Sample(
            name="x", dataset_name="toy", index=0,
            points=[pts, pts + 5.0], points_gt=[pts, pts + 5.0],
            features=[np.zeros((64, 4), np.float32)] * 2,
            rotations=np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)),
            translations=np.zeros((2, 3), np.float32),
            anchor_idx=0, scale=1.0,
            global_rotation=np.eye(3, dtype=np.float32),
            global_translation=np.zeros(3, np.float32),
        )
        b, _ = collate_to_part_batch([smp], N=64, P=2)
        swapped = jnp.asarray(
            np.stack([np.asarray(b.points_gt)[1], np.asarray(b.points_gt)[0]])
        )
        acc, matched = M.part_accuracy(b, swapped, threshold=0.01)
        np.testing.assert_allclose(acc, [1.0])
        np.testing.assert_array_equal(matched[0], [1, 0])


class TestTransformErrors:
    def test_zero_for_gt_poses(self):
        b = _batch()
        rot, trans = M.transform_errors(
            b, b.rotations_gt, b.translations_gt, anchor_relative=True
        )
        np.testing.assert_allclose(np.asarray(rot), 0.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(trans), 0.0, atol=1e-4)
        rot_d, trans_d = M.transform_errors(
            b, b.rotations_gt, b.translations_gt, anchor_relative=False
        )
        np.testing.assert_allclose(np.asarray(rot_d), 0.0, atol=1e-3)

    def test_known_rotation_error(self):
        """Perturb the non-anchor part's pose by a known angle."""
        b = _batch(S=1, P=2)
        Rz = Rotation.from_euler("z", 20, degrees=True).as_matrix().astype(np.float32)
        R_pred = np.asarray(b.rotations_gt).copy()
        anchor = np.asarray(b.anchor_part)
        nonanchor = int(np.where(~anchor[:2])[0][0])
        R_pred[nonanchor] = R_pred[nonanchor] @ Rz
        rot, _ = M.transform_errors(
            b, jnp.asarray(R_pred), b.translations_gt, anchor_relative=True
        )
        np.testing.assert_allclose(float(rot[0]), 20.0, atol=0.1)

    def test_translation_error_scales_to_meters(self):
        b = _batch(S=1, P=2)
        b = b.replace(scale=jnp.full((1,), 4.0))
        t_pred = np.asarray(b.translations_gt).copy()
        anchor = np.asarray(b.anchor_part)
        nonanchor = int(np.where(~anchor[:2])[0][0])
        t_pred[nonanchor] += [0.1, 0.0, 0.0]  # 0.1 scaled units = 0.4 m
        _, trans = M.transform_errors(
            b, b.rotations_gt, jnp.asarray(t_pred), anchor_relative=True
        )
        np.testing.assert_allclose(float(trans[0]), 0.4, atol=1e-4)


class TestRigidity:
    def test_zero_for_rigid_prediction(self):
        b = _batch()
        pred = transform_points(b.rotations_gt, b.translations_gt, b.points)
        pred = jnp.where(b.point_mask[..., None], pred, 0.0)
        rig = M.rigidity_rmse(b, pred, b.rotations_gt, b.translations_gt)
        np.testing.assert_allclose(np.asarray(rig), 0.0, atol=1e-4)

    def test_trajectory_rigidity_batched(self):
        b = _batch(S=1)
        pred = transform_points(b.rotations_gt, b.translations_gt, b.points)
        traj = jnp.stack([pred, pred + 0.01])
        rr = trajectory_rigidity_rmse(b, traj)
        assert rr.shape == (2, 1)
        np.testing.assert_allclose(float(rr[0, 0]), 0.0, atol=1e-4)
        # a constant offset is itself rigid => still ~0
        np.testing.assert_allclose(float(rr[1, 0]), 0.0, atol=1e-4)


class TestCorrespondence:
    def test_perfect_pair(self):
        """Two overlapping parts, GT poses: RMSE ~ 0, ratio > 0."""
        rng = np.random.default_rng(0)
        base = rng.standard_normal((80, 3)).astype(np.float32) * 0.1
        # source part = points 0..59, target part = points 20..79 (overlap 40)
        from rap_tpu.core.batch import PartBatch

        N = 64
        src_gt = base[:60]
        tgt_gt = base[20:]
        R = Rotation.random(random_state=rng).as_matrix().astype(np.float32)

        def pad(x):
            out = np.zeros((N, 3), np.float32)
            out[: len(x)] = x
            return out

        pts_gt = np.stack([pad(src_gt), pad(tgt_gt[:N])])
        # condition: target part rotated (anchor = source = part 0)
        tgt_in = (tgt_gt[:N] - tgt_gt[:N].mean(0)) @ R.T
        pts_in = np.stack([pad(src_gt), pad(tgt_in)])
        mask = np.zeros((2, N), bool)
        mask[0, :60] = True
        mask[1, : len(tgt_gt[:N])] = True
        rot_gt = np.stack([np.eye(3, dtype=np.float32), R.T @ np.eye(3)])
        # pose: tgt_in @ R_gt^T + t == tgt_gt  => R_gt = R^T? verify:
        # tgt_in = (tgt - c) R^T => tgt = tgt_in R + c => R_gt^T = R => R_gt = R^T
        rot_gt = np.stack([np.eye(3, dtype=np.float32), np.asarray(R.T)])
        trans_gt = np.stack([np.zeros(3, np.float32), tgt_gt[:N].mean(0)])
        b = PartBatch(
            points=jnp.asarray(pts_in),
            points_gt=jnp.asarray(pts_gt),
            local_feats=jnp.zeros((2, N, 4)),
            point_mask=jnp.asarray(mask),
            part_valid=jnp.asarray([True, True]),
            sample_of_part=jnp.asarray([0, 0], jnp.int32),
            anchor_part=jnp.asarray([True, False]),
            rotations_gt=jnp.asarray(rot_gt),
            translations_gt=jnp.asarray(trans_gt),
            scale=jnp.ones((1,)),
            sample_valid=jnp.asarray([True]),
        )
        # sanity: stored pose maps condition -> gt
        rec = transform_points(b.rotations_gt, b.translations_gt, b.points)
        err = jnp.abs(rec - b.points_gt) * b.point_mask[..., None]
        assert float(err.max()) < 1e-5

        rmse, ratio, terr = M.correspondence_rmse_pairs(
            b, b.rotations_gt, b.translations_gt
        )
        # with pred == GT, RMSE equals the RMS of GT NN distances at matched
        # points: bounded by the 5 cm matching threshold, and the 40 shared
        # points contribute exactly 0
        assert 0.0 <= float(rmse[0]) <= 0.05
        assert float(ratio[0]) > 0.5
        assert float(terr[0]) < 1e-3

    def test_identical_overlap_only(self):
        """Overlap region identical, rest far apart => RMSE exactly 0."""
        from rap_tpu.core.batch import PartBatch

        N = 32
        shared = np.random.default_rng(1).standard_normal((20, 3)).astype(np.float32)
        far_a = shared[:6] + 100.0
        far_b = shared[:6] - 100.0

        def pad(x):
            out = np.zeros((N, 3), np.float32)
            out[: len(x)] = x
            return out

        src = np.concatenate([shared, far_a])
        tgt = np.concatenate([shared, far_b])
        mask = np.zeros((2, N), bool)
        mask[0, : len(src)] = True
        mask[1, : len(tgt)] = True
        b = PartBatch(
            points=jnp.asarray(np.stack([pad(src), pad(tgt)])),
            points_gt=jnp.asarray(np.stack([pad(src), pad(tgt)])),
            local_feats=jnp.zeros((2, N, 4)),
            point_mask=jnp.asarray(mask),
            part_valid=jnp.asarray([True, True]),
            sample_of_part=jnp.asarray([0, 0], jnp.int32),
            anchor_part=jnp.asarray([True, False]),
            rotations_gt=jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
            translations_gt=jnp.zeros((2, 3)),
            scale=jnp.ones((1,)),
            sample_valid=jnp.asarray([True]),
        )
        rmse, ratio, terr = M.correspondence_rmse_pairs(
            b, b.rotations_gt, b.translations_gt
        )
        np.testing.assert_allclose(float(rmse[0]), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(ratio[0]), 20 / 26, atol=1e-6)


class TestMixedBatchPairGating:
    def test_three_part_sample_excluded(self):
        """In a P=4 batch, a 2-part sample gets pair metrics while a 3-part
        sample in the same batch gets inf/0 (ref computes correspondence
        metrics only for pairwise samples, metrics.py:386-469)."""
        from rap_tpu.core.batch import PartBatch

        rng = np.random.default_rng(5)
        N, P, S = 24, 4, 2
        pts = rng.standard_normal((S * P, N, 3)).astype(np.float32)
        mask = np.zeros((S * P, N), bool)
        part_valid = np.zeros(S * P, bool)
        # sample 0: exactly 2 valid parts with identical clouds (perfect pair)
        pts[1] = pts[0]
        mask[0] = mask[1] = True
        part_valid[0] = part_valid[1] = True
        # sample 1: 3 valid parts
        mask[4] = mask[5] = mask[6] = True
        part_valid[4] = part_valid[5] = part_valid[6] = True
        b = PartBatch(
            points=jnp.asarray(pts),
            points_gt=jnp.asarray(pts),
            local_feats=jnp.zeros((S * P, N, 4)),
            point_mask=jnp.asarray(mask),
            part_valid=jnp.asarray(part_valid),
            sample_of_part=jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1], jnp.int32),
            anchor_part=jnp.asarray([True, False, False, False,
                                     True, False, False, False]),
            rotations_gt=jnp.broadcast_to(jnp.eye(3), (S * P, 3, 3)),
            translations_gt=jnp.zeros((S * P, 3)),
            scale=jnp.ones((S,)),
            sample_valid=jnp.asarray([True, True]),
        )
        rmse, ratio, terr = M.correspondence_rmse_pairs(
            b, b.rotations_gt, b.translations_gt
        )
        np.testing.assert_allclose(float(rmse[0]), 0.0, atol=1e-5)
        assert not np.isfinite(float(rmse[1]))
        assert float(ratio[1]) == 0.0


class TestOverlap:
    def test_overlapping_parts(self):
        b = _batch(S=1)
        # prediction where both parts coincide -> overlap ratio ~1 at all taus
        pred = jnp.broadcast_to(b.points_gt[0:1], b.points_gt.shape)
        ors = M.overlap_ratio(b, pred)
        assert ors.shape == (3, 1)
        assert float(ors[2, 0]) > 0.9

    def test_distant_parts(self):
        b = _batch(S=1)
        pred = b.points_gt + jnp.arange(b.G)[:, None, None] * 100.0
        ors = M.overlap_ratio(b, pred)
        np.testing.assert_allclose(np.asarray(ors), 0.0, atol=1e-6)


class TestEvaluatorAggregation:
    def test_full_metric_dict_and_selection(self):
        b = _batch(S=2)
        ev = Evaluator(EvalConfig(rmse_eval_on=True, overlap_eval_on=True))
        good = transform_points(b.rotations_gt, b.translations_gt, b.points)
        good = jnp.where(b.point_mask[..., None], good, 0.0)
        bad = good + 0.3
        results = []
        for pred in [bad, good]:
            R, t = fit_transformations(b.points, pred, b.point_mask)
            results.append(ev.compute_metrics(b, pred, R, t))
        assert "chamfer_l2 (m)" in results[0]
        assert "recall_at_15deg_0.3m (indoor_bufferx)" in results[0]
        agg = ev.aggregate_generations(b, results)
        assert "best_of_2" in agg and "rigidity_selected" in agg
        # best-of-2 chamfer should equal the good generation's (lower)
        np.testing.assert_allclose(
            agg["best_of_2"]["object_chamfer"],
            np.asarray(results[1]["object_chamfer"]),
            atol=1e-5,
        )
        # rigidity selection: 'bad' pred (+const shift) is still rigid, so both
        # gens have ~0 rigidity; just check shape/validity
        assert agg["rigidity_selected_gen"].shape == (2,)

    def test_meter_accumulation(self):
        meter = MetricsMeter()
        meter.add_metrics(
            ["a", "b"],
            {"m": np.asarray([1.0, 3.0])},
            valid=np.asarray([True, True]),
            num_parts=np.asarray([2, 4]),
        )
        meter.add_metrics(
            "a", {"m": np.asarray([5.0])}, valid=np.asarray([True]),
            num_parts=np.asarray([3]),
        )
        avg = meter.compute_average()
        np.testing.assert_allclose(avg["a"]["m"], 3.0)
        np.testing.assert_allclose(avg["b"]["m"], 3.0)
        np.testing.assert_allclose(avg["overall"]["m"], 3.0)
        assert meter.get_sample_counts() == {"a": 2, "b": 1}
        assert meter.get_part_count_ranges()["a"] == (2, 3)

    def test_meter_key_encoding_rejects_overlong_keys(self):
        import pytest

        from rap_tpu.eval.meter import _encode_metric_keys

        enc = _encode_metric_keys(["short_key"], n_max=2, klen=64)
        assert enc.shape == (2, 64)
        assert bytes(enc[0][:9]) == b"short_key"
        with pytest.raises(ValueError, match="64-byte"):
            _encode_metric_keys(["k" * 65], n_max=1, klen=64)

    def test_meter_skips_inf_and_invalid(self):
        meter = MetricsMeter()
        meter.add_metrics(
            ["a", "a"],
            {"m": np.asarray([np.inf, 2.0])},
            valid=np.asarray([True, True]),
        )
        meter.add_metrics(
            "a", {"m": np.asarray([99.0])}, valid=np.asarray([False])
        )
        assert meter.compute_average()["a"]["m"] == 2.0


class TestPlyIO:
    def test_roundtrip(self, tmp_path):
        from rap_tpu.utils import ply

        rng = np.random.default_rng(0)
        pts = rng.standard_normal((100, 3)).astype(np.float32)
        nrm = rng.standard_normal((100, 3)).astype(np.float32)
        col = rng.integers(0, 255, (100, 3)).astype(np.uint8)
        for binary in [True, False]:
            p = tmp_path / f"test_{binary}.ply"
            ply.write_ply(p, pts, nrm, col, binary=binary)
            data = ply.read_ply(p)
            atol = 1e-6 if binary else 1e-4
            np.testing.assert_allclose(data["points"], pts, atol=atol)
            np.testing.assert_allclose(data["normals"], nrm, atol=atol)
            np.testing.assert_array_equal(data["colors"], col)

    def test_pcd_roundtrip(self, tmp_path):
        from rap_tpu.utils import ply
        rng = np.random.default_rng(1)
        pts = rng.standard_normal((40, 3)).astype(np.float32)
        col = rng.integers(0, 255, (40, 3)).astype(np.uint8)
        for binary in (True, False):
            p = tmp_path / f"t_{binary}.pcd"
            ply.write_pcd(p, pts, col, binary=binary)
            data = ply.read_pcd(p)
            np.testing.assert_allclose(data["points"], pts, atol=1e-4)
            np.testing.assert_array_equal(data["colors"], col)

    def test_saves_artifacts(self, tmp_path):
        b = _batch(S=1)
        ev = Evaluator(
            EvalConfig(
                save_results=True,
                save_pointcloud_parts=True,
                save_merged_pointcloud_steps=True,
                output_dir=str(tmp_path / "res"),
            )
        )
        pred = np.asarray(b.points_gt)
        R, t = fit_transformations(b.points, b.points_gt, b.point_mask)
        md = ev.compute_metrics(b, b.points_gt, R, t)
        traj = np.stack([pred, pred])  # 2 fake ODE steps
        ev.save_sample_results(
            b, pred, np.asarray(R), np.asarray(t),
            {k: np.asarray(v) for k, v in md.items()},
            sample_names=["pair_000"], dataset_name="demo",
            trajectory=traj, midpoint_trajectory=traj,
        )
        d = tmp_path / "res" / "demo" / "pair_000" / "generation_0"
        assert (d / "metrics.json").exists()
        # reference contract: relative-to-GT transform files, 2-digit part ids
        assert (d / "part00_transform.txt").exists()
        assert (d / "part01_transform.txt").exists()
        # with perfect prediction the relative-to-GT transform is identity
        # (composed with inv of the identity global transform)
        T_rel = np.loadtxt(d / "part00_transform.txt")
        np.testing.assert_allclose(T_rel, np.eye(4), atol=1e-4)
        # raw predicted pose flavor
        T = np.loadtxt(d / "part00_pose.txt")
        assert T.shape == (4, 4)
        np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-9)
        assert (d / "global_transform.txt").exists()
        assert (d / "merged_pred.ply").exists()
        # per-ODE-step merged clouds: endpoint AND midpoint, .pcd with colors
        from rap_tpu.utils import ply
        for sub in ("endpoint", "midpoint"):
            for st in range(2):
                f = d / "generation" / sub / f"step_{st}.pcd"
                assert f.exists(), f
            data = ply.read_pcd(d / "generation" / sub / "step_0.pcd")
            assert "colors" in data and len(data["points"]) > 0
        assert (d / "generation" / "merged_input.pcd").exists()


class TestEvalConfigExtensions:
    def test_part_acc_ecdf_icp_keys(self):
        b = _batch(S=2)
        ev = Evaluator(EvalConfig(
            part_acc_eval_on=True, ecdf_eval_on=True, use_icp=True,
        ))
        R, t = fit_transformations(b.points, b.points_gt, b.point_mask)
        md = ev.compute_metrics(b, b.points_gt, R, t)
        np.testing.assert_allclose(np.asarray(md["part_accuracy"]), 1.0)
        # perfect prediction: all errors below every ECDF threshold
        np.testing.assert_allclose(np.asarray(md["ecdf_rotation_at_3deg"]), 1.0)
        np.testing.assert_allclose(np.asarray(md["ecdf_translation_at_0.05m"]), 1.0)
        assert np.all(np.asarray(md["average_rotation_error (deg)"]) < 1.0)

    def test_artifact_sample_limit(self, tmp_path):
        b = _batch(S=2)
        ev = Evaluator(EvalConfig(
            save_results=True, output_dir=str(tmp_path / "res"),
            max_artifact_samples_per_batch=1,
        ))
        R, t = fit_transformations(b.points, b.points_gt, b.point_mask)
        md = ev.compute_metrics(b, b.points_gt, R, t)
        ev.save_sample_results(
            b, np.asarray(b.points_gt), np.asarray(R), np.asarray(t),
            {k: np.asarray(v) for k, v in md.items()},
            sample_names=["a", "b"], dataset_name="demo",
        )
        d0 = tmp_path / "res" / "demo" / "a" / "generation_0"
        d1 = tmp_path / "res" / "demo" / "b" / "generation_0"
        # clouds only for the first sample; JSON + transforms for both
        assert (d0 / "merged_pred.ply").exists()
        assert not (d1 / "merged_pred.ply").exists()
        for d in (d0, d1):
            assert (d / "metrics.json").exists()
            assert (d / "part00_transform.txt").exists()

    def test_meter_sample_counts_not_inflated_by_aggregate_adds(self):
        meter = MetricsMeter()
        valid = np.array([True, True])
        md = {"m": np.array([1.0, 2.0])}
        meter.add_metrics("toy", md, valid, np.array([2, 2]))  # primary
        meter.add_metrics("toy", {"best_of_2/m": md["m"]}, valid)  # aggregate
        meter.add_metrics("toy", {"rigidity_selected/m": md["m"]}, valid)
        assert meter.get_sample_counts()["toy"] == 2
        avg = meter.compute_average()["toy"]
        assert avg["m"] == 1.5 and avg["best_of_2/m"] == 1.5


class TestEvalRunner:
    def test_multi_generation_protocol(self, tmp_path):
        """evaluate_split with n_generations>1 reports avg + best-of-N +
        rigidity-selected sections (the reference benchmark protocol,
        scripts/test_script_example.sh n_generations=3)."""
        from rap_tpu.data import DatasetConfig, PointCloudDataset
        from rap_tpu.eval.runner import evaluate_split
        from rap_tpu.models import DiTConfig
        from rap_tpu.models.dit import init_dit_params
        from rap_tpu.registration import RPFConfig
        from rap_tpu.utils import ply as plyio

        rng = np.random.default_rng(0)
        root = tmp_path / "data"
        names = [f"s{i}" for i in range(3)]
        for n in names:
            d = root / n
            d.mkdir(parents=True)
            for p in range(2):
                plyio.write_ply(
                    d / f"part_{p}.ply",
                    rng.standard_normal((40 + 8 * p, 3)).astype(np.float32),
                )
        (root / "data_split").mkdir()
        (root / "data_split" / "train.txt").write_text(names[0] + "\n")
        (root / "data_split" / "val.txt").write_text("\n".join(names[1:]) + "\n")

        model = DiTConfig(num_layers=1, embed_dim=32, num_heads=2,
                          local_feat_dim=32, compute_dtype=jnp.float32)
        pipe = RPFConfig(model=model, inference_sampling_steps=2,
                         rigidity_forcing=True)
        ds = PointCloudDataset(DatasetConfig(
            split="val", data_path=str(root), dataset_name="synth"))
        params = init_dit_params(jax.random.key(0), model)
        res = evaluate_split(params, pipe, ds, batch_tokens=512,
                             n_generations=2, tag="t")
        assert "recall_at_10deg_0.2m (nss)" in res
        assert "best_of_2/recall_at_10deg_0.2m (nss)" in res
        assert "rigidity_selected/recall_at_10deg_0.2m (nss)" in res
        for v in res.values():
            assert np.isfinite(v)
        # best-of-N recall dominates the average by construction
        assert (res["best_of_2/recall_at_10deg_0.2m (nss)"]
                >= res["recall_at_10deg_0.2m (nss)"] - 1e-9)
