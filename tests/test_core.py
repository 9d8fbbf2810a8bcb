"""Unit tests for the core layer: batch layout, flow algebra, Kabsch, sampler.

Oracles follow SURVEY.md §4: dataset inverse-transform invariant, exact pose
recovery on noiseless rigid transforms, Euler sampler on an analytic linear
velocity field, flow-target algebra.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from rap_tpu.core import flow, procrustes, sampler, segments
from rap_tpu.core.batch import make_synthetic_batch, validate


def _rand_rot(rng):
    return Rotation.random(random_state=rng).as_matrix().astype(np.float32)


class TestBatch:
    def test_synthetic_batch_invariants(self):
        b = make_synthetic_batch(
            jax.random.key(0),
            parts_per_sample=[2, 3],
            points_per_part=[[50, 30], [20, 64, 10]],
            N=64,
            G=8,
            S=4,
        )
        validate(b)
        assert b.G == 8 and b.N == 64 and b.S == 4
        assert int(b.part_valid.sum()) == 5
        np.testing.assert_array_equal(
            np.asarray(b.points_per_part), [50, 30, 20, 64, 10, 0, 0, 0]
        )

    def test_inverse_transform_invariant(self):
        """points @ R^T + t == points_gt for every valid part (ref dataset.py:908-933)."""
        b = make_synthetic_batch(
            jax.random.key(1),
            parts_per_sample=[3],
            points_per_part=[[40, 64, 25]],
            N=64,
        )
        rec = procrustes.transform_points(b.rotations_gt, b.translations_gt, b.points)
        err = jnp.abs(rec - b.points_gt) * b.point_mask[..., None]
        assert float(err.max()) < 1e-5

    def test_broadcast_helpers(self):
        b = make_synthetic_batch(
            jax.random.key(2),
            parts_per_sample=[2, 1],
            points_per_part=[[10, 20], [30]],
            N=32,
            S=2,
        )
        x = jnp.asarray([5.0, 7.0])
        per_part = b.per_sample_to_part(x)
        np.testing.assert_array_equal(np.asarray(per_part), [5.0, 5.0, 7.0])
        per_point = b.per_sample_to_point(x)
        assert per_point.shape == (3, 32)

    def test_seg_ids(self):
        b = make_synthetic_batch(
            jax.random.key(3),
            parts_per_sample=[2],
            points_per_part=[[4, 2]],
            N=4,
        )
        part_ids = np.asarray(b.part_seg_ids).reshape(2, 4)
        np.testing.assert_array_equal(part_ids[0], [0, 0, 0, 0])
        np.testing.assert_array_equal(part_ids[1], [1, 1, -1, -1])
        samp_ids = np.asarray(b.sample_seg_ids).reshape(2, 4)
        np.testing.assert_array_equal(samp_ids[0], [0, 0, 0, 0])
        np.testing.assert_array_equal(samp_ids[1], [0, 0, -1, -1])


class TestFlow:
    @pytest.mark.parametrize("scheme", ["u_shaped", "logit_normal", "mode", "uniform"])
    def test_timestep_range(self, scheme):
        t = flow.sample_timesteps(jax.random.key(0), 4096, scheme)
        assert t.shape == (4096,)
        assert float(t.min()) >= 0.01 - 1e-6
        assert float(t.max()) <= 1.0 + 1e-6

    def test_late_heavy_concentrates_near_one(self):
        t = np.asarray(
            flow.sample_timesteps(jax.random.key(2), 100_000, "late_heavy")
        )
        assert t.min() >= 0.01 - 1e-6 and t.max() <= 1.0 + 1e-6
        # ~50% uniform mass on [0.7, 1) plus the u_shaped tail => well over
        # half the samples land late; the early tail must remain covered
        assert (t >= 0.7).mean() > 0.55
        assert (t < 0.3).mean() > 0.10

    def test_u_shaped_is_symmetric(self):
        t = np.asarray(flow.sample_timesteps(jax.random.key(1), 100_000, "u_shaped"))
        assert abs(t.mean() - 0.5) < 0.01
        # U-shape: tails denser than the middle
        assert (t < 0.1).mean() > (abs(t - 0.5) < 0.05).mean()

    def test_interpolation_algebra(self):
        x0 = jnp.ones((2, 4, 3))
        x1 = jnp.zeros((2, 4, 3))
        x_t, v = flow.flow_interpolate(x0, x1, 0.25)
        np.testing.assert_allclose(np.asarray(x_t), 0.75, atol=1e-7)
        np.testing.assert_allclose(np.asarray(v), -1.0, atol=1e-7)

    def test_masked_loss_ignores_padding(self):
        v_pred = jnp.ones((2, 4, 3))
        v_t = jnp.zeros((2, 4, 3))
        mask = jnp.asarray([[1, 1, 0, 0], [1, 0, 0, 0]], bool)
        # corrupt padded entries wildly — must not affect the loss
        v_pred = v_pred.at[0, 3].set(1e6)
        loss = flow.velocity_loss(v_pred, v_t, mask, "mse")
        np.testing.assert_allclose(float(loss), 1.0, atol=1e-6)
        l1 = flow.velocity_loss(v_pred, v_t, mask, "l1")
        np.testing.assert_allclose(float(l1), 1.0, atol=1e-6)


class TestProcrustes:
    def test_exact_recovery(self):
        rng = np.random.default_rng(0)
        G, N = 6, 50
        src = rng.standard_normal((G, N, 3)).astype(np.float32)
        R_true = np.stack([_rand_rot(rng) for _ in range(G)])
        t_true = rng.standard_normal((G, 3)).astype(np.float32)
        tgt = np.einsum("gij,gnj->gni", R_true, src) + t_true[:, None]
        mask = np.ones((G, N), bool)
        R, t = procrustes.kabsch_masked(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-4)

    def test_mask_excludes_outliers(self):
        rng = np.random.default_rng(1)
        N = 40
        src = rng.standard_normal((1, N, 3)).astype(np.float32)
        R_true = _rand_rot(rng)[None]
        tgt = np.einsum("gij,gnj->gni", R_true, src)
        # corrupt the masked-out half of target
        tgt[:, N // 2 :] += 100.0
        mask = np.zeros((1, N), bool)
        mask[:, : N // 2] = True
        R, t = procrustes.kabsch_masked(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-4)

    def test_empty_part_is_identity(self):
        src = jnp.zeros((2, 8, 3))
        tgt = jnp.ones((2, 8, 3))
        mask = jnp.asarray([[True] * 8, [False] * 8])
        R, t = procrustes.kabsch_masked(src, tgt, mask)
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t[1]), 0.0, atol=1e-6)

    def test_zero_weights_fall_back_to_identity(self):
        """A valid-mask part whose weights are ~0 must take the (I, 0)
        fallback, not divide by the epsilon clamp."""
        rng = np.random.default_rng(9)
        src = jnp.asarray(rng.standard_normal((1, 32, 3)), dtype=jnp.float32)
        tgt = src + 1.0
        R, t = procrustes.kabsch_masked(
            src, tgt, jnp.ones((1, 32), bool),
            weights=jnp.zeros((1, 32)),
        )
        np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t[0]), 0.0, atol=1e-6)

    def test_reflection_fix(self):
        """A near-planar part with a reflection-like target must yield det(R)=+1."""
        rng = np.random.default_rng(2)
        src = rng.standard_normal((1, 30, 3)).astype(np.float32)
        src[..., 2] *= 1e-4  # nearly planar
        tgt = src.copy()
        tgt[..., 0] *= -1  # mirror
        R, _ = procrustes.kabsch_masked(jnp.asarray(src), jnp.asarray(tgt), jnp.ones((1, 30), bool))
        assert float(jnp.linalg.det(R[0])) > 0.99

    def test_rigidify_rigid_prediction_is_fixed_point(self):
        rng = np.random.default_rng(3)
        G, N = 3, 20
        cond = rng.standard_normal((G, N, 3)).astype(np.float32)
        R = np.stack([_rand_rot(rng) for _ in range(G)])
        t = rng.standard_normal((G, 3)).astype(np.float32)
        pred = np.einsum("gij,gnj->gni", R, cond) + t[:, None]
        mask = np.ones((G, N), bool)
        rig = procrustes.rigidify_prediction(
            jnp.asarray(pred), jnp.asarray(cond), jnp.asarray(mask)
        )
        np.testing.assert_allclose(np.asarray(rig), pred, atol=1e-4)

    def test_gt_pose_recovery_on_batch(self):
        """Kabsch(cond -> gt) must reproduce the stored GT poses."""
        b = make_synthetic_batch(
            jax.random.key(4),
            parts_per_sample=[2, 2],
            points_per_part=[[30, 64], [64, 12]],
            N=64,
        )
        R, t = procrustes.fit_transformations(b.points, b.points_gt, b.point_mask)
        valid = np.asarray(b.part_valid)
        np.testing.assert_allclose(
            np.asarray(R)[valid], np.asarray(b.rotations_gt)[valid], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(t)[valid], np.asarray(b.translations_gt)[valid], atol=1e-4
        )

    def test_rotation_angle(self):
        rng = np.random.default_rng(5)
        axis = np.array([0.0, 0.0, 1.0])
        for deg in [0.0, 10.0, 90.0, 179.0]:
            R = Rotation.from_rotvec(np.radians(deg) * axis).as_matrix()
            ang = procrustes.rotation_angle_deg(jnp.eye(3), jnp.asarray(R))
            np.testing.assert_allclose(float(ang), deg, atol=1e-3)


class TestSampler:
    def test_euler_on_analytic_field(self):
        """With the exact rectified-flow field v = x_1 - x_0, Euler lands on x_0."""
        rng = np.random.default_rng(0)
        G, N = 2, 16
        x0 = jnp.asarray(rng.standard_normal((G, N, 3)), dtype=jnp.float32)
        x1 = jnp.asarray(rng.standard_normal((G, N, 3)), dtype=jnp.float32)
        v_true = x1 - x0

        res = sampler.flow_sampler(
            lambda x, t: v_true,
            x_1=x1,
            condition=x0,
            point_mask=jnp.ones((G, N), bool),
            num_steps=10,
            rigidity_forcing=False,
        )
        np.testing.assert_allclose(np.asarray(res.x_final), np.asarray(x0), atol=1e-5)
        # x0_hat is exact at every step for a linear field
        np.testing.assert_allclose(
            np.asarray(res.end_point_trajectory[0]), np.asarray(x0), atol=1e-5
        )
        assert res.end_point_trajectory.shape == (10, G, N, 3)
        assert res.trajectory.shape == (10, G, N, 3)

    def test_schedules_exact_on_analytic_field(self):
        """Non-uniform grids are exact for the linear field (any partition of
        [0,1] integrates v = x1 - x0 exactly), endpoints pinned at 1 and 0."""
        rng = np.random.default_rng(7)
        G, N = 2, 16
        x0 = jnp.asarray(rng.standard_normal((G, N, 3)), dtype=jnp.float32)
        x1 = jnp.asarray(rng.standard_normal((G, N, 3)), dtype=jnp.float32)
        v_true = x1 - x0
        for sched in ("uniform", "cosine", "power:2", "power:0.5"):
            ts = np.asarray(sampler.make_schedule(6, sched))
            assert ts[0] == 1.0 and ts[-1] == 0.0 and np.all(np.diff(ts) < 0)
            res = sampler.flow_sampler(
                lambda x, t: v_true, x_1=x1, condition=x0,
                point_mask=jnp.ones((G, N), bool), num_steps=6,
                rigidity_forcing=False, schedule=sched,
            )
            np.testing.assert_allclose(
                np.asarray(res.x_final), np.asarray(x0), atol=1e-5,
                err_msg=sched,
            )

    def test_schedule_validation_and_rigidity(self):
        """Bad schedule names raise; rigidity forcing on a non-uniform grid
        still ends exactly rigid (final state IS the rigid projection)."""
        import pytest

        with pytest.raises(ValueError):
            sampler.make_schedule(4, "powers:2")
        with pytest.raises(ValueError):
            sampler.make_schedule(4, "power:-1")

        rng = np.random.default_rng(8)
        G, N = 2, 32
        cond = jnp.asarray(rng.standard_normal((G, N, 3)), dtype=jnp.float32)
        x1 = jnp.asarray(rng.standard_normal((G, N, 3)), dtype=jnp.float32)
        res = sampler.flow_sampler(
            lambda x, t: x - cond, x_1=x1, condition=cond,
            point_mask=jnp.ones((G, N), bool), num_steps=5,
            rigidity_forcing=True, schedule="power:2",
        )
        # final = rigid transform of the condition: kabsch residual ~ 0
        from rap_tpu.core.procrustes import kabsch_masked

        R, t = kabsch_masked(cond, res.x_final, jnp.ones((G, N), bool))
        fit = jnp.einsum("gij,gnj->gni", R, cond) + t[:, None]
        np.testing.assert_allclose(
            np.asarray(fit), np.asarray(res.x_final), atol=1e-4
        )

    def test_rk2_rk4_on_analytic_field(self):
        """rk2/rk4 land on x_0 for the linear field and cost 2x/4x evals."""
        rng = np.random.default_rng(3)
        G, N = 2, 16
        x0 = jnp.asarray(rng.standard_normal((G, N, 3)), dtype=jnp.float32)
        x1 = jnp.asarray(rng.standard_normal((G, N, 3)), dtype=jnp.float32)
        v_true = x1 - x0
        for method, evals_per_step in (("rk2", 2), ("rk4", 4)):
            calls = []

            def vf(x, t):
                calls.append(1)
                return v_true

            res = sampler.flow_sampler(
                vf, x_1=x1, condition=x0,
                point_mask=jnp.ones((G, N), bool),
                num_steps=4, rigidity_forcing=False, method=method,
            )
            np.testing.assert_allclose(
                np.asarray(res.x_final), np.asarray(x0), atol=1e-5
            )
            # traced once per scan: evals per step visible in the trace count
            assert len(calls) == evals_per_step

    def test_rk4_beats_euler_on_curved_field(self):
        """On the curved field v = -x the sampler integrates dx/dt = v from
        t=1 down to 0, so x(0) = x1 * e; rk4's endpoint error is orders of
        magnitude below euler's."""
        rng = np.random.default_rng(4)
        x1 = jnp.asarray(rng.standard_normal((1, 8, 3)), dtype=jnp.float32)
        exact = np.asarray(x1) * np.exp(1.0)
        errs = {}
        for method in ("euler", "rk4"):
            res = sampler.flow_sampler(
                lambda x, t: -x, x_1=x1, condition=x1,
                point_mask=jnp.ones((1, 8), bool),
                num_steps=8, rigidity_forcing=False, method=method,
            )
            errs[method] = float(
                np.abs(np.asarray(res.x_final) - exact).max()
            )
        assert errs["rk4"] < errs["euler"] * 1e-3

    def test_rk4_forcing_uses_higher_order_slope(self):
        """With rigidity forcing on, x_next is rebuilt from x_0_hat — which
        must come from the rk-combined slope, not just v1, or the extra
        evals are dead code and rk4 degenerates to euler."""
        rng = np.random.default_rng(6)
        x1 = jnp.asarray(rng.standard_normal((1, 16, 3)), dtype=jnp.float32)
        finals = {}
        for method in ("euler", "rk4"):
            res = sampler.flow_sampler(
                lambda x, t: -x, x_1=x1, condition=x1,
                point_mask=jnp.ones((1, 16), bool),
                num_steps=4, rigidity_forcing=True, method=method,
            )
            finals[method] = np.asarray(res.x_final)
        assert np.abs(finals["euler"] - finals["rk4"]).max() > 1e-4

    def test_unknown_method_raises(self):
        with np.testing.assert_raises(ValueError):
            sampler.flow_sampler(
                lambda x, t: x, x_1=jnp.zeros((1, 4, 3)),
                condition=jnp.zeros((1, 4, 3)),
                point_mask=jnp.ones((1, 4), bool), method="heun",
            )

    def test_rigidity_forcing_projects_to_rigid(self):
        """With rigidity forcing on an exact field whose x0 is a rigid motion of
        cond, the final x_t equals that rigid motion."""
        rng = np.random.default_rng(1)
        G, N = 2, 32
        cond = jnp.asarray(rng.standard_normal((G, N, 3)), dtype=jnp.float32)
        R = np.stack([_rand_rot(rng) for _ in range(G)])
        t = rng.standard_normal((G, 3)).astype(np.float32)
        x0 = jnp.einsum("gij,gnj->gni", jnp.asarray(R), cond) + jnp.asarray(t)[:, None]
        x1 = jnp.asarray(rng.standard_normal((G, N, 3)), dtype=jnp.float32)
        mask = jnp.ones((G, N), bool)

        res = sampler.flow_sampler(
            lambda x, tt: x1 - x0,
            x_1=x1,
            condition=cond,
            point_mask=mask,
            num_steps=8,
            rigidity_forcing=True,
        )
        np.testing.assert_allclose(np.asarray(res.x_final), np.asarray(x0), atol=1e-3)

    def test_sampler_jits_and_scans(self):
        G, N = 1, 8
        x1 = jnp.ones((G, N, 3))
        calls = []

        @jax.jit
        def run(x1):
            def vf(x, t):
                calls.append(1)  # traced once only
                return -x

            return sampler.flow_sampler(
                vf, x1, x1, jnp.ones((G, N), bool), num_steps=5,
                return_trajectory=False,
            ).x_final

        out = run(x1)
        assert out.shape == (G, N, 3)
        assert len(calls) == 1  # scan traces the body once

    def test_linearity(self):
        traj = jnp.stack([jnp.full((1, 4, 3), float(i)) for i in range(5)])
        lin = sampler.compute_linearity(traj, jnp.ones((1, 4), bool))
        np.testing.assert_allclose(np.asarray(lin), 1.0, atol=1e-6)


class TestSegments:
    def test_masked_mean(self):
        x = jnp.asarray([[[1.0, 2.0], [3.0, 4.0], [100.0, 100.0]]])
        mask = jnp.asarray([[True, True, False]])
        m = segments.masked_mean(x, mask)
        np.testing.assert_allclose(np.asarray(m), [[2.0, 3.0]], atol=1e-6)

    def test_per_sample_sum(self):
        x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        sop = jnp.asarray([0, 0, 1, 1], jnp.int32)
        s = segments.per_sample_sum(x, sop, 3)
        np.testing.assert_allclose(np.asarray(s), [3.0, 7.0, 0.0], atol=1e-6)
