"""Preprocessing op tests: voxel ops, FPS, kNN, ball query, outliers, allocation."""

import jax
import jax.numpy as jnp
import numpy as np

from rap_tpu.ops import points as P


class TestVoxel:
    def test_coverage_counts_occupied(self):
        pts = np.array([[0.05, 0.05, 0.05], [0.06, 0.04, 0.05], [0.95, 0.05, 0.05]])
        assert P.voxel_coverage(pts, 0.1) == 2
        assert P.voxel_coverage(pts, 10.0) == 1

    def test_downsample_averages(self):
        pts = np.array(
            [[0.0, 0.0, 0.0], [0.04, 0.0, 0.0], [1.0, 0.0, 0.0]], np.float32
        )
        out = P.voxel_downsample(pts, 0.1)
        assert out.shape == (2, 3)
        assert np.any(np.isclose(out[:, 0], 0.02, atol=1e-6))

    def test_downsample_with_attrs(self):
        pts = np.zeros((4, 3), np.float32)
        attrs = np.arange(8, dtype=np.float32).reshape(4, 2)
        out, a = P.voxel_downsample(pts, 1.0, attrs)
        assert out.shape == (1, 3)
        np.testing.assert_allclose(a[0], attrs.mean(0), atol=1e-6)


class TestFPS:
    def test_covers_extremes(self):
        """FPS must pick the far-apart cluster representatives."""
        rng = np.random.default_rng(0)
        clusters = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [0, 0, 10.0]])
        pts = np.concatenate(
            [c + 0.1 * rng.standard_normal((50, 3)) for c in clusters]
        ).astype(np.float32)
        idx = P.farthest_point_sampling(
            jnp.asarray(pts)[None], jnp.ones((1, 200), bool), 4
        )[0]
        chosen = pts[np.asarray(idx)]
        # one point from each cluster
        d = np.linalg.norm(chosen[:, None] - clusters[None], axis=-1)
        assert set(np.argmin(d, axis=1)) == {0, 1, 2, 3}

    def test_masked_points_never_selected(self):
        pts = np.zeros((1, 10, 3), np.float32)
        pts[0, 5:] = 100.0  # far but invalid
        mask = np.zeros((1, 10), bool)
        mask[0, :5] = True
        idx = np.asarray(
            P.farthest_point_sampling(jnp.asarray(pts), jnp.asarray(mask), 3)
        )[0]
        assert (idx < 5).all()

    def test_matches_numpy_fps(self):
        rng = np.random.default_rng(1)
        pts = rng.standard_normal((64, 3)).astype(np.float32)
        start = 7
        idx_np = P.fps_numpy(pts, 8, np.random.default_rng(2))
        # device FPS with same start
        idx_np2 = P.fps_numpy(pts, 8, rng)
        idx_dev = np.asarray(
            P.farthest_point_sampling(
                jnp.asarray(pts)[None],
                jnp.ones((1, 64), bool),
                8,
                start_idx=jnp.asarray([start]),
            )
        )[0]
        # rebuild numpy FPS from the same start
        ref = [start]
        d2 = np.sum((pts - pts[start]) ** 2, 1)
        for _ in range(7):
            nxt = int(np.argmax(d2))
            ref.append(nxt)
            d2 = np.minimum(d2, np.sum((pts - pts[nxt]) ** 2, 1))
        np.testing.assert_array_equal(idx_dev, ref)


class TestKNN:
    def test_knn_exact(self):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((100, 3)).astype(np.float32)
        q = rng.standard_normal((5, 3)).astype(np.float32)
        d2, idx = P.knn(jnp.asarray(q), jnp.asarray(pts), jnp.ones(100, bool), 3)
        full = np.sum((q[:, None] - pts[None]) ** 2, -1)
        ref_idx = np.argsort(full, axis=1)[:, :3]
        np.testing.assert_array_equal(np.sort(np.asarray(idx), 1), np.sort(ref_idx, 1))
        np.testing.assert_allclose(
            np.sort(np.asarray(d2), 1), np.sort(np.take_along_axis(full, ref_idx, 1), 1),
            atol=1e-4,
        )

    def test_ball_query_first_k_within_radius(self):
        pts = np.array(
            [[0.0, 0, 0], [0.1, 0, 0], [0.2, 0, 0], [5, 0, 0], [0.15, 0, 0]],
            np.float32,
        )
        q = np.array([[0.0, 0, 0]], np.float32)
        idx, cnt, within = P.ball_query(
            jnp.asarray(q), jnp.asarray(pts), jnp.ones(5, bool), radius=0.3, k=3
        )
        assert int(cnt[0]) == 3
        # first 3 hits in index order: 0, 1, 2 (not nearest-sorted)
        np.testing.assert_array_equal(np.asarray(idx[0]), [0, 1, 2])
        assert bool(within[0].all())

    def test_ball_query_pads_with_first_hit(self):
        pts = np.array([[0.0, 0, 0], [5, 0, 0]], np.float32)
        q = np.array([[0.01, 0, 0]], np.float32)
        idx, cnt, within = P.ball_query(
            jnp.asarray(q), jnp.asarray(pts), jnp.ones(2, bool), radius=0.5, k=4
        )
        assert int(cnt[0]) == 1
        np.testing.assert_array_equal(np.asarray(idx[0]), [0, 0, 0, 0])
        np.testing.assert_array_equal(np.asarray(within[0]), [True, False, False, False])


class TestOutliers:
    def test_removes_far_point(self):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((200, 3)).astype(np.float32) * 0.1
        pts = np.concatenate([pts, [[50.0, 0, 0]]]).astype(np.float32)
        keep = P.statistical_outlier_removal(pts, nb_neighbors=10, std_ratio=2.0)
        assert 200 not in keep
        assert len(keep) >= 195


class TestAllocation:
    def test_point_count_allocation(self):
        target = P.allocate_by_point_count(
            np.array([1000, 1000, 100]), 600, min_points_per_part=50,
            rng=np.random.default_rng(0),
        )
        assert target.sum() == 600
        assert (target >= 50).all() or (target == np.array([1000, 1000, 100])).any()
        assert target[2] <= 100

    def test_spatial_coverage_allocation(self):
        """A spatially large sparse part outdraws a dense compact one."""
        rng = np.random.default_rng(1)
        big_sparse = rng.uniform(0, 10, (400, 3)).astype(np.float32)
        small_dense = rng.uniform(0, 0.5, (400, 3)).astype(np.float32)
        target = P.allocate_by_spatial_coverage(
            [big_sparse, small_dense], 600, min_points_per_part=50,
            voxel_size=0.5, rng=np.random.default_rng(0),
        )
        assert target.sum() == 600
        assert (target >= 50).all()
        assert (target <= 400).all()
        assert target[0] > target[1]

    def test_spatial_coverage_respects_budget_scaling(self):
        # minimum total exceeds budget -> scaled down, never zero
        rng = np.random.default_rng(2)
        parts = [rng.uniform(0, 1, (100, 3)).astype(np.float32) for _ in range(5)]
        target = P.allocate_by_spatial_coverage(
            parts, 100, min_points_per_part=50, voxel_size=0.2,
            rng=np.random.default_rng(0),
        )
        assert (target >= 1).all()
        assert target.sum() <= 5 * 50

    def test_adaptive_counts_clamped(self):
        rng = np.random.default_rng(0)
        parts = [rng.uniform(0, 1, (500, 3)), rng.uniform(0, 0.01, (30, 3))]
        counts = P.adaptive_sample_counts(
            parts, voxel_size=0.1, voxel_ratio=2.0,
            min_points_per_part=10, max_sample_points=100,
        )
        assert counts[0] == 100  # clamped at max
        assert 10 <= counts[1] <= 30
