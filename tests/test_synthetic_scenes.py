"""Procedural scene generator: geometry, overlap guarantees, dataset layout."""

import numpy as np

from rap_tpu.data import DatasetConfig, PointCloudDataset
from rap_tpu.data.synthetic_scenes import (
    generate_dataset,
    make_scene,
    split_into_views,
)


class TestSceneGeneration:
    def test_scene_structure(self):
        rng = np.random.default_rng(0)
        s = make_scene(rng, extent=6.0, points=4000)
        assert s.shape[1] == 3 and len(s) > 3000
        # floor: a large fraction of points near z=0
        assert np.mean(np.abs(s[:, 2]) < 0.05) > 0.2
        assert np.abs(s[:, :2]).max() <= 6.0 + 1e-6

    def test_views_overlap_and_budget(self):
        rng = np.random.default_rng(1)
        s = make_scene(rng, points=6000)
        views = split_into_views(s, rng, n_views=3, max_points_per_view=700)
        assert views is not None and len(views) == 3
        for v in views:
            assert len(v) <= 700
        # consecutive views share geometry: nearest-neighbor distances between
        # them are small for many points (same world frame)
        from scipy.spatial import cKDTree

        for a, b in zip(views[:-1], views[1:]):
            d, _ = cKDTree(b).query(a)
            assert np.mean(d < 0.1) > 0.05

    def test_dataset_roundtrip_through_real_loader(self, tmp_path):
        names = generate_dataset(
            tmp_path, n_scenes=6, max_points_per_view=256, seed=2
        )
        assert len(names) >= 5
        ds = PointCloudDataset(DatasetConfig(
            data_path=str(tmp_path), dataset_name="synth", split="train",
            load_features=False,
        ))
        assert len(ds) >= 4
        smp = ds.get(0)
        assert smp.num_parts == 2
        # augmentation invariant holds on generated data
        for p in range(smp.num_parts):
            rec = smp.points[p] @ smp.rotations[p].T + smp.translations[p]
            np.testing.assert_allclose(rec, smp.points_gt[p], atol=1e-5)


    def test_num_points_sidecars_feed_the_packer(self, tmp_path):
        """Regression: without num_points/<split>.txt the batch planner falls
        back to a 5000-points/part estimate and under-fills every batch ~8x
        (measured: S=2 scenes packed where 16 fit the token budget). The
        generator must write sidecars whose totals match the saved parts, and
        the dataset must surface them to the planner."""
        generate_dataset(tmp_path, n_scenes=8, max_points_per_view=256, seed=3)
        for split in ("train", "val"):
            np_file = tmp_path / "num_points" / f"{split}.txt"
            assert np_file.exists(), f"missing num_points sidecar for {split}"
            ds = PointCloudDataset(DatasetConfig(
                data_path=str(tmp_path), dataset_name="synth", split=split,
                load_features=False,
            ))
            assert len(ds.precomputed_num_points) == len(ds)
            for i in range(len(ds)):
                smp = ds.get(i)
                actual = sum(len(p) for p in smp.points)
                assert ds.precomputed_num_points[i] == actual, (
                    f"{split}[{i}]: sidecar {ds.precomputed_num_points[i]} "
                    f"!= actual {actual}"
                )


class TestGeometricFeatures:
    def test_rotation_invariance(self):
        """Features must be invariant to rigid rotation — the per-part SO(3)
        augmentation must not change the descriptor of a point."""
        from scipy.spatial.transform import Rotation

        from rap_tpu.data.synthetic_scenes import compute_geometric_features

        rng = np.random.default_rng(0)
        pts = rng.standard_normal((300, 3)).astype(np.float64)
        R = Rotation.from_euler("zyx", [33, -20, 75], degrees=True).as_matrix()
        f0 = compute_geometric_features(pts)
        f1 = compute_geometric_features(pts @ R.T)
        np.testing.assert_allclose(f0, f1, atol=1e-4)
        assert f0.shape == (300, 32)
        assert np.abs(f0[:, :8]).sum() > 0 and np.all(f0[:, 8:] == 0)

    def test_distinguishes_shapes(self):
        """Plane points and sphere points get different descriptors."""
        from rap_tpu.data.synthetic_scenes import (
            _sample_sphere, compute_geometric_features,
        )

        rng = np.random.default_rng(1)
        plane = np.stack([
            rng.uniform(0, 2, 400), rng.uniform(0, 2, 400), np.zeros(400)
        ], axis=1)
        sphere = _sample_sphere(rng, (0, 0, 0), 1.0, 400)
        fp = compute_geometric_features(plane).mean(0)
        fs = compute_geometric_features(sphere).mean(0)
        # a k=16 patch of a unit sphere is still locally curved: curvature
        # separates the two shapes (planarity alone does not at this k)
        assert fs[3] > 2 * fp[3]
