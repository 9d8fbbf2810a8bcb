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
