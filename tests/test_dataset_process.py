"""Offline pipeline tests: geometry, submaps, splits, the full
sequence -> samples -> features -> HDF5 -> runtime-dataset chain."""

import numpy as np
from scipy.spatial.transform import Rotation

from rap_tpu.dataset_process import geometry as G
from rap_tpu.dataset_process import submaps, splits
from rap_tpu.dataset_process.extract_features import (
    SampleProcessor,
    SampleProcessorConfig,
    process_dataset_folder,
)
from rap_tpu.dataset_process.process import (
    SequenceProcessingConfig,
    array_sequence_loader,
    process_sequence,
)


class TestGeometry:
    def test_transform_points_roundtrip(self):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((50, 3))
        T = np.eye(4)
        T[:3, :3] = Rotation.random(random_state=rng).as_matrix()
        T[:3, 3] = [1, 2, 3]
        back = G.transform_points(G.transform_points(pts, T), np.linalg.inv(T))
        np.testing.assert_allclose(back, pts, atol=1e-10)

    def test_keyframe_filtering(self):
        poses = []
        for i in range(10):
            T = np.eye(4)
            T[0, 3] = i * 0.05  # 5 cm steps
            poses.append(T)
        keep = G.filter_keyframes(poses, min_translation=0.099)
        assert keep == [0, 2, 4, 6, 8]

    def test_voxel_iou(self):
        rng = np.random.default_rng(0)
        a = rng.uniform(0, 10, (2000, 3))
        assert G.voxel_iou_overlap(a, a, voxel_size=1.0) == 1.0
        b = a + 100.0
        assert G.voxel_iou_overlap(a, b, voxel_size=1.0) == 0.0

    def test_truncated_gaussian_bounds(self):
        rng = np.random.default_rng(0)
        vals = [G.sample_truncated_gaussian(3, 10, 4.4, 2.45, rng) for _ in range(200)]
        assert min(vals) >= 3 and max(vals) <= 10

    def test_deskew_identity_pose(self):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((100, 3))
        ts = rng.uniform(0, 1, 100)
        out = G.deskew(pts, ts, np.eye(4))
        np.testing.assert_allclose(out, pts, atol=1e-6)

    def test_deskew_translation_lerp(self):
        pts = np.zeros((3, 3))
        ts = np.array([0.0, 0.5, 1.0])
        T = np.eye(4)
        T[:3, 3] = [1.0, 0, 0]
        out = G.deskew(pts, ts, T)
        # normalized ts - 0.5 -> [-0.5, 0, 0.5] * t
        np.testing.assert_allclose(out[:, 0], [-0.5, 0.0, 0.5], atol=1e-6)


class TestSubmaps:
    def _frames(self, rng, n=20):
        pts, poses = [], []
        for i in range(n):
            T = np.eye(4)
            T[0, 3] = i * 0.5
            poses.append(T)
            pts.append(rng.uniform(-1, 1, (200, 3)))
        return pts, poses

    def test_boundaries_cover_sequence(self):
        rng = np.random.default_rng(0)
        ids = list(range(37))
        bounds = submaps.generate_submap_boundaries(ids, 3, 8, rng)
        # contiguous, non-overlapping, covering
        assert bounds[0][0] == 0 and bounds[-1][1] == 36
        for (s1, e1), (s2, e2) in zip(bounds, bounds[1:]):
            assert s2 == e1 + 1
            assert 1 <= e1 - s1 + 1 <= 8

    def test_selection_finds_connected(self):
        rng = np.random.default_rng(1)
        pts, poses = self._frames(rng)
        ids = list(range(20))
        bounds = submaps.generate_submap_boundaries(ids, 2, 4, rng)
        sub_pts = []
        for s, e in bounds:
            p, _ = submaps.create_submap(pts, poses, s, e - s + 1)
            sub_pts.append(p)
        cfg = submaps.SelectionConfig(
            min_spatial=0.0, max_spatial=100.0, min_overlap=0.0,
            max_overlap=1.0, overlap_voxel_size=2.0,
        )
        sel = submaps.select_connected_submaps(bounds, sub_pts, 3, cfg, rng)
        assert sel is not None and len(sel) >= 2
        assert submaps.validate_no_frame_overlap(bounds, sel, ids)

    def test_selection_fails_gracefully(self):
        rng = np.random.default_rng(2)
        bounds = [(0, 1), (2, 3)]
        sub_pts = [np.zeros((10, 3)), np.zeros((10, 3)) + 1000.0]
        cfg = submaps.SelectionConfig(
            min_spatial=0.0, max_spatial=1.0, max_attempts=3
        )
        sel = submaps.select_connected_submaps(bounds, sub_pts, 2, cfg, rng)
        assert sel is None


class TestSplits:
    def test_sequences_kept_together(self):
        names = [f"seq{i}/s{j}" for i in range(5) for j in range(4)]
        train, val = splits.make_splits(names, 0.2, np.random.default_rng(0))
        assert sorted(train + val) == sorted(names)
        train_seqs = {n.split("/")[0] for n in train}
        val_seqs = {n.split("/")[0] for n in val}
        assert not (train_seqs & val_seqs)

    def test_loop_closure_guarantee(self):
        """If every loop-closing sequence falls in val, one is moved back."""
        names = [f"seq{i}/s{j}" for i in range(5) for j in range(4)]
        lc = {"seq2"}
        # find a seed where seq2 lands in val without the guarantee
        seed = next(
            s for s in range(50)
            if any(n.startswith("seq2/") for n in splits.make_splits(
                names, 0.2, np.random.default_rng(s))[1])
        )
        train, val = splits.make_splits(
            names, 0.2, np.random.default_rng(seed),
            loop_closure_sequences=lc, guarantee_loop_closure=True,
        )
        train_seqs = {n.split("/")[0] for n in train}
        assert "seq2" in train_seqs
        assert sorted(train + val) == sorted(names)

    def test_manual_val_sequences(self):
        names = [f"seq{i}/s{j}" for i in range(4) for j in range(3)]
        train, val = splits.make_splits(
            names, 0.5, np.random.default_rng(0),
            val_sequences=["seq1", "seq3", "nonexistent"],
        )
        assert {n.split("/")[0] for n in val} == {"seq1", "seq3"}
        assert {n.split("/")[0] for n in train} == {"seq0", "seq2"}

    def test_split_files(self, tmp_path):
        splits.write_split_files(tmp_path, ["a/1", "b/2"], ["c/3"])
        assert (tmp_path / "data_split" / "train.txt").read_text() == "a/1\nb/2\n"
        splits.write_num_points_files(tmp_path, "train", [100, 200])
        assert (tmp_path / "num_points" / "train.txt").read_text() == "100\n200\n"


class TestEndToEnd:
    def test_sequence_to_runtime_dataset(self, tmp_path):
        """sequence frames -> submap samples -> FPS+features -> HDF5 ->
        runtime PointCloudDataset round trip."""
        rng = np.random.default_rng(0)
        # a wandering trajectory over a fixed scene => overlapping submaps
        scene = rng.uniform(-5, 5, (3000, 3))
        pts, poses = [], []
        for i in range(16):
            T = np.eye(4)
            T[:3, 3] = [i * 0.3, 0, 0]
            poses.append(np.linalg.inv(T))
            # frame observes scene points near the sensor
            sel = np.abs(scene[:, 0] - i * 0.3) < 2.0
            pts.append(G.transform_points(scene[sel], T))
        raw = tmp_path / "raw"
        names = process_sequence(
            array_sequence_loader(pts, poses), "toyseq", raw,
            SequenceProcessingConfig(
                min_frames_per_submap=2, max_frames_per_submap=4,
                submaps_per_sample=2, samples_per_sequence=3,
                voxel_size=0.2,
                selection=submaps.SelectionConfig(
                    min_spatial=0.0, max_spatial=100.0,
                    min_overlap=0.0, max_overlap=1.0,
                ),
            ),
        )
        assert names, "no samples generated"
        proc = tmp_path / "processed"
        h5 = tmp_path / "toy.hdf5"
        meta = process_dataset_folder(
            raw, proc,
            SampleProcessorConfig(
                allocation="point_count", num_points=256,
                min_points_per_part=32, outlier_removal=False,
            ),
            feature_extractor=lambda cloud, kp, r: np.zeros(
                (len(kp), 32), np.float32
            ),
            val_fraction=0.5,
            to_hdf5=h5,
            dataset_name="toy",
        )
        assert meta["num_samples"] == len(names)
        assert (proc / "metadata.json").exists()

        # runtime dataset reads BOTH the folder and the HDF5 forms
        from rap_tpu.data import DatasetConfig, PointCloudDataset

        for path in [str(proc), str(h5)]:
            for split in ["train", "val"]:
                ds = PointCloudDataset(
                    DatasetConfig(
                        data_path=path, dataset_name="toy", split=split,
                        min_parts=2,
                    )
                )
                if len(ds) == 0:
                    continue
                s = ds.get(0)
                assert s.num_parts >= 2
                rec = s.points[0] @ s.rotations[0].T + s.translations[0]
                np.testing.assert_allclose(rec, s.points_gt[0], atol=1e-5)
                ds.close()


class TestSampleProcessor:
    def test_allocation_and_fps(self):
        rng = np.random.default_rng(0)
        parts = [rng.uniform(0, 1, (2000, 3)), rng.uniform(0, 1, (500, 3))]
        proc = SampleProcessor(
            SampleProcessorConfig(
                allocation="point_count", num_points=300,
                min_points_per_part=50, outlier_removal=False,
            )
        )
        kpts, feats = proc.process_sample(parts, rng)
        assert feats is None
        assert sum(len(k) for k in kpts) == 300
        assert all(len(k) >= 50 for k in kpts)

    def test_feature_extractor_failure_degrades(self):
        rng = np.random.default_rng(0)
        parts = [rng.uniform(0, 1, (300, 3))]

        def bad_fx(cloud, kp, r):
            raise RuntimeError("boom")

        proc = SampleProcessor(
            SampleProcessorConfig(
                allocation="point_count", num_points=64,
                min_points_per_part=10, outlier_removal=False,
            ),
            feature_extractor=bad_fx,
        )
        kpts, feats = proc.process_sample(parts, rng)
        assert feats[0].shape == (64, 32)
        np.testing.assert_allclose(feats[0], 0.0)
