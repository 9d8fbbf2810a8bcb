"""Per-dataset offline processor tests (synthetic on-disk fixtures)."""

import json
from pathlib import Path

import numpy as np
from scipy.spatial.transform import Rotation

from rap_tpu.dataset_process import datasets as D
from rap_tpu.dataset_process.process import SequenceProcessingConfig
from rap_tpu.utils import ply as plyio


def _rt(deg, axis="z", t=(0, 0, 0)):
    T = np.eye(4)
    T[:3, :3] = Rotation.from_euler(axis, deg, degrees=True).as_matrix()
    T[:3, 3] = t
    return T


def _write_gt_log(path, entries):
    lines = []
    for (i, j, T) in entries:
        lines.append(f"{i}\t{j}\t{len(entries)}")
        for r in range(4):
            lines.append("\t".join(f"{x:.8f}" for x in T[r]))
    Path(path).mkdir(parents=True, exist_ok=True)
    (Path(path) / "gt.log").write_text("\n".join(lines) + "\n")


class TestGtLogGraph:
    def test_load_and_graph(self, tmp_path):
        T01 = _rt(10, t=(1, 0, 0))
        _write_gt_log(tmp_path, [(0, 1, T01)])
        log = D.load_gt_log(tmp_path)
        np.testing.assert_allclose(log["0_1"], T01, atol=1e-6)
        g = D.build_transform_graph(log)
        np.testing.assert_allclose(
            g[("cloud_bin_1", "cloud_bin_0")] @ g[("cloud_bin_0", "cloud_bin_1")],
            np.eye(4), atol=1e-9,
        )

    def test_bfs_path_composition(self, tmp_path):
        T01 = _rt(10, t=(1, 0, 0))
        T12 = _rt(-25, "y", t=(0, 2, 0))
        _write_gt_log(tmp_path, [(0, 1, T01), (1, 2, T12)])
        g = D.build_transform_graph(D.load_gt_log(tmp_path))
        T02 = D.find_transformation_path("cloud_bin_0", "cloud_bin_2", g)
        np.testing.assert_allclose(T02, T01 @ T12, atol=1e-5)
        assert D.find_transformation_path("cloud_bin_0", "cloud_bin_9", g) is None


class TestThreeDMatchTest:
    def test_pairs_to_samples(self, tmp_path):
        rng = np.random.default_rng(0)
        seq = "7-scenes-redkitchen"
        frag_dir = tmp_path / "test" / seq
        frag_dir.mkdir(parents=True)
        base = rng.standard_normal((500, 3)).astype(np.float32)
        # fragment 1 in its own frame; fragment 0 = base expressed elsewhere
        T01 = _rt(20, t=(0.5, 0, 0))     # benchmark transform for pair (0,1)
        frag1 = base
        # processor aligns src via inv(T01); choose frag0 so the result == base
        frag0 = (base @ np.linalg.inv(T01)[:3, :3].T * 0 + base) @ T01[:3, :3].T + T01[:3, 3]
        plyio.write_ply(frag_dir / "cloud_bin_0.ply", frag0.astype(np.float32))
        plyio.write_ply(frag_dir / "cloud_bin_1.ply", frag1)
        _write_gt_log(tmp_path / "test" / "3DMatch" / "gt_result" / seq, [(0, 1, T01)])

        out = tmp_path / "out"
        names = D.process_threedmatch_test(
            tmp_path, seq, out, cfg=D.PairProcessingConfig(voxel_size=0.0)
        )
        assert names == ["sample_000000"]
        p0 = plyio.read_ply(out / names[0] / "part_00.ply")["points"]
        p1 = plyio.read_ply(out / names[0] / "part_01.ply")["points"]
        # 7-scenes sequences get the camera-frame global fix applied to BOTH
        gfix = np.asarray(
            __import__("rap_tpu.dataset_process.geometry", fromlist=["g"]).global_frame_fix(seq)
        )
        np.testing.assert_allclose(p0, (base @ gfix.T), atol=1e-4)
        np.testing.assert_allclose(p1, (base @ gfix.T), atol=1e-4)


class TestKitti:
    def _write_kitti(self, root, n_frames=8):
        rng = np.random.default_rng(1)
        seq = root / "sequences" / "00"
        (seq / "velodyne").mkdir(parents=True)
        (root / "poses").mkdir()
        Tr = _rt(90, "x")  # velo->cam
        (seq / "calib.txt").write_text(
            "Tr: " + " ".join(f"{x:.9f}" for x in Tr[:3].reshape(-1)) + "\n"
        )
        poses = []
        for i in range(n_frames):
            pts = rng.standard_normal((300, 4)).astype(np.float32) * 5
            pts.tofile(seq / "velodyne" / f"{i:06d}.bin")
            # forward motion in the velodyne frame, expressed in cam frame
            P_velo = _rt(0, t=(2.0 * i, 0, 0))
            P_cam = Tr @ P_velo @ np.linalg.inv(Tr)
            poses.append(" ".join(f"{x:.9f}" for x in P_cam[:3].reshape(-1)))
        (root / "poses" / "00.txt").write_text("\n".join(poses) + "\n")

    def test_loader_pose_frame(self, tmp_path):
        self._write_kitti(tmp_path)
        frames = list(D.kitti_frame_loader(tmp_path, "00"))
        assert len(frames) == 8
        # velodyne-frame pose recovered: translation along +x
        np.testing.assert_allclose(frames[3]["pose"][:3, 3], [6, 0, 0], atol=1e-6)
        np.testing.assert_allclose(frames[3]["pose"][:3, :3], np.eye(3), atol=1e-6)

    def test_process_kitti(self, tmp_path):
        self._write_kitti(tmp_path, n_frames=10)
        cfg = SequenceProcessingConfig(
            min_frames_per_submap=2,
            max_frames_per_submap=3,
            submaps_per_sample=2,
            samples_per_sequence=2,
            voxel_size=0.0,
            keyframe_min_translation=0.0,
        )
        names = D.process_kitti(tmp_path, "00", tmp_path / "out", cfg=cfg)
        assert len(names) >= 1
        for n in names:
            plys = sorted((tmp_path / "out" / n).glob("part_*.ply"))
            assert len(plys) >= 1


class TestNSS:
    def _write_nss(self, root):
        rng = np.random.default_rng(2)
        root.mkdir(parents=True, exist_ok=True)
        base = rng.standard_normal((200, 3)).astype(np.float32)
        T = _rt(15, t=(0.3, 0, 0))
        src = (base @ np.linalg.inv(T)[:3, :3].T) - (np.linalg.inv(T)[:3, :3] @ T[:3, 3])
        plyio.write_ply(root / "a.ply", base)  # target
        plyio.write_ply(root / "b.ply", base)  # source placeholder
        pairs = [
            {"source_file": "b.ply", "target_file": "a.ply",
             "transform": [float(x) for x in np.eye(4).reshape(-1)],
             "overlap": 0.5, "building": 1, "source_stage": 0, "target_stage": 0},
            {"source_file": "b.ply", "target_file": "a.ply",
             "transform": [float(x) for x in np.eye(4).reshape(-1)],
             "overlap": 0.05, "building": 1, "source_stage": 0, "target_stage": 1},
            {"source_file": "b.ply", "target_file": "a.ply",
             "transform": [float(x) for x in np.eye(4).reshape(-1)],
             "overlap": 0.4, "building": 2, "source_stage": 0, "target_stage": 1},
        ]
        (root / "pairs_train.json").write_text(json.dumps(pairs))

    def test_overlap_and_stage_filters(self, tmp_path):
        self._write_nss(tmp_path)
        cfg = D.PairProcessingConfig(voxel_size=0.0, min_overlap_ratio=0.1,
                                     max_overlap_ratio=0.8)
        names, stats = D.process_nss(tmp_path, tmp_path / "o1", cfg=cfg)
        assert len(names) == 2  # the 0.05-overlap pair is filtered
        assert stats["same_stage"] == 1 and stats["cross_stage"] == 1

        names, _ = D.process_nss(
            tmp_path, tmp_path / "o2", cfg=cfg, same_stage_only=True
        )
        assert len(names) == 1
        names, _ = D.process_nss(
            tmp_path, tmp_path / "o3", cfg=cfg, filter_by_building=[2]
        )
        assert len(names) == 1


class TestPoseGraphGroups:
    def _graph(self, n=8):
        nodes = [{"id": f"n{i}", "stage": i % 2} for i in range(n)]
        edges = [
            {"source_id": f"n{i}", "target_id": f"n{i+1}", "overlap_ratio": 0.3}
            for i in range(n - 1)
        ]
        return nodes, edges

    def test_groups_are_connected_and_disjoint(self):
        nodes, edges = self._graph()
        groups = D.generate_connected_groups(
            edges, nodes, num_groups=2, min_group_size=2, max_group_size=3, seed=0
        )
        assert 1 <= len(groups) <= 2
        seen = set()
        adj = {i: set() for i in range(len(nodes))}
        for e in edges:
            a, b = int(e["source_id"][1:]), int(e["target_id"][1:])
            adj[a].add(b); adj[b].add(a)
        for g in groups:
            assert 2 <= len(g) <= 3
            assert not (set(g) & seen)
            seen.update(g)
            # connectivity: every node has a neighbor inside the group
            for x in g:
                assert len(g) == 1 or adj[x] & set(g)

    def test_overlap_range_filters_edges(self):
        nodes, edges = self._graph()
        for e in edges:
            e["overlap_ratio"] = 0.9  # all above max
        groups = D.generate_connected_groups(
            edges, nodes, num_groups=2, min_group_size=2, max_group_size=3
        )
        assert groups == []

    def test_same_stage_only(self):
        nodes = [{"id": f"n{i}", "stage": 0 if i < 3 else 1} for i in range(6)]
        edges = [
            {"source_id": f"n{i}", "target_id": f"n{j}", "overlap_ratio": 0.3}
            for i in range(6) for j in range(i + 1, 6)
        ]
        groups = D.generate_connected_groups(
            edges, nodes, num_groups=2, min_group_size=2, max_group_size=3,
            same_stage_only=True, seed=1,
        )
        for g in groups:
            stages = {nodes[i]["stage"] for i in g}
            assert len(stages) == 1

    def test_process_pose_graph_groups(self, tmp_path):
        rng = np.random.default_rng(3)
        nodes = []
        for i in range(4):
            pts = rng.standard_normal((100, 3)).astype(np.float32)
            plyio.write_ply(tmp_path / f"c{i}.ply", pts)
            pose = _rt(5 * i, t=(i, 0, 0))
            nodes.append({
                "id": f"n{i}", "file": f"c{i}.ply",
                "pose": [float(x) for x in pose.reshape(-1)],
            })
        edges = [
            {"source_id": f"n{i}", "target_id": f"n{i+1}", "overlap_ratio": 0.5}
            for i in range(3)
        ]
        (tmp_path / "pose_graph.json").write_text(
            json.dumps({"nodes": nodes, "edges": edges})
        )
        names = D.process_pose_graph_groups(
            tmp_path, tmp_path / "out", num_groups=1,
            min_group_size=3, max_group_size=4, voxel_size=0.0,
        )
        assert len(names) == 1
        plys = sorted((tmp_path / "out" / names[0]).glob("part_*.ply"))
        assert len(plys) >= 3


class TestDryRunPreview:
    def test_dry_run_kitti(self, tmp_path):
        from rap_tpu.dataset_process import preview as PV

        TestKitti()._write_kitti(tmp_path, n_frames=6)
        rep = PV.dry_run(
            tmp_path, tmp_path / "out", ["00", "01"],
            PV.kitti_sequence_info(tmp_path),
            samples_per_sequence=5, max_samples_per_sequence=3,
        )
        assert not rep.ok  # sequence 01 is missing
        s00 = next(s for s in rep.sequences if s.name == "00")
        s01 = next(s for s in rep.sequences if s.name == "01")
        assert s00.ok and s00.frame_count == 6 and s00.planned_samples == 3
        assert not s01.ok and "velodyne" in s01.error
        assert rep.total_samples == 3

    def test_dry_run_bad_root(self, tmp_path):
        from rap_tpu.dataset_process import preview as PV

        rep = PV.dry_run(
            tmp_path / "nope", tmp_path / "out", [],
            lambda s: {"frame_count": 0},
        )
        assert not rep.ok and not rep.data_root_ok

    def test_preview_splits_manual_and_auto(self):
        from rap_tpu.dataset_process import preview as PV

        # sample names follow the '<seq>/<sample>' convention of splits.py
        by_seq = {
            "seqA": [f"seqA/s{i}" for i in range(5)],
            "seqB": [f"seqB/s{i}" for i in range(5)],
            "seqC": [f"seqC/s{i}" for i in range(5)],
        }
        manual = PV.preview_splits(by_seq, val_sequences=["seqB"])
        assert manual["per_sequence"]["seqB"] == ("val", 5)
        assert manual["per_sequence"]["seqA"] == ("train", 5)
        assert len(manual["val"]) == 5

        auto = PV.preview_splits(by_seq, val_fraction=0.34, seed=1)
        assert len(auto["train"]) + len(auto["val"]) == 15
        kinds = {k for k, _ in auto["per_sequence"].values()}
        assert "mixed" not in kinds  # sequences stay together


class TestMoreProcessors:
    def test_mit_tiers_share_pair_contract(self, tmp_path):
        TestNSS()._write_nss(tmp_path)
        (tmp_path / "pairs_benchmark.json").write_text(
            (tmp_path / "pairs_train.json").read_text()
        )
        cfg = D.PairProcessingConfig(voxel_size=0.0, min_overlap_ratio=0.0,
                                     max_overlap_ratio=1.0)
        names, _ = D.process_mit(tmp_path, tmp_path / "mit", cfg=cfg)
        assert len(names) == 3
        names, _ = D.process_tiers(tmp_path, tmp_path / "tiers", cfg=cfg)
        assert len(names) == 3

    def test_folder_frame_loader_formats(self, tmp_path):
        rng = np.random.default_rng(4)
        seq = tmp_path / "seq0"
        (seq / "frames").mkdir(parents=True)
        pts = rng.standard_normal((50, 3)).astype(np.float32)
        plyio.write_ply(seq / "frames" / "000.ply", pts)
        plyio.write_pcd(seq / "frames" / "001.pcd", pts + 1)
        np.save(seq / "frames" / "002.npy", pts + 2)
        np.concatenate([pts + 3, np.zeros((50, 1), np.float32)], 1).tofile(
            seq / "frames" / "003.bin"
        )
        poses = []
        for i in range(4):
            P = _rt(0, t=(float(i), 0, 0))
            poses.append(" ".join(f"{x:.8f}" for x in P.reshape(-1)))
        (seq / "poses.txt").write_text("\n".join(poses) + "\n")
        frames = list(D.folder_frame_loader(tmp_path, "seq0"))
        assert len(frames) == 4
        for i, fr in enumerate(frames):
            np.testing.assert_allclose(fr["pose"][:3, 3], [i, 0, 0])
            np.testing.assert_allclose(fr["points"], pts + i, atol=1e-4)

    def test_process_waymo_smoke(self, tmp_path):
        rng = np.random.default_rng(5)
        seq = tmp_path / "w0"
        (seq / "frames").mkdir(parents=True)
        poses = []
        for i in range(8):
            pts = rng.standard_normal((200, 3)).astype(np.float32) * 5
            plyio.write_ply(seq / "frames" / f"{i:03d}.ply", pts)
            poses.append(" ".join(
                f"{x:.8f}" for x in _rt(0, t=(2.0 * i, 0, 0)).reshape(-1)
            ))
        (seq / "poses.txt").write_text("\n".join(poses) + "\n")
        cfg = SequenceProcessingConfig(
            min_frames_per_submap=2, max_frames_per_submap=3,
            submaps_per_sample=2, samples_per_sequence=2, voxel_size=0.0,
            keyframe_min_translation=0.0,
        )
        names = D.process_waymo(tmp_path, "w0", tmp_path / "out", cfg=cfg)
        assert len(names) >= 1

    def test_process_tls_overlap_groups(self, tmp_path):
        rng = np.random.default_rng(6)
        scans = tmp_path / "ETH"
        scans.mkdir()
        base = rng.uniform(0, 10, (800, 3)).astype(np.float32)
        # three overlapping scans sliding along x, one far-away outlier
        for i in range(3):
            plyio.write_ply(scans / f"scan_{i}.ply", base + [2.0 * i, 0, 0])
        plyio.write_ply(scans / "scan_far.ply", base + [500.0, 0, 0])
        names = D.process_tls(
            tmp_path, "ETH", tmp_path / "out",
            min_submaps_per_sample=2, max_submaps_per_sample=3,
            num_samples=1, overlap_voxel_size=2.0, voxel_size=0.0,
        )
        assert len(names) == 1
        plys = sorted((tmp_path / "out" / names[0]).glob("part_*.ply"))
        assert 2 <= len(plys) <= 3
