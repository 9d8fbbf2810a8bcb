"""Demo pipeline tests: pose-to-metric math with a perfect oracle + CLI smoke."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from rap_tpu.apps.demo import _pose_to_metric, adaptive_parameters
from rap_tpu.data.dataset import augment_sample
from rap_tpu.data.packer import collate_to_part_batch
from rap_tpu.registration import predict_poses
from rap_tpu.utils import ply as plyio


def _two_view_scene(rng, n=300, overlap=150):
    """A metric scene seen from two poses; returns (views, gt_T_rel)."""
    scene = rng.uniform(-2, 2, (n, 3)).astype(np.float64)
    view0 = scene[: overlap + 75]  # first chunk
    world1 = scene[75:]
    R = Rotation.random(random_state=rng).as_matrix()
    t = rng.uniform(-1, 1, 3)
    view1 = (world1 - t) @ R  # view1 in its own frame: world = view1 @ R^T + t
    return [view0, view1], (R, t)


class TestPoseToMetric:
    def test_oracle_generation_recovers_relative_pose(self):
        """If the model generated the GT scene exactly, the demo's metric
        transforms must reproduce the true relative pose between views."""
        rng = np.random.default_rng(0)
        views, (R_gt, t_gt) = _two_view_scene(rng)
        # oracle setup: both views already placed in the world frame, so the
        # demo's metric transforms should come out as identity
        world1 = views[1] @ R_gt.T + t_gt
        smp = augment_sample(
            "scene", "demo", 0,
            parts_gt=[views[0], world1],
            features=None, rng=np.random.default_rng(1), train=False,
        )
        primary = smp.anchor_idx
        kpts = [views[0], world1]
        primary_center = kpts[primary].mean(0)
        scaled = [(k - primary_center) / smp.scale for k in kpts]
        gt_trans = np.concatenate(scaled).mean(0)
        cond_offsets = [
            np.zeros(3) if i == primary else gt_trans + (scaled[i] - gt_trans).mean(0)
            for i in range(2)
        ]
        batch, _ = collate_to_part_batch([smp], N=512, P=2, S=1)
        # oracle: generation == GT scene
        R, t = predict_poses(batch, batch.points_gt)
        R, t = np.asarray(R), np.asarray(t)
        Ts = [
            _pose_to_metric(R[p], t[p], smp.scale, primary_center, gt_trans,
                            cond_offsets[p])
            for p in range(2)
        ]
        # NOTE: the demo condition clouds are augment_sample's centered parts,
        # not the raw views — the pose maps the ORIGINAL (world-placed) parts.
        # For parts_gt given in world coords with train=False, the "original"
        # clouds are exactly parts_gt, so T_p should be ~identity for both.
        for T in Ts:
            np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-4)
            np.testing.assert_allclose(T[:3, 3], 0.0, atol=1e-3)

    def test_oracle_with_unposed_input(self):
        """Unposed view1: T_1 must equal the GT view1->world transform."""
        rng = np.random.default_rng(2)
        views, (R_gt, t_gt) = _two_view_scene(rng)
        # The demo pipeline feeds RAW clouds as parts_gt; augmentation treats
        # them as 'registered', but the *model* learns to move them. Oracle:
        # generation = where the parts SHOULD be = GT world positions in the
        # scaled scene frame. Build that target manually.
        kpts = [views[0].astype(np.float64), views[1].astype(np.float64)]
        smp = augment_sample(
            "scene", "demo", 0, parts_gt=kpts, features=None,
            rng=np.random.default_rng(1), train=False,
        )
        primary = smp.anchor_idx
        primary_center = kpts[primary].mean(0)
        scaled = [(k - primary_center) / smp.scale for k in kpts]
        gt_trans = np.concatenate(scaled).mean(0)
        cond_offsets = [
            np.zeros(3) if i == primary else gt_trans + (scaled[i] - gt_trans).mean(0)
            for i in range(2)
        ]
        batch, _ = collate_to_part_batch([smp], N=512, P=2, S=1)

        # oracle generation: scene-frame coords of the TRUE world positions
        world = [views[0], views[1] @ R_gt.T + t_gt]
        target = np.asarray(batch.points_gt).copy()
        for p in range(2):
            w_scaled = (world[p] - primary_center) / smp.scale - gt_trans
            # match the sample's per-part shuffle: reconstruct via points ordering
            # augment_sample shuffled points; we need the same order. Recover
            # the permutation from points_gt: scaled view in gt frame equals
            # scaled[p]-gt_trans reordered.
            src = scaled[p] - gt_trans
            # points_gt rows are a permutation of src rows
            # match by nearest neighbor (exact)
            from scipy.spatial import cKDTree

            tree = cKDTree(src)
            _, perm = tree.query(np.asarray(smp.points_gt[p]))
            target[p, : len(perm)] = w_scaled[perm]
        R, t = predict_poses(batch, target)
        R, t = np.asarray(R), np.asarray(t)
        Ts = [
            _pose_to_metric(R[p], t[p], smp.scale, primary_center, gt_trans,
                            cond_offsets[p])
            for p in range(2)
        ]
        T0_inv = np.linalg.inv(Ts[0])
        T_rel = T0_inv @ Ts[1]
        # view1 -> view0's (=world) frame must match the GT pose: as a matrix
        # transform x_world = M x_view + t with view1 = (world - t) @ R_gt,
        # M = R_gt (row-vector convention x @ R^{-1} == (R^{-T} x^T)^T).
        np.testing.assert_allclose(T_rel[:3, :3], R_gt, atol=1e-3)
        np.testing.assert_allclose(T_rel[:3, 3], t_gt, atol=1e-2)


class TestAdaptiveParameters:
    def test_scales_with_scene(self):
        rng = np.random.default_rng(0)
        small = [rng.uniform(0, 1, (500, 3)) for _ in range(3)]
        vs_small, des_small, _ = adaptive_parameters(small)
        large = [rng.uniform(0, 200, (500, 3)) for _ in range(3)]
        vs_large, des_large, _ = adaptive_parameters(large)
        assert vs_small < vs_large
        assert des_small == pytest.approx(20 * vs_small)
        assert 1e-4 <= vs_small <= 0.4 and 1e-4 <= vs_large <= 0.4


class TestDemoCLI:
    def test_smoke_run(self, tmp_path):
        """Full CLI run with a tiny random model: must produce registered PLYs
        and 4x4 transform files."""
        rng = np.random.default_rng(0)
        scene = rng.uniform(0, 2, (400, 3)).astype(np.float32)
        in_dir = tmp_path / "views"
        in_dir.mkdir()
        from scipy.spatial.transform import Rotation as Rot

        plyio.write_ply(in_dir / "a.ply", scene[:300])
        Rm = Rot.from_euler("z", 30, degrees=True).as_matrix().astype(np.float32)
        plyio.write_ply(in_dir / "b.ply", scene[100:] @ Rm.T)

        from rap_tpu.apps.demo import main

        rc = main([
            "-i", str(in_dir),
            "-out", str(tmp_path / "out"),
            "--num-steps", "2",
            "--max-points-per-part", "256",
            "-o", "model.num_layers=2",
            "-o", "model.embed_dim=64",
            "-o", "model.num_heads=4",
            "-o", "model.compute_dtype=float32",
        ])
        assert rc == 0
        out = tmp_path / "out"
        assert (out / "registered" / "a.ply").exists()
        assert (out / "registered" / "b.ply").exists()
        T = np.loadtxt(out / "part1_transform.txt")
        assert T.shape == (4, 4)
        np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-9)
        # part 0 is the reference frame: T0 == I
        T0 = np.loadtxt(out / "part0_transform.txt")
        np.testing.assert_allclose(T0, np.eye(4), atol=1e-6)
        reg = plyio.read_ply(out / "registered" / "a.ply")["points"]
        assert reg.shape == (300, 3)

    def test_npz_checkpoint_and_geometric_features(self, tmp_path):
        """--checkpoint model.npz (the compact distribution format) +
        --features geometric (the synthetic-checkpoint conditioning) through
        the full demo CLI — exactly how a user runs a trained-on-synthetic
        model on their own PLYs."""
        import jax

        from rap_tpu.apps.demo import main
        from rap_tpu.models import DiTConfig
        from rap_tpu.models.dit import init_dit_params
        from rap_tpu.train.checkpoint import save_params_npz

        cfg = DiTConfig(num_layers=2, embed_dim=64, num_heads=4,
                        compute_dtype="float32")
        params = init_dit_params(jax.random.key(0), cfg)
        npz = tmp_path / "model.npz"
        save_params_npz(npz, params)

        rng = np.random.default_rng(5)
        scene = rng.uniform(0, 2, (400, 3)).astype(np.float32)
        in_dir = tmp_path / "views"
        in_dir.mkdir()
        plyio.write_ply(in_dir / "a.ply", scene[:300])
        plyio.write_ply(in_dir / "b.ply", scene[100:])
        rc = main([
            "-i", str(in_dir),
            "-out", str(tmp_path / "out"),
            "--num-steps", "2",
            "--max-points-per-part", "256",
            "--checkpoint", str(npz),
            "--features", "geometric",
            "-o", "model.num_layers=2",
            "-o", "model.embed_dim=64",
            "-o", "model.num_heads=4",
            "-o", "model.compute_dtype=float32",
        ])
        assert rc == 0
        assert (tmp_path / "out" / "registered" / "a.ply").exists()

    def test_multi_generation_selection_on_device(self, tmp_path):
        """n_generations>1 exercises the scanned on-device rigidity-RMSE
        selection (no per-generation host round trip)."""
        rng = np.random.default_rng(3)
        scene = rng.uniform(0, 2, (300, 3)).astype(np.float32)
        in_dir = tmp_path / "views"
        in_dir.mkdir()
        plyio.write_ply(in_dir / "a.ply", scene[:220])
        plyio.write_ply(in_dir / "b.ply", scene[80:])

        from rap_tpu.apps.demo import main

        rc = main([
            "-i", str(in_dir),
            "-out", str(tmp_path / "out"),
            "--num-steps", "2",
            "--n-generations", "3",
            "--icp-refine",
            "--max-points-per-part", "192",
            "-o", "model.num_layers=1",
            "-o", "model.embed_dim=64",
            "-o", "model.num_heads=4",
            "-o", "model.compute_dtype=float32",
        ])
        assert rc == 0
        T = np.loadtxt(tmp_path / "out" / "part1_transform.txt")
        assert T.shape == (4, 4) and np.isfinite(T).all()
        # the refined pose is still a proper rigid transform
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)

    def test_output_generated(self, tmp_path):
        rng = np.random.default_rng(1)
        scene = rng.uniform(0, 2, (300, 3)).astype(np.float32)
        in_dir = tmp_path / "views"
        in_dir.mkdir()
        plyio.write_ply(in_dir / "a.ply", scene[:200])
        plyio.write_ply(in_dir / "b.ply", scene[100:])

        from rap_tpu.apps.demo import main

        rc = main([
            "-i", str(in_dir),
            "-out", str(tmp_path / "out"),
            "--num-steps", "1",
            "--max-points-per-part", "128",
            "--output-generated",
            "-o", "model.num_layers=2",
            "-o", "model.embed_dim=64",
            "-o", "model.num_heads=4",
            "-o", "model.compute_dtype=float32",
        ])
        assert rc == 0
        for name in ("a.ply", "b.ply"):
            g = plyio.read_ply(tmp_path / "out" / "generated" / name)["points"]
            assert 0 < len(g) <= 128


class TestWeightResolution:
    def test_local_path_passthrough(self, tmp_path):
        from rap_tpu.train.weights import resolve_checkpoint

        f = tmp_path / "rap_model_12.ckpt"
        f.write_bytes(b"x" * 10)
        assert resolve_checkpoint(str(f)) == f

    def test_cache_hit(self, tmp_path):
        from rap_tpu.train.weights import resolve_checkpoint

        cache = tmp_path / "cache"
        (cache / "sub").mkdir(parents=True)
        (cache / "sub" / "rap_model_10.ckpt").write_bytes(b"y")
        p = resolve_checkpoint(
            "rap_model_10.ckpt", cache_dir=cache, download=False
        )
        assert p.name == "rap_model_10.ckpt"

    def test_zip_source_and_checksum(self, tmp_path):
        import hashlib
        import zipfile

        from rap_tpu.train.weights import resolve_checkpoint

        payload = b"fake-weights"
        zsrc = tmp_path / "weights.zip"
        with zipfile.ZipFile(zsrc, "w") as z:
            z.writestr("rap_model.ckpt", payload)
        cache = tmp_path / "cache"
        p = resolve_checkpoint(
            "rap_model.ckpt",
            cache_dir=cache,
            weights_url=zsrc.as_uri(),   # file:// URL, no network
        )
        assert p.read_bytes() == payload
        # checksum verification
        good = hashlib.sha256(payload).hexdigest()
        assert resolve_checkpoint(
            "rap_model.ckpt", cache_dir=cache, sha256=good
        ).exists()
        import pytest

        with pytest.raises(ValueError, match="checksum"):
            resolve_checkpoint("rap_model.ckpt", cache_dir=cache, sha256="0" * 64)

    def test_missing_raises_with_sources(self, tmp_path):
        import pytest

        from rap_tpu.train.weights import resolve_checkpoint

        with pytest.raises(FileNotFoundError, match="not found"):
            resolve_checkpoint(
                "nope.ckpt", cache_dir=tmp_path, download=False
            )


class TestProfilerFlag:
    def test_profile_dir_writes_trace(self, tmp_path):
        """--profile-dir must produce a jax.profiler trace (VERDICT #10)."""
        import jax

        from rap_tpu.core.batch import make_regular_synthetic_batch

        with jax.profiler.trace(str(tmp_path / "prof")):
            b = make_regular_synthetic_batch(
                jax.random.key(0), [[16, 16]], N=16, P=2, S=1, feat_dim=4
            )
            jax.block_until_ready(jax.numpy.sum(b.points))
        traces = list((tmp_path / "prof").rglob("*.json.gz"))
        assert traces, "no trace files written"
