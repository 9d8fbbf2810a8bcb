"""Data pipeline tests: augmentation contract, storage formats, packing."""

import numpy as np

from rap_tpu.core.batch import validate
from rap_tpu.data import (
    BatchLoader,
    DatasetConfig,
    LoaderConfig,
    PointCloudDataset,
    pack_samples,
)
from rap_tpu.data.dataset import augment_sample
from rap_tpu.data.packer import collate_to_part_batch, plan_batches
from rap_tpu.utils import ply as plyio


def _make_sample(rng, n_parts=3, train=True, **kw):
    parts = [
        rng.standard_normal((int(rng.integers(50, 200)), 3)) * 2.0
        for _ in range(n_parts)
    ]
    feats = [rng.standard_normal((len(p), 8)).astype(np.float32) for p in parts]
    return augment_sample(
        "frag", "ds", 0, parts, feats, rng, train=train, feat_dim=8, **kw
    )


class TestAugmentation:
    def test_inverse_transform_invariant(self):
        """points @ R^T + t == points_gt (the reference's own sanity check,
        dataset.py:908-933) — for train and eval modes."""
        rng = np.random.default_rng(0)
        for train in [True, False]:
            s = _make_sample(rng, train=train)
            for p in range(s.num_parts):
                rec = s.points[p] @ s.rotations[p].T + s.translations[p]
                np.testing.assert_allclose(rec, s.points_gt[p], atol=1e-5)

    def test_anchor_is_largest_part_with_identity(self):
        rng = np.random.default_rng(1)
        s = _make_sample(rng)
        counts = [len(p) for p in s.points]
        assert s.anchor_idx == int(np.argmax(counts))
        np.testing.assert_allclose(s.rotations[s.anchor_idx], np.eye(3), atol=1e-7)

    def test_scale_normalizes_primary_extent(self):
        """After scaling, the primary part extent is ~1/1.5."""
        rng = np.random.default_rng(2)
        s = _make_sample(rng, train=False)
        prim_gt = s.points_gt[s.anchor_idx]
        # un-center: in eval mode rot_global=I; extent of centered primary
        centered = prim_gt - prim_gt.mean(0)
        assert abs(np.abs(centered).max() - 1 / 1.5) < 0.05

    def test_eval_mode_is_deterministic_identity_rotations(self):
        rng = np.random.default_rng(3)
        s = _make_sample(rng, train=False)
        for p in range(s.num_parts):
            np.testing.assert_allclose(s.rotations[p], np.eye(3), atol=1e-7)
        np.testing.assert_allclose(s.global_rotation, np.eye(3), atol=1e-7)

    def test_yaw_augmentation_limits_tilt(self):
        rng = np.random.default_rng(4)
        s = _make_sample(rng, train=True, yaw_augmentation=True, roll_pitch_range=0.0)
        # pure yaw: global rotation keeps z axis fixed
        Rg = s.global_rotation
        np.testing.assert_allclose(Rg[2, 2], 1.0, atol=1e-6)

    def test_yaw_augmentation_applies_per_part(self):
        """Per-part rotations follow the yaw regime too (ref dataset.py:808-809
        uses rotate_pcd_yaw for each part when yaw_augmentation is set)."""
        rng = np.random.default_rng(5)
        for _ in range(5):
            s = _make_sample(
                rng, train=True, yaw_augmentation=True, roll_pitch_range=0.0
            )
            for p in range(s.num_parts):
                # pure-yaw rotation matrices fix e_z exactly
                np.testing.assert_allclose(s.rotations[p][2, 2], 1.0, atol=1e-6)

    def test_normals_ride_the_augmentation(self):
        """Normals rotate with their parts (ref dataset.py:770-809): the pose
        invariant normals @ R^T == normals_gt holds, norms are preserved, and
        the shuffle keeps point/normal pairing."""
        rng = np.random.default_rng(7)
        parts = [rng.standard_normal((80 + 10 * i, 3)) * 2.0 for i in range(3)]
        normals = []
        for p in parts:
            n = rng.standard_normal(p.shape)
            normals.append(n / np.linalg.norm(n, axis=1, keepdims=True))
        s = augment_sample(
            "frag", "ds", 0, parts, None, rng, train=True, normals=normals,
            feat_dim=8,
        )
        assert s.normals is not None and s.normals_gt is not None
        for p in range(s.num_parts):
            rec = s.normals[p] @ s.rotations[p].T
            np.testing.assert_allclose(rec, s.normals_gt[p], atol=1e-5)
            np.testing.assert_allclose(
                np.linalg.norm(s.normals[p], axis=1), 1.0, atol=1e-5
            )

    def test_no_normals_gives_none(self):
        rng = np.random.default_rng(8)
        s = _make_sample(rng)
        assert s.normals is None and s.normals_gt is None

    def test_full_so3_per_part_without_yaw_flag(self):
        """Without yaw_augmentation, per-part rotations cover full SO(3)
        (ref transform.py rotate_pcd): at least one draw must tilt z."""
        rng = np.random.default_rng(6)
        tilts = []
        for _ in range(8):
            s = _make_sample(rng, train=True)
            for p in range(s.num_parts):
                if p != s.anchor_idx:
                    tilts.append(abs(s.rotations[p][2, 2] - 1.0))
        assert max(tilts) > 0.1

    def test_rotation_decomposition_modes(self):
        """augment_eval decomposition (run-8 inversion diagnostic): the
        rotate_global / rotate_parts switches isolate one mechanism each,
        keep the RNG stream aligned across modes, and preserve the pose
        invariant in every mode."""
        def make(seed, **kw):
            return _make_sample(np.random.default_rng(seed), train=True, **kw)

        full = make(11)
        glob_only = make(11, rotate_parts=False)
        parts_only = make(11, rotate_global=False)
        # global_only: every part keeps its GT orientation
        for p in range(glob_only.num_parts):
            np.testing.assert_allclose(glob_only.rotations[p], np.eye(3),
                                       atol=1e-7)
        # parts_only: the scene frame stays canonical
        np.testing.assert_allclose(parts_only.global_rotation, np.eye(3),
                                   atol=1e-7)
        # RNG alignment: per-part rotation draws are identical when the
        # global draw is consumed-but-ignored (parts_only vs full)
        for p in range(full.num_parts):
            np.testing.assert_allclose(parts_only.rotations[p],
                                       full.rotations[p], atol=1e-7)
        # global_only shares the scene frame (and thus points_gt) with full
        np.testing.assert_allclose(glob_only.global_rotation,
                                   full.global_rotation, atol=1e-7)
        for s in (full, glob_only, parts_only):
            for p in range(s.num_parts):
                rec = s.points[p] @ s.rotations[p].T + s.translations[p]
                np.testing.assert_allclose(rec, s.points_gt[p], atol=1e-5)


def _write_folder_dataset(root, rng, frags=3, parts=2):
    (root / "data_split").mkdir(parents=True)
    names = []
    for i in range(frags):
        frag = f"scene_{i:03d}"
        d = root / frag
        d.mkdir()
        for p in range(parts):
            pts = rng.standard_normal((100 + 10 * p, 3)).astype(np.float32)
            plyio.write_ply(d / f"part_{p}.ply", pts)
            np.save(
                d / f"features_part_{p}.npy",
                rng.standard_normal((len(pts), 32)).astype(np.float32),
            )
        names.append(frag)
    (root / "data_split" / "train.txt").write_text("\n".join(names[:2]) + "\n")
    (root / "data_split" / "val.txt").write_text(names[2] + "\n")
    return names


class TestFolderDataset:
    def test_load_and_split(self, tmp_path):
        rng = np.random.default_rng(0)
        _write_folder_dataset(tmp_path, rng)
        ds = PointCloudDataset(
            DatasetConfig(data_path=str(tmp_path), dataset_name="toy", split="train")
        )
        assert len(ds) == 2
        s = ds.get(0)
        assert s.num_parts == 2
        assert s.features[0].shape[1] == 32
        rec = s.points[1] @ s.rotations[1].T + s.translations[1]
        np.testing.assert_allclose(rec, s.points_gt[1], atol=1e-5)

    def test_random_split_fallback(self, tmp_path):
        rng = np.random.default_rng(1)
        _write_folder_dataset(tmp_path, rng)
        # request random splits (absent) -> falls back to standard
        ds = PointCloudDataset(
            DatasetConfig(
                data_path=str(tmp_path), split="val", use_random_split=True
            )
        )
        assert not ds.effective_random
        assert len(ds) == 1

    def test_part_count_filter(self, tmp_path):
        rng = np.random.default_rng(2)
        _write_folder_dataset(tmp_path, rng, parts=2)
        ds = PointCloudDataset(
            DatasetConfig(data_path=str(tmp_path), split="train", min_parts=3)
        )
        assert len(ds) == 0


class TestNormalsRoundtrip:
    def test_folder_ply_normals_reach_sample(self, tmp_path):
        """save (PLY with normals) -> dataset load -> augmented Sample carries
        rotated normals (ref dataset.py:746-800, io_utils.py:601-919)."""
        rng = np.random.default_rng(9)
        (tmp_path / "data_split").mkdir()
        d = tmp_path / "frag_0"
        d.mkdir()
        raw_normals = []
        for p in range(2):
            pts = rng.standard_normal((60, 3)).astype(np.float32)
            n = rng.standard_normal((60, 3))
            n /= np.linalg.norm(n, axis=1, keepdims=True)
            raw_normals.append(n.astype(np.float32))
            plyio.write_ply(d / f"part_{p}.ply", pts, normals=n)
        (tmp_path / "data_split" / "train.txt").write_text("frag_0\n")
        (tmp_path / "data_split" / "val.txt").write_text("frag_0\n")
        ds = PointCloudDataset(
            DatasetConfig(data_path=str(tmp_path), split="train",
                          load_features=False)
        )
        s = ds.get(0)
        assert s.normals is not None
        for p in range(2):
            rec = s.normals[p] @ s.rotations[p].T
            np.testing.assert_allclose(rec, s.normals_gt[p], atol=1e-5)
            # GT normals are the raw normals under the global rotation only
            # (same row order modulo the shuffle): norms survive exactly
            np.testing.assert_allclose(
                np.sort(np.linalg.norm(s.normals_gt[p], axis=1)),
                np.sort(np.linalg.norm(raw_normals[p], axis=1)),
                atol=1e-5,
            )

    def test_h5_normals_reach_sample(self, tmp_path):
        import h5py

        rng = np.random.default_rng(10)
        path = tmp_path / "toy.hdf5"
        with h5py.File(path, "w") as h5:
            g = h5.create_group("scene_0")
            for p in range(2):
                gp = g.create_group(f"part_{p}")
                gp["vertices"] = rng.standard_normal((50, 3)).astype(np.float32)
                n = rng.standard_normal((50, 3)).astype(np.float32)
                gp["normals"] = n / np.linalg.norm(n, axis=1, keepdims=True)
            sp = h5.create_group("data_split").create_group("toy")
            sp["train"] = np.array([b"scene_0"])
            sp["val"] = np.array([b"scene_0"])
        ds = PointCloudDataset(
            DatasetConfig(data_path=str(path), dataset_name="toy",
                          split="train", load_features=False)
        )
        s = ds.get(0)
        assert s.normals is not None and len(s.normals) == 2
        for p in range(2):
            rec = s.normals[p] @ s.rotations[p].T
            np.testing.assert_allclose(rec, s.normals_gt[p], atol=1e-5)
        ds.close()


class TestH5Dataset:
    def test_h5_roundtrip(self, tmp_path):
        import h5py

        rng = np.random.default_rng(0)
        path = tmp_path / "toy.hdf5"
        with h5py.File(path, "w") as h5:
            for i in range(3):
                g = h5.create_group(f"scene_{i}")
                for p in range(2):
                    gp = g.create_group(f"part_{p}")
                    gp["vertices"] = rng.standard_normal((80, 3)).astype(np.float32)
                    gp["features"] = rng.standard_normal((80, 32)).astype(np.float32)
            sp = h5.create_group("data_split").create_group("toy")
            sp["train"] = np.array([b"scene_0", b"scene_1"])
            sp["val"] = np.array([b"scene_2"])
        ds = PointCloudDataset(
            DatasetConfig(data_path=str(path), dataset_name="toy", split="val")
        )
        assert len(ds) == 1
        s = ds.get(0)
        assert s.num_parts == 2 and s.total_points == 160
        ds.close()


class TestPacker:
    def test_plan_respects_budget_and_coverage(self):
        rng = np.random.default_rng(0)
        parts = [int(rng.integers(2, 6)) for _ in range(30)]
        sizes = [int(rng.integers(100, 2000)) for _ in range(30)]
        plans = plan_batches(parts, sizes, max_points_per_batch=50_000)
        covered = sorted(i for p in plans for i in p.indices)
        assert covered == list(range(30))
        for p in plans:
            assert len(p.indices) >= 1
            assert p.S * p.P * p.N <= 50_000 or len(p.indices) == 1

    def test_over_budget_samples_share_s_slots(self):
        """Samples whose padded footprint exceeds the budget must fill the
        s_multiple slots one batch already pays for, not spawn s_multiple
        singleton batches of the identical compiled shape."""
        plans = plan_batches(
            [33] * 8, [4100] * 8, max_points_per_batch=400_000, s_multiple=8
        )
        assert len(plans) == 1
        assert plans[0].S == 8 and len(plans[0].indices) == 8
        assert plans[0].P == 64 and plans[0].N == 8192

    def test_collate_regular_layout(self):
        rng = np.random.default_rng(1)
        samples = [_make_sample(rng, n_parts=2), _make_sample(rng, n_parts=3)]
        batch, names = collate_to_part_batch(samples, N=256, P=4, S=2)
        validate(batch)
        assert batch.G == 8 and batch.N == 256 and batch.S == 2
        assert names[0] == "frag"
        # inverse-transform invariant survives collation
        from rap_tpu.core.procrustes import transform_points
        import jax.numpy as jnp

        rec = transform_points(batch.rotations_gt, batch.translations_gt, batch.points)
        err = jnp.abs(rec - batch.points_gt) * batch.point_mask[..., None]
        assert float(err.max()) < 1e-4

    def test_pack_samples_end_to_end(self):
        rng = np.random.default_rng(2)
        samples = [_make_sample(rng, n_parts=int(rng.integers(2, 5))) for _ in range(7)]
        batches = pack_samples(samples, max_points_per_batch=20_000)
        total = sum(
            int(np.sum([s.total_points for s in samples]) == 0) for _ in [0]
        )
        got_names = [n for _, names in batches for n in names if not n.startswith("_pad")]
        assert len(got_names) == 7
        for b, _ in batches:
            validate(b)


class TestLoader:
    def test_epoch_iteration(self, tmp_path):
        rng = np.random.default_rng(0)
        _write_folder_dataset(tmp_path, rng, frags=4)
        (tmp_path / "data_split" / "train.txt").write_text(
            "\n".join(f"scene_{i:03d}" for i in range(4)) + "\n"
        )
        ds = PointCloudDataset(
            DatasetConfig(data_path=str(tmp_path), dataset_name="toy", split="train")
        )
        loader = BatchLoader([ds], LoaderConfig(max_points_per_batch=4096, shuffle=True))
        seen = []
        for batch, names, ds_name in loader.epoch(0):
            validate(batch)
            assert ds_name == "toy"
            seen += [n for n in names if not n.startswith("_pad")]
        assert sorted(seen) == sorted(f"scene_{i:03d}" for i in range(4))

    def test_stride_sharding_covers_all(self, tmp_path):
        """Eval mode: whole batches strided across processes, union covers all."""
        rng = np.random.default_rng(1)
        _write_folder_dataset(tmp_path, rng, frags=5)
        (tmp_path / "data_split" / "train.txt").write_text(
            "\n".join(f"scene_{i:03d}" for i in range(5)) + "\n"
        )
        ds = PointCloudDataset(
            DatasetConfig(data_path=str(tmp_path), dataset_name="toy", split="train")
        )
        all_names = set()
        for rank in range(2):
            loader = BatchLoader(
                [ds],
                LoaderConfig(
                    max_points_per_batch=512,
                    process_index=rank,
                    process_count=2,
                    shard_mode="stride",
                ),
            )
            for batch, names, _ in loader.epoch(0):
                all_names.update(n_ for n_ in names if not n_.startswith("_pad"))
        assert all_names == {f"scene_{i:03d}" for i in range(5)}

    def test_slice_sharding_reassembles_global_batch(self, tmp_path):
        """pjit mode: the two processes' local slices concatenate to exactly
        the single-process global batch (same plans, same shapes, global
        sample_of_part indices)."""
        rng = np.random.default_rng(2)
        _write_folder_dataset(tmp_path, rng, frags=4)
        (tmp_path / "data_split" / "train.txt").write_text(
            "\n".join(f"scene_{i:03d}" for i in range(4)) + "\n"
        )

        def make(rank, count):
            ds = PointCloudDataset(
                DatasetConfig(data_path=str(tmp_path), dataset_name="toy", split="train")
            )
            return BatchLoader(
                [ds],
                LoaderConfig(
                    max_points_per_batch=100_000,
                    s_multiple=2,
                    process_index=rank,
                    process_count=count,
                    shard_mode="slice",
                ),
            )

        globals_ = list(make(0, 1).epoch(0))
        shards0 = list(make(0, 2).epoch(0))
        shards1 = list(make(1, 2).epoch(0))
        assert len(globals_) == len(shards0) == len(shards1)
        for (gb, gnames, _), (b0, n0, _), (b1, n1, _) in zip(
            globals_, shards0, shards1
        ):
            assert gnames == n0 + n1
            # NOTE: single-process path tight-rebuckets N from real data; the
            # slice path uses plan.N. Compare on the common N prefix.
            for field in ("points", "point_mask", "part_valid", "sample_of_part",
                          "scale", "sample_valid", "anchor_part"):
                g = np.asarray(getattr(gb, field))
                cat = np.concatenate(
                    [np.asarray(getattr(b0, field)), np.asarray(getattr(b1, field))]
                )
                if g.ndim >= 2 and g.shape[1] != cat.shape[1]:  # N buckets differ
                    n = min(g.shape[1], cat.shape[1])
                    assert np.all(np.asarray(cat)[:, n:] == 0) or field == "point_mask"
                    g, cat = g[:, :n], cat[:, :n]
                np.testing.assert_array_equal(g, cat, err_msg=field)


class TestSliceModeGuards:
    def test_oversized_part_truncates_to_plan(self, tmp_path):
        """Multi-process slice mode cannot rebucket (shapes must agree across
        hosts); a plan-size undershoot truncates the oversized part to the
        planned bucket with a warning instead of crashing the epoch."""
        rng = np.random.default_rng(3)
        # one scene with a big part; no num_points file -> 5000-point default
        # estimate; budget forces a small planned bucket
        d = tmp_path / "scene_000"
        d.mkdir(parents=True)
        plyio.write_ply(d / "part_0.ply", rng.standard_normal((700, 3)).astype(np.float32))
        plyio.write_ply(d / "part_1.ply", rng.standard_normal((100, 3)).astype(np.float32))
        (tmp_path / "data_split").mkdir()
        (tmp_path / "data_split" / "train.txt").write_text("scene_000\n")
        # fake num_points so the estimate (total/parts = 200) undershoots the
        # true 700-point part
        (tmp_path / "num_points").mkdir()
        (tmp_path / "num_points" / "train.txt").write_text("400\n")
        ds = PointCloudDataset(
            DatasetConfig(data_path=str(tmp_path), dataset_name="toy", split="train")
        )
        loader = BatchLoader(
            [ds],
            LoaderConfig(
                max_points_per_batch=4096, s_multiple=2,
                process_index=0, process_count=2, shard_mode="slice",
            ),
        )
        batches = list(loader.epoch(0))
        assert batches, "epoch yielded nothing"
        for batch, names, _ in batches:
            # every part fits the planned bucket; valid points got truncated
            assert batch.points.shape[1] <= 1024
            assert np.asarray(batch.point_mask).sum() > 0
