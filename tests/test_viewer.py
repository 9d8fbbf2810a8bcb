"""Offline viewer tests: renders evaluator- and demo-produced result dirs."""

import numpy as np
import jax

from rap_tpu.apps import viewer as V
from rap_tpu.core.batch import make_regular_synthetic_batch
from rap_tpu.core.procrustes import fit_transformations
from rap_tpu.eval import Evaluator, EvalConfig
from rap_tpu.utils import ply as plyio


def _make_eval_results(tmp_path):
    """Produce a results dir through the real evaluator (apps/sample path)."""
    b = make_regular_synthetic_batch(
        jax.random.key(0), [[48, 40]], N=48, P=2, S=1, feat_dim=4
    )
    ev = Evaluator(EvalConfig(
        save_results=True, save_pointcloud_parts=True,
        output_dir=str(tmp_path / "res"),
    ))
    R, t = fit_transformations(b.points, b.points_gt, b.point_mask)
    md = ev.compute_metrics(b, b.points_gt, R, t)
    ev.save_sample_results(
        b, np.asarray(b.points_gt), np.asarray(R), np.asarray(t),
        {k: np.asarray(v) for k, v in md.items()},
        sample_names=["pair_000"], dataset_name="demo",
    )
    return tmp_path / "res"


class TestResultsBrowser:
    def test_renders_evaluator_results(self, tmp_path):
        res = _make_eval_results(tmp_path)
        written = V.browse_results(res, tmp_path / "viz")
        assert len(written) >= 2
        for p in written:
            assert p.exists() and p.stat().st_size > 1000

    def test_apply_poses_roundtrip(self, tmp_path):
        res = _make_eval_results(tmp_path)
        [sd] = V.discover_result_samples(res)
        rs = V.load_result_sample(sd)
        assert rs.transforms is not None and len(rs.transforms) == 2
        moved = V.apply_estimated_poses(
            rs.parts, rs.part_indices, rs.transforms
        )
        assert moved[0].shape == rs.parts[0].shape

    def test_orbit_gif_and_compare_panel(self, tmp_path):
        """--orbit writes an azimuth-sweep GIF; --compare a side-by-side
        input|result panel (headless equivalents of the reference viewer's
        camera orbit and before/after toggle)."""
        res = _make_eval_results(tmp_path)
        rng = np.random.default_rng(3)
        inp = tmp_path / "inputs"
        inp.mkdir()
        for i in range(2):
            plyio.write_ply(inp / f"part_{i}.ply",
                            rng.standard_normal((40, 3)).astype(np.float32))
        written = V.browse_results(
            res, tmp_path / "viz", input_dir=inp,
            renderer="raster", orbit=4, compare=True,
        )
        names = {p.name for p in written}
        assert any(n.endswith("_orbit.gif") for n in names)
        assert any(n.endswith("_compare.png") for n in names)
        gif = next(p for p in written if p.name.endswith("_orbit.gif"))
        assert gif.stat().st_size > 500
        panel = next(p for p in written if p.name.endswith("_compare.png"))
        from PIL import Image

        w, h = Image.open(panel).size
        assert w == 2 * h  # two square views side by side

    def test_renders_demo_output_layout(self, tmp_path):
        rng = np.random.default_rng(0)
        (tmp_path / "registered").mkdir()
        for i in range(2):
            plyio.write_ply(
                tmp_path / "registered" / f"p{i}.ply",
                rng.standard_normal((60, 3)).astype(np.float32),
            )
            np.savetxt(tmp_path / f"part{i}_transform.txt", np.eye(4))
        written = V.browse_results(tmp_path, tmp_path / "viz", apply_poses=True)
        assert len(written) == 2


class TestSampleBrowser:
    def test_renders_parts_and_pca(self, tmp_path):
        rng = np.random.default_rng(1)
        for s in range(2):
            d = tmp_path / f"sample_{s:03d}"
            d.mkdir()
            for i in range(2):
                pts = rng.standard_normal((50, 3)).astype(np.float32)
                plyio.write_ply(d / f"part_{i}.ply", pts)
                np.save(d / f"features_part_{i}.npy",
                        rng.standard_normal((50, 8)).astype(np.float32))
        written = V.browse_samples(tmp_path, tmp_path / "viz")
        names = {p.name for p in written}
        assert "sample_000_parts.png" in names
        assert "sample_000_pca.png" in names
        assert len(written) == 4

    def test_cli(self, tmp_path):
        rng = np.random.default_rng(2)
        d = tmp_path / "data" / "s0"
        d.mkdir(parents=True)
        plyio.write_ply(d / "a.ply", rng.standard_normal((30, 3)).astype(np.float32))
        rc = V.main([
            "samples", "--data-dir", str(tmp_path / "data"),
            "-o", str(tmp_path / "viz"), "--no-pca",
        ])
        assert rc == 0
        assert (tmp_path / "viz" / "s0_parts.png").exists()


def test_apply_poses_refuses_registered_and_uses_input_dir(tmp_path, caplog):
    """Registered result clouds are never double-transformed; with an
    --input-dir the estimated poses apply to the input clouds by index."""
    import logging

    import numpy as np

    from rap_tpu.apps.viewer import load_result_sample, render_result_sample
    from rap_tpu.utils import ply as plyio

    rng = np.random.default_rng(0)
    sd = tmp_path / "sample"
    gen = sd / "generation_0"
    gen.mkdir(parents=True)
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    plyio.write_ply(gen / "part00_pred.ply", pts)
    plyio.write_ply(gen / "part01_pred.ply", pts + 5.0)
    T = np.eye(4); T[:3, 3] = [1, 2, 3]
    np.savetxt(gen / "part00_pose.txt", T)
    np.savetxt(gen / "part01_pose.txt", np.eye(4))
    rs = load_result_sample(sd)
    assert rs.registered and rs.part_indices == [0, 1]

    out = tmp_path / "viz"; out.mkdir()
    with caplog.at_level(logging.WARNING):
        render_result_sample(rs, out, apply_poses=True)
    assert any("already registered" in r.message for r in caplog.records)

    # input clouds provided: poses applied by part index
    inputs = [pts.copy(), pts.copy()]
    w = render_result_sample(
        rs, out, apply_poses=True, input_parts=inputs, input_indices=[0, 1]
    )
    assert w
