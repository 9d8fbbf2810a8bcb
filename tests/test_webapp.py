"""Headless tests for the web-demo pipeline (format conversion, global shift,
GLB assembly, end-to-end run) — no gradio required."""

import zipfile
from pathlib import Path

import numpy as np
import pytest

from rap_tpu.apps import webapp
from rap_tpu.utils import ply as plyio


class TestMeshSampling:
    def test_unit_square_two_triangles(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
        f = np.array([[0, 1, 2], [0, 2, 3]])
        pts, nrm = webapp.sample_mesh_surface(v, f, 5000)
        assert pts.shape == (5000, 3)
        assert np.all(pts[:, 0] >= 0) and np.all(pts[:, 0] <= 1)
        assert np.allclose(pts[:, 2], 0)
        # z-up normals
        assert np.allclose(np.abs(nrm[:, 2]), 1, atol=1e-6)
        # uniform coverage: both halves get ~half the samples
        upper = np.mean(pts[:, 1] > pts[:, 0])
        assert 0.4 < upper < 0.6

    def test_area_weighting(self):
        # one tiny and one huge triangle: samples concentrate on the huge one
        v = np.array(
            [[0, 0, 0], [0.01, 0, 0], [0, 0.01, 0],
             [10, 0, 0], [20, 0, 0], [10, 10, 0]], float
        )
        f = np.array([[0, 1, 2], [3, 4, 5]])
        pts, _ = webapp.sample_mesh_surface(v, f, 2000)
        frac_big = np.mean(pts[:, 0] >= 9.0)
        assert frac_big > 0.99


class TestConversions:
    def test_obj_roundtrip(self, tmp_path):
        obj = tmp_path / "m.obj"
        obj.write_text(
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n"
        )
        out = webapp.convert_to_ply(obj, tmp_path / "m.ply", mesh_sample_points=100)
        pts = plyio.read_ply(out)["points"]
        assert len(pts) == 100

    def test_pts_ascii(self, tmp_path):
        src = tmp_path / "c.pts"
        src.write_text("3\n1 2 3 255\n4 5 6 255\n7 8 9 255\n")
        out = webapp.convert_to_ply(src, tmp_path / "c.ply")
        pts = plyio.read_ply(out)["points"]
        np.testing.assert_allclose(pts, [[1, 2, 3], [4, 5, 6], [7, 8, 9]])

    def test_pcd_to_ply(self, tmp_path):
        pts = np.random.default_rng(0).standard_normal((30, 3)).astype(np.float32)
        plyio.write_pcd(tmp_path / "a.pcd", pts)
        out = webapp.convert_to_ply(tmp_path / "a.pcd", tmp_path / "a.ply")
        np.testing.assert_allclose(plyio.read_ply(out)["points"], pts, atol=1e-6)

    def test_unknown_format_raises(self, tmp_path):
        (tmp_path / "x.step").write_text("nope")
        with pytest.raises(ValueError, match="unsupported"):
            webapp.convert_to_ply(tmp_path / "x.step", tmp_path / "x.ply")


class TestGlobalShift:
    def test_detect_shift_save(self, tmp_path):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((50, 3)).astype(np.float32) + [5000, 100, 0]
        b = rng.standard_normal((50, 3)).astype(np.float32) + [5002, 101, 1]
        plyio.write_ply(tmp_path / "a.ply", a)
        plyio.write_ply(tmp_path / "b.ply", b)
        assert webapp.detect_large_coordinates(tmp_path)
        shift = webapp.calculate_global_shift(tmp_path)
        np.testing.assert_allclose(
            shift, np.minimum(a.min(0), b.min(0)), rtol=1e-6
        )
        n = webapp.apply_global_shift(tmp_path, shift)
        assert n == 2
        a2 = plyio.read_ply(tmp_path / "a.ply")["points"]
        assert not webapp.detect_large_coordinates(tmp_path)
        np.testing.assert_allclose(a2, a - shift.astype(np.float32), atol=1e-3)
        f = webapp.save_global_shift(shift, tmp_path)
        vals = [float(x) for x in f.read_text().splitlines()[-1].split()]
        np.testing.assert_allclose(vals, shift, atol=1e-5)

    def test_small_coords_not_detected(self, tmp_path):
        plyio.write_ply(tmp_path / "a.ply", np.ones((10, 3), np.float32))
        assert not webapp.detect_large_coordinates(tmp_path)


class TestGLB:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((123, 3)).astype(np.float32)
        col = rng.integers(0, 255, (123, 3)).astype(np.uint8)
        p = webapp.write_glb_pointcloud(tmp_path / "x.glb", pts, col)
        data = webapp.read_glb_pointcloud(p)
        np.testing.assert_allclose(data["points"], pts, atol=1e-6)
        np.testing.assert_array_equal(data["colors"], col)

    def test_combine_registered(self, tmp_path):
        rng = np.random.default_rng(1)
        reg = tmp_path / "registered"
        reg.mkdir()
        for i in range(3):
            plyio.write_ply(
                reg / f"part{i}.ply",
                rng.standard_normal((40, 3)).astype(np.float32),
            )
        glb = webapp.combine_registered_to_glb(reg, tmp_path / "out.glb")
        data = webapp.read_glb_pointcloud(glb)
        assert len(data["points"]) == 120
        assert len(np.unique(data["colors"], axis=0)) == 3


@pytest.mark.slow
class TestEndToEnd:
    def test_run_rap_demo_headless(self, tmp_path):
        rng = np.random.default_rng(0)
        base = rng.standard_normal((3000, 3)).astype(np.float32)
        from scipy.spatial.transform import Rotation

        R = Rotation.from_euler("z", 20, degrees=True).as_matrix().astype(np.float32)
        a = base[:2000] + [5000.0, 0.0, 0.0]          # large coords -> shift
        b = base[1000:] @ R.T + [5000.2, 0.0, 0.0]
        plyio.write_ply(tmp_path / "a.ply", a)
        plyio.write_ply(tmp_path / "b.ply", b)
        res = webapp.run_rap_demo(
            [tmp_path / "a.ply", tmp_path / "b.ply"],
            tmp_path / "work",
            num_steps=2,
            max_points_per_part=512,
        )
        assert res["global_shift"] is not None
        assert Path(res["glb"]).exists()
        data = webapp.read_glb_pointcloud(res["glb"])
        assert len(data["points"]) > 0
        with zipfile.ZipFile(res["zip"]) as z:
            names = z.namelist()
        assert any(n.startswith("registered/") for n in names)
        assert "global_shift.txt" in names


class TestLargeCoordinatePrecision:
    def test_conversion_keeps_float64_until_shift(self, tmp_path):
        """UTM-scale coordinates must not quantize before the global shift:
        two points 1 mm apart at x~5e5 m stay 1 mm apart after conversion
        (float32 would snap them ~6 cm)."""
        src = tmp_path / "utm.pts"
        src.write_text("2\n500000.000 4000000.000 10.0\n500000.001 4000000.000 10.0\n")
        data = webapp.convert_to_points(src)
        assert data["points"].dtype == np.float64
        d = data["points"][1, 0] - data["points"][0, 0]
        np.testing.assert_allclose(d, 0.001, rtol=1e-6)
        # after shifting by the min corner, float32 storage preserves the mm
        shifted = (data["points"] - data["points"].min(0)).astype(np.float32)
        np.testing.assert_allclose(shifted[1, 0] - shifted[0, 0], 0.001, rtol=1e-4)


def test_las_conversion_native(tmp_path):
    """Uncompressed .las converts without laspy (native reader)."""
    import numpy as np

    from rap_tpu.apps.webapp import convert_to_points
    from rap_tpu.utils import ply as plyio

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((200, 3)) * 10
    src = tmp_path / "cloud.las"
    plyio.write_las(src, pts)
    data = convert_to_points(src)
    np.testing.assert_allclose(data["points"], pts, atol=2e-3)


def test_auto_checkpoint_warns_visibly_when_unresolved(tmp_path, monkeypatch):
    """checkpoint='auto' with no resolvable weights must register with a
    VISIBLE warning in the returned log (not only a server-side logger)."""
    import numpy as np

    from rap_tpu.apps.webapp import run_rap_demo
    from rap_tpu.utils import ply as plyio

    monkeypatch.setenv("HF_HUB_OFFLINE", "1")   # fail fast, no retries
    monkeypatch.setenv("RAP_TPU_CACHE", str(tmp_path / "cache"))
    rng = np.random.default_rng(0)
    base = rng.standard_normal((2000, 3)).astype(np.float64)
    a = tmp_path / "a.ply"
    b = tmp_path / "b.ply"
    plyio.write_ply(a, base)
    plyio.write_ply(b, base + [0.1, 0.0, 0.0])
    out = run_rap_demo(
        [a, b], tmp_path / "wk", num_steps=1, max_points_per_part=128,
    )
    assert "RANDOM" in out["log"]
    assert out["zip"]
