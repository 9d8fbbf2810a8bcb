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


class TestHtmlViewer:
    """Self-contained interactive WebGL export (apps/html_viewer.py) — the
    headless replacement for the reference's Open3D GUI viewers
    (visualize_registered_pointclouds.py, visualize_sample_features.py)."""

    def _decode(self, html, key, dtype, entry=0):
        import base64
        import json
        import re

        m = re.search(r"const DATA = (\[.*?\]);\n", html, re.S)
        data = json.loads(m.group(1))
        e = data[entry]
        val = e[key] if key in ("pos", "posAlt") else e["colors"][key]
        return data, np.frombuffer(base64.b64decode(val), dtype)

    def test_export_roundtrips_points_and_colors(self, tmp_path):
        from rap_tpu.apps.html_viewer import build_sample, export_html

        rng = np.random.default_rng(0)
        parts = [rng.standard_normal((40, 3)), rng.standard_normal((30, 3))]
        feats = [rng.standard_normal((40, 8)).astype(np.float32),
                 rng.standard_normal((30, 8)).astype(np.float32)]
        s, basis = build_sample("scene", parts, features=feats)
        assert basis is not None
        out = export_html([s], tmp_path / "v.html")
        html = out.read_text()
        data, pos = self._decode(html, "pos", np.float32)
        assert data[0]["name"] == "scene" and data[0]["n"] == 70
        np.testing.assert_allclose(
            pos.reshape(70, 3), np.concatenate(parts).astype(np.float32)
        )
        _, cols = self._decode(html, "parts", np.uint8)
        assert cols.shape == (70 * 3,)
        _, pca = self._decode(html, "features (PCA)", np.uint8)
        assert pca.shape == (70 * 3,)
        # the viewer runtime is embedded (no network/CDN dependencies)
        assert "webgl" in html and "http" not in html.split("</script>")[0]

    def test_pose_toggle_states_and_subsampling(self, tmp_path):
        from rap_tpu.apps.html_viewer import build_sample, export_html

        rng = np.random.default_rng(1)
        parts = [rng.standard_normal((500, 3)) for _ in range(2)]
        moved = [p + 10.0 for p in parts]
        s, _ = build_sample("pair", parts, parts_alt=moved, max_points=300)
        out = export_html([s], tmp_path / "v.html")
        html = out.read_text()
        data, pos = self._decode(html, "pos", np.float32)
        _, alt = self._decode(html, "posAlt", np.float32)
        assert data[0]["n"] == 300  # subsampled
        # same subsample indices in both states: constant offset preserved
        np.testing.assert_allclose(alt - pos, 10.0, atol=1e-5)

    def test_results_and_samples_cli_export(self, tmp_path):
        res = _make_eval_results(tmp_path)
        rc = V.main([
            "results", "--results-dir", str(res),
            "-o", str(tmp_path / "viz"), "--html", str(tmp_path / "res.html"),
        ])
        assert rc == 0
        html = (tmp_path / "res.html").read_text()
        assert "pair_000" in html

        rng = np.random.default_rng(2)
        d = tmp_path / "data" / "s0"
        d.mkdir(parents=True)
        plyio.write_ply(d / "a.ply", rng.standard_normal((30, 3)).astype(np.float32))
        rc = V.main([
            "samples", "--data-dir", str(tmp_path / "data"),
            "-o", str(tmp_path / "viz2"), "--html", str(tmp_path / "s.html"),
        ])
        assert rc == 0 and (tmp_path / "s.html").stat().st_size > 1000

    def test_results_html_with_input_dir_has_pose_toggle(self, tmp_path):
        res = _make_eval_results(tmp_path)
        rng = np.random.default_rng(3)
        inp = tmp_path / "inputs"
        inp.mkdir()
        for i in range(2):
            plyio.write_ply(inp / f"part_{i}.ply",
                            rng.standard_normal((40, 3)).astype(np.float32))
        out = V.export_results_html(res, tmp_path / "v.html", input_dir=inp)
        html = out.read_text()
        data, pos = self._decode(html, "pos", np.float32)
        assert "posAlt" in data[0]
        _, alt = self._decode(html, "posAlt", np.float32)
        assert pos.shape == alt.shape and not np.allclose(pos, alt)
