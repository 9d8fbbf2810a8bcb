"""Visualization tests (headless Agg rendering)."""

import numpy as np
import jax

from rap_tpu.core.batch import make_regular_synthetic_batch
from rap_tpu.eval.visualizer import FlowVisualization, OverlapVisualization, VisualizerConfig
from rap_tpu.utils import render as R


class TestRender:
    def test_part_colormap(self):
        cm = R.part_colormap()
        assert cm.shape == (64, 3)
        assert cm.min() >= 0 and cm.max() <= 1
        # colors reasonably distinct
        d = np.linalg.norm(cm[:, None] - cm[None], axis=-1)
        np.fill_diagonal(d, 1)
        assert d.min() > 0.02

    def test_render_returns_image(self):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((200, 3))
        img = R.render_point_cloud(pts, R.part_ids_to_colors(np.zeros(200, int)),
                                   image_size=128)
        assert img.shape == (128, 128, 3) and img.dtype == np.uint8

    def test_pca_colors_frozen_basis(self):
        rng = np.random.default_rng(1)
        f1 = rng.standard_normal((100, 16))
        c1, basis = R.pca_colors(f1)
        assert c1.shape == (100, 3) and basis.shape == (3, 16)
        c2, basis2 = R.pca_colors(f1, basis)
        np.testing.assert_allclose(c1, c2, atol=1e-6)
        assert basis2 is basis

    def test_gif(self, tmp_path):
        frames = [np.zeros((32, 32, 3), np.uint8) + i * 50 for i in range(3)]
        R.save_gif(tmp_path / "t.gif", frames)
        assert (tmp_path / "t.gif").stat().st_size > 0


class TestFlowVisualization:
    def test_renders_batch(self, tmp_path):
        b = make_regular_synthetic_batch(
            jax.random.key(0), [[30, 20]], N=32, P=2, S=1, feat_dim=8
        )
        vis = FlowVisualization(VisualizerConfig(
            output_dir=str(tmp_path), image_size=96, render_parts=True,
        ))
        gen = np.asarray(b.points_gt)
        traj = np.stack([np.asarray(b.points), gen])
        feats = np.random.default_rng(0).standard_normal((b.G, b.N, 8))
        written = vis.on_batch_end(
            b, [gen], [traj], midpoint_trajectories=[traj],
            transformer_features=feats,
            sample_names=["pairA"], dataset_name="toy",
        )
        d = tmp_path / "toy" / "pairA"
        assert (d / "input.png").exists()
        assert (d / "gt.png").exists()
        assert (d / "generation_0.png").exists()
        assert (d / "trajectory_0.gif").exists()
        assert (d / "trajectory_xt_0.gif").exists()
        assert (d / "features_pca.png").exists()
        assert (d / "part_0.png").exists()
        assert len(written) >= 4

    def test_failure_filter(self, tmp_path):
        b = make_regular_synthetic_batch(
            jax.random.key(0), [[20, 20]], N=32, P=2, S=1, feat_dim=4
        )
        vis = FlowVisualization(VisualizerConfig(
            output_dir=str(tmp_path), failure_metric="recall",
            failure_threshold=0.5, render_trajectory=False,
            render_features=False,
        ))
        # recall = 1.0 => success => nothing rendered
        written = vis.on_batch_end(
            b, [np.asarray(b.points_gt)], metrics={"recall": np.asarray([1.0])},
            dataset_name="toy",
        )
        assert written == []


class TestOverlapVisualization:
    def test_csv_and_hist(self, tmp_path):
        b = make_regular_synthetic_batch(
            jax.random.key(0), [[20, 20]], N=32, P=2, S=1, feat_dim=4
        )
        ov = OverlapVisualization(str(tmp_path))
        prob = np.random.default_rng(0).uniform(size=(b.G, b.N))
        ov.add_batch(b, prob, ["pairA"])
        csv = ov.finalize()
        assert csv.exists()
        lines = csv.read_text().splitlines()
        assert lines[0].startswith("sample,") and len(lines) == 2
        assert (tmp_path / "overlap_hist.png").exists()
        assert (tmp_path / "overlap_heatmap.png").exists()
        assert (tmp_path / "pairA_overlap_cloud.png").exists()


class TestRasterRenderer:
    def test_occlusion_and_shape(self):
        from rap_tpu.utils.render import render_point_cloud_raster, visualize_point_clouds

        # a near red point exactly in front of a far blue point: with the
        # default camera (elev=25, azim=45) place both on the view axis
        az, el = np.radians(45.0), np.radians(25.0)
        fwd = -np.array([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)])
        pts = np.stack([fwd * -1.0, fwd * 1.0])  # nearer first, farther second
        cols = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        img = render_point_cloud_raster(pts, cols, image_size=64, point_size=4)
        assert img.shape == (64, 64, 3) and img.dtype == np.uint8
        center = img[32, 32]
        assert center[0] > 200 and center[2] < 60  # red (near) wins

        via = visualize_point_clouds(pts, colors=cols, renderer="raster",
                                     image_size=64, point_size=4)
        np.testing.assert_array_equal(via, img)

    def test_empty_cloud(self):
        from rap_tpu.utils.render import render_point_cloud_raster

        img = render_point_cloud_raster(np.zeros((0, 3)), image_size=32)
        assert img.shape == (32, 32, 3)
        assert (img == 255).all()


class TestShadedRenderer:
    def test_lighting_and_shadow(self):
        from rap_tpu.utils.render import (
            estimate_normals,
            render_point_cloud_shaded,
            visualize_point_clouds,
        )

        # a dense flat plate: normals must come out ~±z, the render must be
        # occupied, anti-aliased to the requested size, and the ground plane
        # under the plate must carry a shadow darker than the background
        rng = np.random.default_rng(0)
        pts = np.concatenate([
            np.stack([rng.uniform(-1, 1, 800), rng.uniform(-1, 1, 800),
                      np.full(800, 0.5)], 1),
        ])
        nrm = estimate_normals(pts, k=8)
        assert nrm.shape == (len(pts), 3)
        assert np.abs(nrm[:, 2]).mean() > 0.95

        cols = np.tile([[0.2, 0.8, 0.3]], (len(pts), 1))
        img = render_point_cloud_shaded(pts, cols, image_size=96, point_size=3)
        assert img.shape == (96, 96, 3) and img.dtype == np.uint8
        # some pixels are the lit cloud (greenish), some the shadowed plane
        assert (img < 250).any(axis=-1).mean() > 0.05
        grey = img.mean(-1)
        assert grey.min() < 230  # shadow/AO darker than the white background

        via = visualize_point_clouds(pts, colors=cols, renderer="shaded",
                                     image_size=96, point_size=3)
        np.testing.assert_array_equal(via, img)

    def test_empty_and_no_shadow(self):
        from rap_tpu.utils.render import render_point_cloud_shaded

        img = render_point_cloud_shaded(np.zeros((0, 3)), image_size=32)
        assert img.shape == (32, 32, 3) and (img == 255).all()
        img = render_point_cloud_shaded(
            np.random.default_rng(1).normal(size=(64, 3)),
            image_size=48, ground_shadow=False, supersample=1,
        )
        assert img.shape == (48, 48, 3)
