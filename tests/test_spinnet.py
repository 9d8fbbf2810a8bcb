"""MiniSpinNet tests: shapes, azimuthal invariance, converter round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from rap_tpu.spinnet import (
    SpinNetConfig,
    convert_spinnet_torch_state_dict,
    extract_features,
    init_spinnet_params,
    spinnet_forward,
)
from rap_tpu.spinnet.model import (
    _CONV2D_CHANNELS,
    azimuth_rotations,
    extract_patches,
    voxel_grid_coordinates,
)

CFG = SpinNetConfig(des_r=1.0, num_points_per_patch=64, voxel_sample=4)


def _patches(key, B=3, K=64):
    pts = jax.random.normal(jax.random.key(key), (B, K, 3)) * 0.4
    return pts.at[:, -1, :].set(0.0)  # keypoint at origin in the last slot


class TestGrid:
    def test_grid_shape_and_radii(self):
        g = voxel_grid_coordinates(SpinNetConfig())
        assert g.shape == (3 * 7 * 20, 3)
        r = np.linalg.norm(g, axis=1)
        np.testing.assert_allclose(
            np.unique(np.round(r, 5)), [1 / 6, 0.5, 5 / 6], atol=1e-5
        )

    def test_azimuth_rotations_are_z_rotations(self):
        R = azimuth_rotations(SpinNetConfig())
        assert R.shape == (20, 3, 3)
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-7)
        for r in R:
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
            np.testing.assert_allclose(r[2], [0, 0, 1], atol=1e-7)


class TestForward:
    def test_shapes_and_unit_norm(self):
        params = init_spinnet_params(jax.random.key(0), CFG)
        f = spinnet_forward(params, CFG, _patches(1))
        assert f.shape == (3, 32)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(f, axis=1)), 1.0, atol=1e-5
        )

    def test_exact_azimuthal_invariance(self):
        """Rotation by exactly 2*pi/azi_n about z maps SPT cells onto each
        other; with circular azimuth convs + global pooling the descriptor is
        invariant."""
        params = init_spinnet_params(jax.random.key(0), CFG)
        patches = _patches(2)
        ang = 2 * np.pi / CFG.azi_n
        Rz = np.array(
            [
                [np.cos(ang), -np.sin(ang), 0],
                [np.sin(ang), np.cos(ang), 0],
                [0, 0, 1],
            ],
            np.float32,
        )
        rotated = jnp.einsum("bkd,xd->bkx", patches, jnp.asarray(Rz))
        f0 = spinnet_forward(params, CFG, patches)
        f1 = spinnet_forward(params, CFG, rotated)
        np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-3)

    def test_extract_patches_semantics(self):
        pts = jnp.asarray(
            [[0.1, 0, 0], [0.2, 0, 0], [5.0, 0, 0]], jnp.float32
        )
        kp = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
        patches = extract_patches(pts, kp, des_r=1.0, K=4)
        assert patches.shape == (1, 4, 3)
        got = np.asarray(patches[0])
        # two in-radius points, empty slots + last slot = keypoint
        np.testing.assert_allclose(got[0], [0.1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(got[1], [0.2, 0, 0], atol=1e-6)
        np.testing.assert_allclose(got[2], 0.0, atol=1e-6)
        np.testing.assert_allclose(got[3], 0.0, atol=1e-6)

    def test_extract_features_end_to_end(self):
        rng = np.random.default_rng(0)
        cloud = rng.standard_normal((500, 3)).astype(np.float32)
        kpts = cloud[:10]
        params = init_spinnet_params(jax.random.key(0), CFG)
        f = extract_features(params, CFG, cloud, kpts, des_r=0.8, chunk=4)
        assert f.shape == (10, 32)
        assert np.isfinite(f).all()

    def test_lrf_alignment_path(self):
        cfg = SpinNetConfig(
            des_r=1.0, num_points_per_patch=64, voxel_sample=4,
            is_aligned_to_global_z=False,
        )
        params = init_spinnet_params(jax.random.key(0), cfg)
        f = spinnet_forward(params, cfg, _patches(3))
        assert f.shape == (3, 32)
        assert bool(jnp.isfinite(f).all())


class TestConverter:
    def test_torch_state_dict_conversion(self):
        import torch

        sd = {}
        def add_conv(name, cin, cout, k):
            sd[f"{name}.weight"] = torch.randn(cout, cin, *k)
            sd[f"{name}.bias"] = torch.randn(cout)
        def add_bn(name, c, affine):
            sd[f"{name}.running_mean"] = torch.randn(c)
            sd[f"{name}.running_var"] = torch.rand(c) + 0.5
            if affine:
                sd[f"{name}.weight"] = torch.randn(c)
                sd[f"{name}.bias"] = torch.randn(c)

        add_conv("pnt_layer.0", 3, 16, (1, 1)); add_bn("pnt_layer.1", 16, True)
        add_conv("pool_layer.0", 32, 16, (1, 1)); add_bn("pool_layer.1", 16, True)
        add_conv("pool_layer.3", 16, 1, (1, 1)); add_bn("pool_layer.4", 1, True)
        # conv_net.ops: conv3d + bn, then 7 conv2d (+bn except last)
        op = 0
        add_conv(f"conv_net.ops.{op}", 16, 64, (3, 3, 3)); op += 1
        add_bn(f"conv_net.ops.{op}", 64, False); op += 2  # skip relu index
        cin = 64
        for i, cout in enumerate(_CONV2D_CHANNELS):
            add_conv(f"conv_net.ops.{op}", cin, cout, (3, 3)); op += 1
            if i < len(_CONV2D_CHANNELS) - 1:
                add_bn(f"conv_net.ops.{op}", cout, False); op += 2
            cin = cout

        params = convert_spinnet_torch_state_dict(sd)
        assert params["conv3d"]["kernel"].shape == (3, 3, 3, 16, 64)
        assert params["conv2d_0"]["kernel"].shape == (3, 3, 64, 64)
        assert params["conv2d_1"]["kernel"].shape == (3, 3, 64, 128)
        assert params["conv2d_6"]["kernel"].shape == (3, 3, 32, 32)
        assert "conv2d_6_bn" not in params
        # converted params drive the forward
        f = spinnet_forward(params, CFG, _patches(4))
        assert f.shape == (3, 32) and bool(jnp.isfinite(f).all())
