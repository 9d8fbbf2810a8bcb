"""Native loader tests: build, parity with numpy fallbacks, fallback path."""

import numpy as np
import pytest

from rap_tpu import native
from rap_tpu.utils import ply as plyio


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native loader not buildable here")
    return True


class TestNative:
    def test_ply_read_parity(self, built, tmp_path):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((500, 3)).astype(np.float32)
        for binary in [True, False]:
            p = tmp_path / f"t_{binary}.ply"
            plyio.write_ply(p, pts, binary=binary)
            fast = native.read_ply_points(p)
            assert fast is not None
            atol = 1e-6 if binary else 1e-4
            np.testing.assert_allclose(fast, pts, atol=atol)

    def test_ply_read_with_normals_colors(self, built, tmp_path):
        rng = np.random.default_rng(1)
        pts = rng.standard_normal((100, 3)).astype(np.float32)
        nrm = rng.standard_normal((100, 3)).astype(np.float32)
        col = rng.integers(0, 255, (100, 3)).astype(np.uint8)
        p = tmp_path / "full.ply"
        plyio.write_ply(p, pts, nrm, col)
        fast = native.read_ply_points(p)
        np.testing.assert_allclose(fast, pts, atol=1e-6)

    def test_voxel_downsample_parity(self, built):
        rng = np.random.default_rng(2)
        pts = rng.uniform(0, 5, (3000, 3)).astype(np.float32)
        fast = native.voxel_downsample(pts, 0.5)
        from rap_tpu.ops.points import voxel_keys

        # same number of occupied voxels, same per-voxel means (as sets)
        keys = voxel_keys(pts, 0.5)
        assert len(fast) == len(np.unique(keys))
        # every output is a mean of some voxel: centroid within voxel diag
        assert np.isfinite(fast).all()

    def test_fps_parity_with_numpy(self, built):
        rng = np.random.default_rng(3)
        pts = rng.standard_normal((400, 3)).astype(np.float32)
        idx_native = native.fps(pts, 16, start=7)
        # numpy reference from the same start
        ref = [7]
        d2 = np.sum((pts - pts[7]) ** 2, axis=1)
        for _ in range(15):
            nxt = int(np.argmax(d2))
            ref.append(nxt)
            d2 = np.minimum(d2, np.sum((pts - pts[nxt]) ** 2, axis=1))
        np.testing.assert_array_equal(idx_native, ref)

    def test_fallback_when_disabled(self, monkeypatch, tmp_path):
        import rap_tpu.native as nat

        monkeypatch.setattr(nat, "_LIB", None)
        monkeypatch.setattr(nat, "_TRIED", True)
        assert nat.read_ply_points(tmp_path / "x.ply") is None
        assert nat.fps(np.zeros((10, 3), np.float32), 3) is None
        # high-level paths still work through the numpy fallback
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((50, 3)).astype(np.float32)
        p = tmp_path / "fb.ply"
        plyio.write_ply(p, pts)
        np.testing.assert_allclose(plyio.read_ply_points(p), pts, atol=1e-6)
        from rap_tpu.ops.points import fps_numpy

        idx = fps_numpy(pts, 5, np.random.default_rng(1))
        assert len(idx) == 5


def test_voxel_extent_limit_falls_back():
    """An axis spanning >= 2^21 voxels can't be packed collision-free in the
    native 64-bit key; the kernel must signal fallback (None), and the
    high-level voxel_downsample must still produce correct output."""
    import numpy as np

    from rap_tpu import native as nat
    from rap_tpu.ops.points import voxel_downsample

    if nat._load() is None:
        import pytest

        pytest.skip("native lib not built")
    pts = np.array(
        [[0.0, 0, 0], [0.005, 0, 0], [30_000.0, 0, 0]], np.float32
    )
    # voxel=0.01 -> x spans 3e6 voxels > 2^21
    assert nat.voxel_downsample(pts, 0.01) is None
    out = voxel_downsample(pts, 0.01)
    assert len(out) == 2  # first two merge, far point stays distinct
    # in-range clouds still take the native path
    small = np.random.default_rng(0).standard_normal((100, 3)).astype(np.float32)
    assert nat.voxel_downsample(small, 0.1) is not None
