"""MiniSpinNet: rotation-robust 32-D local point descriptors (JAX/TPU).

Behavioral parity with /root/reference/dataset_process/utils/spinnet/
(patch_embedder.py, patchnet.py, utils/common.py) — the BUFFER-X/SpinNet
lineage descriptor used to condition the flow model:

  1. patch extraction: up to K=512 in-radius (des_r) neighbors per keypoint
     (pytorch3d ball_query "first K" semantics); missing slots hold the
     keypoint; the last slot is pinned to the keypoint so the patch center is
     the keypoint (the original SpinNet select_patches contract,
     common.py:13-48; patch_embedder's variant leaves a dense patch's last
     slot arbitrary — we keep the deterministic original).
  2. delta coords normalized by des_r; optional LRF z-axis alignment via the
     covariance eigenvector (is_aligned_to_global_z=False path,
     common.py:539-557); rap checkpoints run global-z (identity).
  3. spatial point transformer: cylindrical grid rad_n=3 x ele_n=7 x azi_n=20
     (s2_grid beta/alpha offsets, radial fractions (i+0.5)/rad_n), up to 10
     samples per cell within radius delta/rad_n, zero-filled; azimuth
     invariantization rotates each ring by Rz(-2 pi i / azi_n)
     (common.py:387-469).
  4. conv head: 1x1 Conv(3->16)+BN+ReLU, max over cell samples, reshape to
     (B, 16, rad, ele, azi); Conv3D(16->64, k=3, valid radial, zero-padded
     elevation, CIRCULAR azimuth) then 7 Conv2D (64,128,128,64,64,32,32; last
     bn/relu-free) with the same padding; attention pooling (1x1 convs to a
     scalar weight) + global average + L2 norm (patchnet.py:68-84,
     patch_embedder.py:74-91).

All stages are batched over keypoints and chunked to bound memory; no Python
per-patch loops. BatchNorm runs in inference mode from checkpoint statistics
(randomly initialized stats for scratch training are standard-normal
identity).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

HIGH = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class SpinNetConfig:
    des_r: float = 3.0
    num_points_per_patch: int = 512
    rad_n: int = 3
    azi_n: int = 20
    ele_n: int = 7
    delta: float = 0.8
    voxel_sample: int = 10
    is_aligned_to_global_z: bool = True
    out_dim: int = 32

    @property
    def n_cells(self) -> int:
        return self.rad_n * self.azi_n * self.ele_n


# --------------------------------------------------------------------------
# Cylindrical grid + azimuth invariantization constants
# --------------------------------------------------------------------------

def voxel_grid_coordinates(cfg: SpinNetConfig) -> np.ndarray:
    """(rad_n*ele_n*azi_n, 3) cell centers in the unit ball (ref
    get_voxel_coordinate / s2_grid, common.py:387-398, 430-445)."""
    beta = (
        np.linspace(0, np.pi, cfg.ele_n, endpoint=False) + np.pi / cfg.ele_n / 2
    )
    alpha = (
        np.linspace(0, 2 * np.pi, cfg.azi_n, endpoint=False) + np.pi / cfg.azi_n
    )
    B, A = np.meshgrid(beta, alpha, indexing="ij")
    b, a = B.flatten(), A.flatten()
    # spherical -> cartesian at unit radius (S2.change_coordinates 'S'->'C')
    xyz = np.stack(
        [np.sin(b) * np.cos(a), np.sin(b) * np.sin(a), np.cos(b)], axis=1
    )
    scale = (np.arange(cfg.rad_n) / cfg.rad_n + 0.5 / cfg.rad_n)[:, None, None]
    return (scale * xyz[None]).reshape(-1, 3).astype(np.float32)


def azimuth_rotations(cfg: SpinNetConfig) -> np.ndarray:
    """(azi_n, 3, 3) Rz(-2 pi i / azi_n) matrices (ref var_to_invar)."""
    out = np.zeros((cfg.azi_n, 3, 3), np.float32)
    for i in range(cfg.azi_n):
        a = -2.0 * np.pi * i / cfg.azi_n
        c, s = np.cos(a), np.sin(a)
        out[i] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    return out


# --------------------------------------------------------------------------
# Parameters
# --------------------------------------------------------------------------

_CONV2D_CHANNELS = [64, 128, 128, 64, 64, 32, 32]  # after the 3D conv (64)


def _conv_init(key, cin, cout, ksize, bias=True):
    fan_in = cin * int(np.prod(ksize))
    bound = 1.0 / math.sqrt(fan_in)
    kk, kb = jax.random.split(key)
    p = {
        "kernel": jax.random.uniform(
            kk, tuple(ksize) + (cin, cout), jnp.float32, -bound, bound
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return p


def _bn_init(c, affine):
    p = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
    if affine:
        p["scale"] = jnp.ones((c,))
        p["bias"] = jnp.zeros((c,))
    return p


def init_spinnet_params(key: jax.Array, cfg: SpinNetConfig = SpinNetConfig()):
    ks = jax.random.split(key, 16)
    params: dict[str, Any] = {
        "pnt_conv": _conv_init(ks[0], 3, 16, (1, 1)),
        "pnt_bn": _bn_init(16, affine=True),
        "conv3d": _conv_init(ks[1], 16, 64, (3, 3, 3)),
        "conv3d_bn": _bn_init(64, affine=False),
        "pool_conv1": _conv_init(ks[2], 32, 16, (1, 1)),
        "pool_bn1": _bn_init(16, affine=True),
        "pool_conv2": _conv_init(ks[3], 16, 1, (1, 1)),
        "pool_bn2": _bn_init(1, affine=True),
    }
    cin = 64
    for i, cout in enumerate(_CONV2D_CHANNELS):
        params[f"conv2d_{i}"] = _conv_init(ks[4 + i], cin, cout, (3, 3))
        if i < len(_CONV2D_CHANNELS) - 1:  # last layer: no bn/relu
            params[f"conv2d_{i}_bn"] = _bn_init(cout, affine=False)
        cin = cout
    return params


# --------------------------------------------------------------------------
# Forward building blocks
# --------------------------------------------------------------------------

def _bn(p, x, axis=-1, eps=1e-5):
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    y = (x - p["mean"].reshape(shape)) * jax.lax.rsqrt(
        p["var"].reshape(shape) + eps
    )
    if "scale" in p:
        y = y * p["scale"].reshape(shape) + p["bias"].reshape(shape)
    return y


def _conv2d_cyl(p, x):
    """3x3 conv with circular azimuth (W) and zero elevation (H) padding.

    x: (B, H=ele, W=azi, C) NHWC.
    """
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap")
    x = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + p["bias"]


def _conv3d_cyl(p, x):
    """3x3x3 conv, valid radial (D), zero-padded elevation, circular azimuth.

    x: (B, D=rad, H=ele, W=azi, C) NDHWC -> (B, D-2, H, W, C_out).
    """
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap")
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + p["bias"]


def _lrf_z_axis(delta: jax.Array, center: jax.Array) -> jax.Array:
    """Local-reference-frame z axis: smallest-eigenvalue direction of the
    patch covariance, disambiguated toward the viewpoint (ref cal_Z_axis)."""
    cov = jnp.einsum("bni,bnj->bij", delta, delta, precision=HIGH)
    # eigh ascending -> last column of reference svd U == first eigvec here;
    # reference takes u[:, :, -1] (smallest singular direction)
    w, v = jnp.linalg.eigh(cov)
    z = v[..., 0]  # smallest eigenvalue direction
    flip = jnp.sum(-z * center, axis=-1) < 0
    return jnp.where(flip[:, None], -z, z)


def _rodrigues_to_z(z_axis: jax.Array) -> jax.Array:
    """Rotation matrices aligning each z_axis to (0,0,1) (ref RodsRotatFormula)."""
    target = jnp.array([0.0, 0.0, 1.0])
    v = jnp.cross(z_axis, jnp.broadcast_to(target, z_axis.shape))
    s = jnp.linalg.norm(v, axis=-1, keepdims=True)
    c = jnp.sum(z_axis * target, axis=-1)[:, None, None]
    vx = jnp.zeros(z_axis.shape[:-1] + (3, 3))
    a, b, cc = v[..., 0], v[..., 1], v[..., 2]
    zeros = jnp.zeros_like(a)
    vx = jnp.stack(
        [
            jnp.stack([zeros, -cc, b], -1),
            jnp.stack([cc, zeros, -a], -1),
            jnp.stack([-b, a, zeros], -1),
        ],
        -2,
    )
    eye = jnp.broadcast_to(jnp.eye(3), vx.shape)
    R = eye + vx + jnp.matmul(vx, vx) * ((1 - c) / jnp.maximum(s * s, 1e-12)[..., None])
    # degenerate (z already +-Z): identity / 180deg flip handled by limit
    return R


@functools.partial(jax.jit, static_argnames=("cfg",))
def spinnet_forward(
    params: dict,
    cfg: SpinNetConfig,
    patches: jax.Array,  # (B, K, 3) — raw patch coords, last slot = keypoint
) -> jax.Array:
    """Patches -> L2-normalized (B, 32) descriptors."""
    B, K, _ = patches.shape
    center = patches[:, -1, :]
    delta = patches - center[:, None, :]
    if not cfg.is_aligned_to_global_z:
        z = _lrf_z_axis(delta, center)
        z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        R = _rodrigues_to_z(z)
        delta = jnp.matmul(delta, R, precision=HIGH)
    delta = delta / cfg.des_r  # unit-ball normalization

    # ---- spatial point transformer ----------------------------------------
    grid = jnp.asarray(voxel_grid_coordinates(cfg))        # (C, 3)
    C = grid.shape[0]
    r = cfg.delta / cfg.rad_n
    d2 = (
        jnp.sum(grid * grid, -1)[None, :, None]
        - 2.0 * jnp.einsum("cd,bkd->bck", grid, delta, precision=HIGH)
        + jnp.sum(delta * delta, -1)[:, None, :]
    )  # (B, C, K)
    ok = d2 <= r * r
    # first-nsample in index order (pytorch3d ball_query semantics)
    rank = jnp.cumsum(ok.astype(jnp.int32), axis=-1) - 1
    # Slot assembly as S one-hot matmuls instead of a scatter: each slot s
    # holds the unique in-radius point with rank==s (zeros when none), so
    # cell_pts[b,c,s] = sum_k 1[ok & rank==s] * delta[b,k] — an MXU-shaped
    # (C, K) @ (K, 3) contraction. The scatter formulation serializes on
    # TPU: measured 26.8 s/view flat (runs/ab_spinnet datagen, 2026-08-20)
    # vs ~0.2 s/view for this gather-free form; identical values (the
    # indicator picks exactly the one scatter source per slot).
    slots = []
    for s in range(cfg.voxel_sample):
        sel_s = (ok & (rank == s)).astype(delta.dtype)      # (B, C, K)
        slots.append(jnp.einsum(
            "bck,bkd->bcd", sel_s, delta, precision=HIGH
        ))
    cell_pts = jnp.stack(slots, axis=2)                     # (B, C, S, 3)

    # azimuth invariantization: rotate ring i by Rz(-2 pi i / azi_n)
    Razi = jnp.asarray(azimuth_rotations(cfg))              # (A, 3, 3)
    cp = cell_pts.reshape(B, cfg.rad_n, cfg.ele_n, cfg.azi_n, cfg.voxel_sample, 3)
    # new_pts = pts @ R_i^T per azimuth ring i: out_x = sum_d pts_d R[x, d]
    cp = jnp.einsum("breasd,axd->breasx", cp, Razi, precision=HIGH)
    cell_pts = cp.reshape(B, C, cfg.voxel_sample, 3)

    # ---- point MLP + max pool over samples --------------------------------
    x = jnp.einsum(
        "bcsd,do->bcso", cell_pts, params["pnt_conv"]["kernel"][0, 0],
        precision=HIGH,
    ) + params["pnt_conv"]["bias"]
    x = _bn(params["pnt_bn"], x)
    x = jax.nn.relu(x)
    x = jnp.max(x, axis=2)                                   # (B, C, 16)

    # ---- cylindrical conv stack -------------------------------------------
    x = x.reshape(B, cfg.rad_n, cfg.ele_n, cfg.azi_n, 16)    # NDHWC
    x = _conv3d_cyl(params["conv3d"], x)                     # (B, 1, ele, azi, 64)
    x = jax.nn.relu(_bn(params["conv3d_bn"], x))
    x = x[:, 0]                                              # (B, ele, azi, 64)
    for i in range(len(_CONV2D_CHANNELS)):
        x = _conv2d_cyl(params[f"conv2d_{i}"], x)
        if i < len(_CONV2D_CHANNELS) - 1:
            x = jax.nn.relu(_bn(params[f"conv2d_{i}_bn"], x))

    # ---- attention pooling + L2 norm ---------------------------------------
    w = jnp.einsum(
        "behc,co->beho", x, params["pool_conv1"]["kernel"][0, 0], precision=HIGH
    ) + params["pool_conv1"]["bias"]
    w = jax.nn.relu(_bn(params["pool_bn1"], w))
    w = jnp.einsum(
        "behc,co->beho", w, params["pool_conv2"]["kernel"][0, 0], precision=HIGH
    ) + params["pool_conv2"]["bias"]
    w = jax.nn.relu(_bn(params["pool_bn2"], w))              # (B, ele, azi, 1)
    f = jnp.mean(x * w, axis=(1, 2))                          # (B, 32)
    return f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)


# --------------------------------------------------------------------------
# Patch extraction + public API
# --------------------------------------------------------------------------

def extract_patches(
    points: jax.Array,   # (N, 3)
    keypoints: jax.Array,  # (Q, 3)
    des_r: float,
    K: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """(Q, K, 3) in-radius patches; empty/overflow slots and the last slot hold
    the keypoint (original SpinNet contract)."""
    from ..ops.points import ball_query

    if mask is None:
        mask = jnp.ones(points.shape[0], bool)
    idx, cnt, within = ball_query(keypoints, points, mask, float(des_r), K)
    pts = points[idx]                                        # (Q, K, 3)
    pts = jnp.where(within[..., None], pts, keypoints[:, None, :])
    pts = pts.at[:, -1, :].set(keypoints)
    return pts


@functools.partial(jax.jit, static_argnames=("cfg",))
def _extract_feature_chunks(params, cfg: SpinNetConfig, pts, mask, kps):
    """One device program for a whole view's descriptors: lax.map over
    keypoint chunks (bounds the (chunk, K, N) distance work) with patch
    extraction + the SpinNet forward fused. One call per view instead of
    one *eager op dispatch* per jnp op per chunk — through the remote-TPU
    tunnel (~25 ms RTT per dispatch) that is the difference between ~50 min
    and ~2 min of sidecar extraction for a 12k-view dataset."""

    def one(kp):
        patches = extract_patches(
            pts, kp, cfg.des_r, cfg.num_points_per_patch, mask=mask
        )
        return spinnet_forward(params, cfg, patches)

    return jax.lax.map(one, kps)  # (nc, chunk, 3) -> (nc, chunk, 32)


def extract_features(
    params: dict,
    cfg: SpinNetConfig,
    points: np.ndarray,
    keypoints: np.ndarray,
    des_r: float,
    chunk: int = 256,
) -> np.ndarray:
    """Full cloud as context, keypoints as queries -> (Q, 32) descriptors."""
    cfg = dataclasses.replace(cfg, des_r=float(des_r))
    from ..ops.points import shape_bucket

    # pad the context cloud AND the keypoint count to bucketed sizes:
    # distinct (Q, N) shapes would otherwise recompile ball_query +
    # spinnet_forward once per part of every sample
    n = len(points)
    nb = shape_bucket(n)
    padded = np.zeros((nb, 3), np.float32)
    padded[:n] = points
    pts = jnp.asarray(padded)
    mask = jnp.asarray(np.arange(nb) < n)
    q = len(keypoints)
    # shape_bucket returns powers of two, which only divide evenly by
    # power-of-two chunks; round up to a chunk multiple so any public
    # chunk size keeps the (qb // chunk, chunk, 3) reshape legal
    qb = shape_bucket(max(q, chunk))
    qb = ((qb + chunk - 1) // chunk) * chunk
    kp_pad = np.zeros((qb, 3), np.float32)
    kp_pad[:q] = keypoints
    kps = jnp.asarray(kp_pad.reshape(qb // chunk, chunk, 3))
    feats = _extract_feature_chunks(params, cfg, pts, mask, kps)
    return np.asarray(feats).reshape(qb, cfg.out_dim)[:q]


def build_feature_extractor(checkpoint: str = "", cfg: SpinNetConfig = SpinNetConfig()):
    """Returns callable(cloud, keypoints, des_r) -> (Q, 32) numpy."""
    if checkpoint:
        params = load_spinnet_torch_checkpoint(checkpoint)
    else:
        import logging

        logging.getLogger("rap_tpu.spinnet").warning(
            "no SpinNet checkpoint — using random descriptor weights"
        )
        params = init_spinnet_params(jax.random.key(0), cfg)

    def fn(cloud: np.ndarray, keypoints: np.ndarray, des_r: float) -> np.ndarray:
        return extract_features(params, cfg, cloud, keypoints, des_r)

    return fn


# --------------------------------------------------------------------------
# Torch checkpoint conversion (spinnet_*_bufferx.pth / mini_spinnet_t.pth;
# weights live under the 'Desc.' prefix — ref extract_sample_features.py:127)
# --------------------------------------------------------------------------

def convert_spinnet_torch_state_dict(sd: dict) -> dict:
    def arr(k):
        v = sd[k]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, np.float32))

    def conv(k, ndim):
        # torch conv weight (O, I, *k) -> (*k, I, O)
        w = np.asarray(arr(f"{k}.weight"))
        perm = tuple(range(2, 2 + ndim)) + (1, 0)
        p = {"kernel": jnp.asarray(w.transpose(perm))}
        if f"{k}.bias" in sd:
            p["bias"] = arr(f"{k}.bias")
        return p

    def bn(k, affine):
        p = {"mean": arr(f"{k}.running_mean"), "var": arr(f"{k}.running_var")}
        if affine:
            p["scale"] = arr(f"{k}.weight")
            p["bias"] = arr(f"{k}.bias")
        return p

    params = {
        "pnt_conv": conv("pnt_layer.0", 2),
        "pnt_bn": bn("pnt_layer.1", True),
        "pool_conv1": conv("pool_layer.0", 2),
        "pool_bn1": bn("pool_layer.1", True),
        "pool_conv2": conv("pool_layer.3", 2),
        "pool_bn2": bn("pool_layer.4", True),
    }
    # conv_net.ops: [conv3d, bn, relu?] sequence — relus are not modules with
    # params; ops indices: 0 conv3d, 1 bn3d, (relu), then per 2d conv:
    # conv, bn, relu... find conv ops by probing keys
    op_keys = sorted(
        {int(k.split(".")[2]) for k in sd if k.startswith("conv_net.ops.")}
    )
    conv_ops = [i for i in op_keys if f"conv_net.ops.{i}.weight" in sd
                and sd[f"conv_net.ops.{i}.weight"].ndim >= 4]
    bn_ops = [i for i in op_keys if f"conv_net.ops.{i}.running_mean" in sd]
    assert len(conv_ops) == 1 + len(_CONV2D_CHANNELS), (conv_ops, bn_ops)
    params["conv3d"] = conv(f"conv_net.ops.{conv_ops[0]}", 3)
    params["conv3d_bn"] = bn(f"conv_net.ops.{bn_ops[0]}", False)
    for j, ci in enumerate(conv_ops[1:]):
        params[f"conv2d_{j}"] = conv(f"conv_net.ops.{ci}", 2)
        if j < len(_CONV2D_CHANNELS) - 1:
            params[f"conv2d_{j}_bn"] = bn(f"conv_net.ops.{bn_ops[j + 1]}", False)
    return params


def load_spinnet_torch_checkpoint(path: str) -> dict:
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    desc = {
        k[len("Desc."):]: v for k, v in sd.items() if k.startswith("Desc.")
    } or sd
    return convert_spinnet_torch_state_dict(desc)
