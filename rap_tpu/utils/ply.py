"""Minimal, dependency-free PLY point-cloud I/O (numpy only).

The reference reads PLYs through trimesh/Open3D (C++); neither is needed for
a point-cloud-only workload, and this host-side path must not add heavyweight
deps. Supports ASCII and binary little/big-endian, vertex properties
(x, y, z [, nx, ny, nz] [, red, green, blue]), read and write.
A faster C++ reader can back this interface later (rap_tpu/native).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

_PLY_TYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def read_ply_points(path) -> np.ndarray:
    """(N,3) float32 vertices only — native C++ fast path when built."""
    from .. import native

    fast = native.read_ply_points(path)
    if fast is not None:
        return fast
    return read_ply(path)["points"]


def read_ply(path) -> dict[str, np.ndarray]:
    """Read vertex data. Returns dict with 'points' (N,3) f32 and optionally
    'normals' (N,3) f32 and 'colors' (N,3) u8."""
    path = Path(path)
    with open(path, "rb") as f:
        line = f.readline().strip()
        if line != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        n_vertex = 0
        props: list[tuple[str, str]] = []
        in_vertex = False
        other_elements: list[tuple[str, int]] = []
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unexpected EOF in header")
            tok = line.strip().split()
            if not tok:
                continue
            key = tok[0]
            if key == b"format":
                fmt = tok[1].decode()
            elif key == b"comment" or key == b"obj_info":
                continue
            elif key == b"element":
                name = tok[1].decode()
                count = int(tok[2])
                in_vertex = name == "vertex"
                if in_vertex:
                    n_vertex = count
                else:
                    other_elements.append((name, count))
            elif key == b"property":
                if tok[1] == b"list":
                    if in_vertex:
                        raise ValueError(f"{path}: list property on vertex")
                    continue
                if in_vertex:
                    props.append((tok[2].decode(), _PLY_TYPES[tok[1].decode()]))
            elif key == b"end_header":
                break

        names = [p[0] for p in props]
        if fmt == "ascii":
            rows = []
            for _ in range(n_vertex):
                rows.append(f.readline().split())
            arr = np.array(rows, dtype=np.float64)
            data = {n: arr[:, i] for i, n in enumerate(names)}
        else:
            endian = "<" if fmt == "binary_little_endian" else ">"
            dt = np.dtype([(n, endian + t) for n, t in props])
            raw = f.read(dt.itemsize * n_vertex)
            rec = np.frombuffer(raw, dtype=dt, count=n_vertex)
            data = {n: rec[n] for n in names}

    out: dict[str, np.ndarray] = {
        "points": np.stack(
            [data["x"], data["y"], data["z"]], axis=-1
        ).astype(np.float32)
    }
    if all(k in data for k in ("nx", "ny", "nz")):
        out["normals"] = np.stack(
            [data["nx"], data["ny"], data["nz"]], axis=-1
        ).astype(np.float32)
    if all(k in data for k in ("red", "green", "blue")):
        out["colors"] = np.stack(
            [data["red"], data["green"], data["blue"]], axis=-1
        ).astype(np.uint8)
    return out


def write_ply(
    path,
    points: np.ndarray,
    normals: np.ndarray | None = None,
    colors: np.ndarray | None = None,
    binary: bool = True,
) -> None:
    """Write a point cloud (N,3) with optional normals (N,3) / colors (N,3 u8)."""
    path = Path(path)
    points = np.asarray(points, np.float32).reshape(-1, 3)
    n = points.shape[0]
    fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    header = [
        "ply",
        "format binary_little_endian 1.0" if binary else "format ascii 1.0",
        f"element vertex {n}",
        "property float x",
        "property float y",
        "property float z",
    ]
    if normals is not None:
        normals = np.asarray(normals, np.float32).reshape(-1, 3)
        fields += [("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
        header += ["property float nx", "property float ny", "property float nz"]
    if colors is not None:
        colors = np.asarray(colors, np.uint8).reshape(-1, 3)
        fields += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
        header += [
            "property uchar red",
            "property uchar green",
            "property uchar blue",
        ]
    header.append("end_header")

    rec = np.empty(n, dtype=np.dtype(fields))
    rec["x"], rec["y"], rec["z"] = points[:, 0], points[:, 1], points[:, 2]
    if normals is not None:
        rec["nx"], rec["ny"], rec["nz"] = normals[:, 0], normals[:, 1], normals[:, 2]
    if colors is not None:
        rec["red"], rec["green"], rec["blue"] = colors[:, 0], colors[:, 1], colors[:, 2]

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if binary:
            f.write(rec.tobytes())
        else:
            cols = [rec[name] for name, _ in fields]
            np.savetxt(f, np.column_stack(cols), fmt="%.6g")
