"""Mesh file IO: OBJ / PLY / NPY loading and OBJ export.

The reference delegates these to trimesh (main.py:33, main.py:163-174);
this is a self-contained NumPy implementation with the same observable
behavior for the formats the reference CLI accepts (.obj, .ply, .npy).
"""
from __future__ import annotations

import dataclasses
import struct
from typing import Optional

import numpy as np


@dataclasses.dataclass
class Mesh:
    vertices: np.ndarray  # (V, 3) float64
    faces: np.ndarray     # (F, 3) int64 (triangulated)
    face_colors: Optional[np.ndarray] = None    # (F, 4) uint8
    vertex_colors: Optional[np.ndarray] = None  # (V, 4) uint8

    @property
    def face_normals(self) -> np.ndarray:
        v = self.vertices
        f = self.faces
        n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        return n / np.where(norm > 1e-20, norm, 1.0)

    @property
    def face_areas(self) -> np.ndarray:
        v = self.vertices
        f = self.faces
        n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        return 0.5 * np.linalg.norm(n, axis=-1)


def _triangulate(poly: list) -> list:
    """Fan-triangulate a polygon index list (trimesh does the same for quads+)."""
    return [[poly[0], poly[i], poly[i + 1]] for i in range(1, len(poly) - 1)]


def load_obj(path: str) -> Mesh:
    vertices = []
    faces = []
    with open(path, "r", errors="replace") as fh:
        for line in fh:
            if line.startswith("v "):
                parts = line.split()
                vertices.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    # formats: v, v/vt, v/vt/vn, v//vn
                    s = tok.split("/")[0]
                    i = int(s)
                    # OBJ is 1-based; negative indices are relative
                    idx.append(i - 1 if i > 0 else len(vertices) + i)
                if len(idx) >= 3:
                    faces.extend(_triangulate(idx))
    return Mesh(
        vertices=np.asarray(vertices, dtype=np.float64),
        faces=np.asarray(faces, dtype=np.int64).reshape(-1, 3),
    )


def _ply_dtype(name: str):
    return {
        "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
        "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
        "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
        "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
    }[name]


def load_ply(path: str) -> Mesh:
    with open(path, "rb") as fh:
        magic = fh.readline().strip()
        if magic != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # list of (name, count, [(prop_kind, ...)])
        while True:
            line = fh.readline().decode("ascii", errors="replace").strip()
            if line.startswith("comment") or line.startswith("obj_info"):
                continue
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, cnt = line.split()
                elements.append([name, int(cnt), []])
            elif line.startswith("property"):
                parts = line.split()
                if parts[1] == "list":
                    elements[-1][2].append(("list", _ply_dtype(parts[2]), _ply_dtype(parts[3]), parts[4]))
                else:
                    elements[-1][2].append(("scalar", _ply_dtype(parts[1]), parts[2]))
            elif line == "end_header":
                break
        endian = "<" if fmt == "binary_little_endian" else ">"
        vertices, faces = None, []
        if fmt == "ascii":
            for name, cnt, props in elements:
                rows = [fh.readline().split() for _ in range(cnt)]
                if name == "vertex":
                    pidx = {p[-1]: i for i, p in enumerate(props)}
                    vertices = np.array(
                        [[float(r[pidx["x"]]), float(r[pidx["y"]]), float(r[pidx["z"]])] for r in rows]
                    )
                elif name == "face":
                    for r in rows:
                        n = int(r[0])
                        faces.extend(_triangulate([int(x) for x in r[1:1 + n]]))
        else:
            for name, cnt, props in elements:
                if name == "vertex" and all(p[0] == "scalar" for p in props):
                    dt = np.dtype([(p[2], endian + p[1]) for p in props])
                    data = np.frombuffer(fh.read(dt.itemsize * cnt), dtype=dt)
                    vertices = np.stack([data["x"], data["y"], data["z"]], axis=-1).astype(np.float64)
                elif name == "face":
                    for _ in range(cnt):
                        for p in props:
                            if p[0] == "list":
                                cdt = np.dtype(endian + p[1])
                                n = int(np.frombuffer(fh.read(cdt.itemsize), dtype=cdt)[0])
                                idt = np.dtype(endian + p[2])
                                idx = np.frombuffer(fh.read(idt.itemsize * n), dtype=idt)
                                if p[3] in ("vertex_indices", "vertex_index"):
                                    faces.extend(_triangulate([int(x) for x in idx]))
                            else:
                                fh.read(np.dtype(endian + p[1]).itemsize)
                else:
                    # skip unknown fixed-size element
                    if all(p[0] == "scalar" for p in props):
                        row = sum(np.dtype(endian + p[1]).itemsize for p in props)
                        fh.read(row * cnt)
        if vertices is None:
            raise ValueError(f"{path}: PLY has no vertex element")
    return Mesh(vertices=vertices, faces=np.asarray(faces, dtype=np.int64).reshape(-1, 3))


def load_mesh(path: str) -> Mesh:
    """Load a mesh from .obj or .ply (mirrors trimesh.load in main.py:33)."""
    lower = path.lower()
    if lower.endswith(".obj"):
        return load_obj(path)
    if lower.endswith(".ply"):
        return load_ply(path)
    raise ValueError(f"unsupported mesh format: {path}")


def save_obj(mesh: Mesh, path: str) -> None:
    """Export OBJ with optional colors.

    The reference exports via trimesh (main.py:170-174; app.py:116-127,
    144-171 sets orange vertex colors); trimesh writes vertex colors into
    OBJ as the 'v x y z r g b' extension (0-1 floats) — replicated here
    when vertex_colors is set. Face colors have no OBJ record; they go to
    a comment header.
    """
    v = np.asarray(mesh.vertices, dtype=np.float64)
    f = np.asarray(mesh.faces, dtype=np.int64)
    lines = []
    if mesh.face_colors is not None and len(mesh.face_colors):
        c = np.asarray(mesh.face_colors[0], dtype=np.int64)
        lines.append(f"# face_color {c[0]} {c[1]} {c[2]} {c[3]}")
    if mesh.vertex_colors is not None and len(mesh.vertex_colors):
        vc = np.asarray(mesh.vertex_colors, dtype=np.float64)[:, :3] / 255.0
        for p, c in zip(v, vc):
            lines.append(
                f"v {p[0]:.8f} {p[1]:.8f} {p[2]:.8f} {c[0]:.4f} {c[1]:.4f} {c[2]:.4f}"
            )
    else:
        for p in v:
            lines.append(f"v {p[0]:.8f} {p[1]:.8f} {p[2]:.8f}")
    for tri in f + 1:
        lines.append(f"f {tri[0]} {tri[1]} {tri[2]}")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
