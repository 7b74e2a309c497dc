"""Generated-face post-processing: the trimesh cleanup pipeline.

Replicates the observable behavior of main.py:156-175 / app.py:142-171:
  1. drop NaN faces (unfilled slots from the generation buffer),
  2. vertices = faces reshaped (-1, 3) with sequential triangle indices,
  3. merge duplicate vertices (trimesh.Trimesh(merge_primitives=True) +
     merge_vertices),
  4. drop duplicate faces (update_faces(unique_faces())),
  5. make winding consistent and outward (fix_normals),
  6. per-face colors + OBJ export.

Coordinates are multiples of 1/128 (the undiscretize grid), so duplicate
detection by exact equality is equivalent to trimesh's digit-rounding
merge.
"""
from __future__ import annotations

from collections import defaultdict, deque
from typing import Optional

import numpy as np

from meshanything_tpu.geometry.obj_io import Mesh


def merge_vertices(vertices: np.ndarray, faces: np.ndarray, digits: int = 8):
    """Merge vertices identical after rounding to `digits` decimals."""
    key = np.round(vertices, digits)
    uniq, inverse = np.unique(key, axis=0, return_inverse=True)
    # keep first occurrence's original coordinates for stability
    first = np.full(len(uniq), -1, dtype=np.int64)
    seen = np.zeros(len(uniq), dtype=bool)
    order = np.arange(len(vertices))
    for idx in order:
        g = inverse[idx]
        if not seen[g]:
            seen[g] = True
            first[g] = idx
    new_vertices = vertices[first]
    new_faces = inverse[faces]
    return new_vertices, new_faces


def remove_degenerate_and_duplicate_faces(faces: np.ndarray) -> np.ndarray:
    """Drop faces with repeated vertices and keep the first of each
    duplicate set (duplicates compared on the sorted index triple, the
    same criterion as trimesh.unique_faces)."""
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[ok]
    key = np.sort(faces, axis=1)
    _, first_idx = np.unique(key, axis=0, return_index=True)
    return faces[np.sort(first_idx)]


def fix_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Make winding consistent across each connected component and orient
    so the total signed volume is non-negative (trimesh.fix_normals).

    Vectorized: winding parity is a 2-coloring of the face-adjacency
    graph, computed as connected components of a DOUBLED graph with
    nodes (face, flipped?) — each shared edge links (fa, s) to
    (fb, s ^ same_direction). One scipy csgraph call replaces the
    per-face Python BFS (1.7 s -> ~30 ms on the 20k-face wand.obj input
    that serving cleans per request). Components whose doubled graph
    collapses to one cluster are non-orientable (Möbius-like);
    their faces are left as-is, matching the arbitrary resolution any
    traversal order gives.

    Only edges with exactly 2 incident face-slots contribute winding
    links: a non-manifold edge (3+ incident faces, which generated
    triangle soup can produce after merge_vertices) has no consistent
    two-face winding constraint, and linking through it would collapse
    the doubled graph and mark genuinely orientable neighbours
    non-orientable (advisor r2)."""
    faces = np.asarray(faces).copy()
    nf = len(faces)
    if nf == 0:
        return faces
    try:
        from scipy import sparse
        from scipy.sparse.csgraph import connected_components
    except ImportError:  # pragma: no cover - scipy is in the image
        return _fix_normals_bfs(vertices, faces)

    u = faces.reshape(-1)                       # a,b,c per face
    v = faces[:, [1, 2, 0]].reshape(-1)         # b,c,a per face
    fid = np.repeat(np.arange(nf, dtype=np.int64), 3)
    lo = np.minimum(u, v)
    hi = np.maximum(u, v)
    dirflag = (u > v).astype(np.int8)

    order = np.lexsort((hi, lo))
    lo_s, hi_s = lo[order], hi[order]
    f_s, d_s = fid[order], dirflag[order]
    new_group = np.empty(len(lo_s), bool)
    new_group[0] = True
    new_group[1:] = (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])
    gstart = np.flatnonzero(new_group)
    gid = np.cumsum(new_group) - 1
    first_entry = gstart[gid]
    counts = np.bincount(gid)
    manifold = counts[gid] == 2          # exactly-2-incident edges only
    sel = (np.arange(len(lo_s)) != first_entry) & manifold
    fa = f_s[first_entry[sel]]
    da = d_s[first_entry[sel]]
    fb = f_s[sel]
    db = d_s[sel]
    keep = fa != fb
    fa, fb = fa[keep], fb[keep]
    # same traversal direction on a shared edge => one of the two faces
    # must flip for consistent winding
    par = (da[keep] == db[keep]).astype(np.int64)

    rows = np.concatenate([fa * 2, fa * 2 + 1])
    cols = np.concatenate([fb * 2 + par, fb * 2 + (1 - par)])
    doubled = sparse.coo_matrix(
        (np.ones(len(rows), np.int8), (rows, cols)), shape=(2 * nf, 2 * nf))
    _, comp2 = connected_components(doubled, directed=False)

    simple = sparse.coo_matrix(
        (np.ones(len(fa), np.int8), (fa, fb)), shape=(nf, nf))
    ncomp, comp1 = connected_components(simple, directed=False)
    _, rep = np.unique(comp1, return_index=True)  # lowest face per comp
    rep_keep_cluster = comp2[rep * 2]
    flip = comp2[np.arange(nf) * 2] != rep_keep_cluster[comp1]
    nonorientable = comp2[rep * 2] == comp2[rep * 2 + 1]
    flip &= ~nonorientable[comp1]
    faces[flip] = faces[flip][:, ::-1]

    tri = vertices[faces]
    vols = np.einsum("ij,ij->i", tri[:, 0], np.cross(tri[:, 1], tri[:, 2])) / 6.0
    compvol = np.bincount(comp1, weights=vols, minlength=ncomp)
    flip2 = (compvol < 0)[comp1]
    faces[flip2] = faces[flip2][:, ::-1]
    return faces


def _fix_normals_bfs(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Reference implementation (edge-map BFS) — kept as the oracle for
    tests and the scipy-free fallback."""
    faces = faces.copy()
    nf = len(faces)
    if nf == 0:
        return faces
    edge_map = defaultdict(list)
    for i, (a, b, c) in enumerate(faces):
        for u, v in ((a, b), (b, c), (c, a)):
            edge_map[(min(u, v), max(u, v))].append(i)

    visited = np.zeros(nf, dtype=bool)
    for seed in range(nf):
        if visited[seed]:
            continue
        component = [seed]
        visited[seed] = True
        queue = deque([seed])
        while queue:
            i = queue.popleft()
            a, b, c = faces[i]
            for u, v in ((a, b), (b, c), (c, a)):
                for j in edge_map[(min(u, v), max(u, v))]:
                    if visited[j]:
                        continue
                    # consistent winding: shared edge must appear in
                    # opposite directions in the two faces
                    ja, jb, jc = faces[j]
                    j_edges = ((ja, jb), (jb, jc), (jc, ja))
                    if (u, v) in j_edges:
                        faces[j] = faces[j][::-1]
                    visited[j] = True
                    component.append(j)
                    queue.append(j)
        comp = np.asarray(component)
        tri = vertices[faces[comp]]
        vol = np.einsum(
            "ij,ij->i", tri[:, 0], np.cross(tri[:, 1], tri[:, 2])
        ).sum() / 6.0
        if vol < 0:
            faces[comp] = faces[comp][:, ::-1]
    return faces


def faces_to_mesh(
    face_coords: np.ndarray,
    face_colors: Optional[np.ndarray] = None,
) -> Mesh:
    """(nf, 3, 3) possibly-NaN face coordinates -> cleaned Mesh.

    Mirrors the per-sample block in main.py:156-175.
    """
    face_coords = np.asarray(face_coords, dtype=np.float64)
    valid = ~np.isnan(face_coords[:, 0, 0])
    face_coords = face_coords[valid]
    vertices = face_coords.reshape(-1, 3)
    faces = np.arange(len(vertices), dtype=np.int64).reshape(-1, 3)

    vertices, faces = merge_vertices(vertices, faces)
    faces = remove_degenerate_and_duplicate_faces(faces)
    faces = fix_normals(vertices, faces)

    colors = None
    if len(faces):
        color = np.array([255, 165, 0, 255], dtype=np.uint8) if face_colors is None else face_colors
        colors = np.tile(color, (len(faces), 1))
    return Mesh(vertices=vertices, faces=faces, face_colors=colors)


def postprocess_faces(face_coords: np.ndarray, out_path: str) -> Mesh:
    """Clean generated faces and export to OBJ (main.py:163-174)."""
    from meshanything_tpu.geometry.obj_io import save_obj

    mesh = faces_to_mesh(face_coords)
    save_obj(mesh, out_path)
    return mesh
