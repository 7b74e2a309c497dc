"""Wireframe preview renders (reference app.py:27-92).

matplotlib Poly3DCollection at the reference's two views
((90, 20) and (270, 20) azimuth/elevation) with its exact style:
y/z axis swap, brownish-yellow faces (0.8, 0.5, 0.2), black edges
(linewidth 0.5), view centered on the mesh bounds, both views combined
side by side into one PNG.
"""
from __future__ import annotations

import numpy as np


def wireframe_render(vertices: np.ndarray, faces: np.ndarray, out_path: str,
                     views=((90, 20), (270, 20)), dpi: int = 120) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    vertices = np.asarray(vertices, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    # the reference renders with y and z swapped (app.py:31)
    if len(vertices):
        vertices = vertices[:, [0, 2, 1]]
        lo = vertices.min(axis=0)
        hi = vertices.max(axis=0)
        center = (lo + hi) / 2.0
        scale = (hi - lo).max()
    else:
        center = np.zeros(3)
        scale = 2.0
    tri = vertices[faces] if len(faces) else np.zeros((0, 3, 3))

    fig = plt.figure(figsize=(5 * len(views), 5))
    for i, (azim, elev) in enumerate(views):
        ax = fig.add_subplot(1, len(views), i + 1, projection="3d")
        ax.set_axis_off()
        ax.add_collection3d(Poly3DCollection(
            tri,
            facecolors=(0.8, 0.5, 0.2, 1.0),   # brownish yellow (app.py:51)
            edgecolors="k",
            linewidths=0.5,
        ))
        ax.set_xlim(center[0] - scale / 2, center[0] + scale / 2)
        ax.set_ylim(center[1] - scale / 2, center[1] + scale / 2)
        ax.set_zlim(center[2] - scale / 2, center[2] + scale / 2)
        ax.view_init(elev=elev, azim=azim)
    fig.tight_layout(pad=0)
    fig.savefig(out_path, dpi=dpi, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return out_path
