"""Wireframe preview renders (reference app.py:27-92).

matplotlib Poly3DCollection at the reference's two views
((90, 20) and (270, 20) azimuth/elevation) with the orange/brown color
scheme; used by the serving layer for previews.
"""
from __future__ import annotations

import numpy as np


def wireframe_render(vertices: np.ndarray, faces: np.ndarray, out_path: str,
                     views=((90, 20), (270, 20))) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    tri = np.asarray(vertices)[np.asarray(faces)]
    fig = plt.figure(figsize=(5 * len(views), 5))
    for i, (azim, elev) in enumerate(views):
        ax = fig.add_subplot(1, len(views), i + 1, projection="3d")
        coll = Poly3DCollection(tri, facecolor=(255 / 255, 165 / 255, 0 / 255, 1.0),
                                edgecolor=(139 / 255, 69 / 255, 19 / 255, 1.0),
                                linewidths=0.3)
        ax.add_collection3d(coll)
        lo = np.asarray(vertices).min() if len(vertices) else -1
        hi = np.asarray(vertices).max() if len(vertices) else 1
        ax.set_xlim(lo, hi)
        ax.set_ylim(lo, hi)
        ax.set_zlim(lo, hi)
        ax.view_init(elev=elev, azim=azim)
        ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
