import numpy as np

from meshanything_tpu.geometry.marching import marching_tetrahedra
from meshanything_tpu.geometry.obj_io import Mesh
from meshanything_tpu.geometry.sdf import export_to_watertight, udf_grid


def _sphere_field(n=48, r=0.6):
    ax = np.linspace(-1, 1, n)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.sqrt(gx**2 + gy**2 + gz**2) - r


def test_marching_tetrahedra_sphere():
    n, r = 48, 0.6
    field = _sphere_field(n, r)
    verts, faces = marching_tetrahedra(field, 0.0)
    assert len(verts) > 100 and len(faces) > 100

    # vertices lie on the sphere of radius r (in grid coords)
    world = verts / (n - 1) * 2 - 1
    radii = np.linalg.norm(world, axis=-1)
    np.testing.assert_allclose(radii, r, atol=0.03)

    # closed surface: every edge is shared by exactly two faces
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all(), f"open edges: {(counts != 2).sum()}"


def test_udf_grid_cube():
    v = np.array(
        [[-0.5, -0.5, -0.5], [0.5, -0.5, -0.5], [0.5, 0.5, -0.5], [-0.5, 0.5, -0.5],
         [-0.5, -0.5, 0.5], [0.5, -0.5, 0.5], [0.5, 0.5, 0.5], [-0.5, 0.5, 0.5]]
    )
    f = np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
         [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]]
    )
    field = udf_grid(v, f, size=32)
    assert field.shape == (32, 32, 32)
    assert field.min() >= 0
    # center of the cube: distance to nearest face = 0.5 (within band approx)
    c = field[16, 16, 16]
    assert 0.3 < c  # far-field is approximate but bounded below by real distance - tri radius
    # point on the surface has ~zero distance
    ax = np.linspace(-1, 1, 32)
    ix = np.argmin(np.abs(ax - 0.5))
    iy = np.argmin(np.abs(ax))
    assert field[ix, iy, iy] < 0.08


def test_export_to_watertight_sphere_mesh():
    # build a coarse icosphere-ish mesh from marching a sphere, then
    # watertight it through the full reference pipeline semantics
    field = _sphere_field(32, 0.6)
    verts, faces = marching_tetrahedra(field, 0.0)
    world = verts / 31 * 2 - 1
    mesh = Mesh(vertices=world, faces=faces)

    out = export_to_watertight(mesh, octree_depth=5)
    assert len(out.faces) > 100
    # the shell sits at distance 2/32 from the 0.9-rescaled surface;
    # in original coordinates radius ~ 0.6 +/- shell offset / factor
    radii = np.linalg.norm(out.vertices, axis=-1)
    assert 0.4 < radii.mean() < 0.8
    # closed
    edges = np.concatenate([out.faces[:, [0, 1]], out.faces[:, [1, 2]], out.faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_marching_orientation_consistent_outward():
    """Every directed edge appears exactly once in each direction
    (consistent winding) and the enclosed signed volume is positive and
    matches the sphere (outward orientation) — the property that lets
    export_to_watertight skip normal repair entirely."""
    from collections import Counter

    n = 32
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    field = 0.7 - np.sqrt(X ** 2 + Y ** 2 + Z ** 2)

    v, f = marching_tetrahedra(field, 0.0)
    edges = Counter()
    for a, b, c in f:
        for u, w in ((a, b), (b, c), (c, a)):
            edges[(u, w)] += 1
    assert all(cnt == 1 for cnt in edges.values())
    assert all(edges.get((w, u), 0) == 1 for (u, w) in edges)

    verts = v / (n - 1) * 2 - 1
    tri = verts[f]
    vol = np.einsum("ij,ij->i", tri[:, 0], np.cross(tri[:, 1], tri[:, 2])).sum() / 6
    expected = 4 / 3 * np.pi * 0.7 ** 3
    assert abs(vol - expected) / expected < 0.05, vol


def test_watertight_128_grid_fast(rng):
    """The full --mc preprocessing (octree_depth=7 = 128^3 grid, the
    reference default) must run in seconds, not minutes — the round-1
    pure-Python fix_normals BFS on the marched shell was the trap."""
    import time

    from meshanything_tpu.geometry.obj_io import Mesh
    from meshanything_tpu.geometry.sample import sample_surface_with_normals
    from meshanything_tpu.geometry.sdf import export_to_watertight

    # icosphere-ish: random points on a sphere triangulated via convex hull
    # is overkill; a cube mesh marched at 128^3 produces a big shell too
    h = 0.5
    v = np.array([[-h, -h, -h], [h, -h, -h], [h, h, -h], [-h, h, -h],
                  [-h, -h, h], [h, -h, h], [h, h, h], [-h, h, h]])
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
                  [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]])
    t0 = time.time()
    wt = export_to_watertight(Mesh(v, f), octree_depth=7)
    pc = sample_surface_with_normals(wt.vertices, wt.faces, 4096, rng)
    elapsed = time.time() - t0
    assert len(wt.faces) > 50_000, len(wt.faces)  # it IS a big shell
    assert pc.shape == (4096, 6)
    # generous bound for the single shared CPU core (typical: ~40 s;
    # the round-1 BFS repair alone took many minutes at this size)
    assert elapsed < 180, f"--mc path took {elapsed:.1f}s"
