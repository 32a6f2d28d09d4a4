"""Marching-cubes iso-surface vs column heights.

VERDICT r1 #5: column heights are exact only for monotone columns; the
true α=0.5 surface must also handle overturning/detached interfaces
(the reference's VTK contour, /root/reference/main.py:770). These tests
check (a) agreement on monotone fields, (b) that marching cubes is right
and column heights are provably wrong on a synthetic overturning field.
"""

import numpy as np

from openfoam_tpp_tpu.mesh.geometry import build_box_geometry
from openfoam_tpp_tpu.post import isosurface as iso
from openfoam_tpp_tpu.post.interface import column_masks, surface_stats

GEOM = build_box_geometry(1.0, 1.0, 1.0, 1.0 / 24, z0=0.0)
HZ = GEOM.spacing[2]


def _fill_below(surface_z):
    """Sub-cell alpha field for a (possibly x-dependent) surface height."""
    x, y, z = GEOM.cell_centers()
    zz = z[None, None, :]
    s = np.broadcast_to(np.asarray(surface_z(x))[:, None, None], GEOM.shape)
    return np.clip((s - (zz - HZ / 2.0)) / HZ, 0.0, 1.0).astype(np.float32)


def test_tables_consistent():
    # Empty and full cubes produce no triangles; single-corner cases do.
    assert iso.TRI_TABLE[0, 0, 0] == -1
    assert iso.TRI_TABLE[255, 0, 0] == -1
    assert iso.TRI_TABLE[1, 0, 0] >= 0
    assert iso.N_EDGES == 19 and len(iso._CANON) == 7


def test_monotone_field_matches_columns():
    alpha = _fill_below(lambda x: 0.4 + 0.15 * x)  # tilted plane
    assert iso.columns_monotone(alpha, GEOM.fluid)

    zmax_c, zmin_c, zmean_c, _ = (
        float(v) for v in surface_stats(alpha, GEOM, *column_masks(GEOM)[:2])
    )
    zmax, zmin, zmean, n = iso.surface_stats_mc(alpha, GEOM)
    assert int(n) > 0
    assert abs(float(zmax) - zmax_c) < HZ
    assert abs(float(zmin) - zmin_c) < HZ
    assert abs(float(zmean) - zmean_c) < HZ

    pts, tris = iso.triangulate(alpha, GEOM)
    assert len(tris) > 0
    assert tris.max() < len(pts)
    # Triangulate dedupes the same canonical edge crossings the stats use.
    assert len(pts) == int(n)
    assert abs(pts[:, 2].max() - float(zmax)) < 1e-6
    # Surface points lie on the analytic plane to sub-cell accuracy.
    x_of = pts[:, 0]
    assert np.max(np.abs(pts[:, 2] - (0.4 + 0.15 * x_of))) < HZ


def test_overturning_field_columns_wrong_mc_right():
    """Water layer below 0.3 plus a detached blob at z ≈ 0.7: the column
    integral reports ~0.3 + blob thickness; the true surface top is the
    blob's top at ~0.75."""
    alpha = _fill_below(lambda x: 0.3 + 0.0 * x)
    x, y, z = GEOM.cell_centers()
    blob = (
        (np.abs(x[:, None, None]) < 0.2)
        & (np.abs(y[None, :, None]) < 0.2)
        & (np.abs(z[None, None, :] - 0.70) < 0.05)
    )
    alpha = np.where(blob, 1.0, alpha).astype(np.float32)
    assert not iso.columns_monotone(alpha, GEOM.fluid)

    zmax_col, *_ = surface_stats(alpha, GEOM, *column_masks(GEOM)[:2])
    zmax_mc, zmin_mc, _, n = iso.surface_stats_mc(alpha, GEOM)
    # True top of the geometry: blob top at 0.75.
    assert abs(float(zmax_mc) - 0.75) < 1.5 * HZ
    # Column heights are provably wrong here (0.3 + 0.1 blob ≈ 0.4).
    assert abs(float(zmax_col) - 0.75) > 5 * HZ
    # The base layer's surface is still seen by MC.
    assert abs(float(zmin_mc) - 0.30) < 1.5 * HZ

    pts, tris = iso.triangulate(alpha, GEOM)
    # Two disjoint surface components: base plane + blob shell.
    assert (pts[:, 2] > 0.6).any() and (pts[:, 2] < 0.4).any()
    assert len(pts) == int(n)


def test_triangulate_watertight_sphere():
    """A sphere of water: the MC area should approximate 4πr² (coarse),
    and every edge should be shared by exactly two triangles (watertight,
    consistent Kuhn diagonals across cube boundaries)."""
    x, y, z = GEOM.cell_centers()
    # NB: the box is centered in x/y (origin -0.5); the sphere sits at
    # (0, 0, 0.5) so it is fully interior.
    r2 = (
        x[:, None, None] ** 2
        + y[None, :, None] ** 2
        + (z[None, None, :] - 0.5) ** 2
    )
    alpha = (r2 < 0.3 ** 2).astype(np.float32)
    pts, tris = iso.triangulate(alpha, GEOM)
    assert len(tris) > 0
    edges = np.sort(
        np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]]),
        axis=1,
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all(), "iso-surface is not watertight"
    # Surface radius ≈ 0.3 everywhere.
    rad = np.linalg.norm(pts - np.array([0.0, 0.0, 0.5]), axis=1)
    assert np.max(np.abs(rad - 0.3)) < 1.2 * HZ
