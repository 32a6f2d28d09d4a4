import numpy as np

from openfoam_tpp_tpu.mesh import build_box_geometry, build_tank_geometry


def test_flat_cylinder_volume():
    H, D, h = 0.1, 0.02, 0.002
    g = build_tank_geometry(H, D, h, geo="flat")
    vol = g.vfrac.sum() * g.cell_volume
    exact = np.pi * (D / 2) ** 2 * H
    # Solidified small cells trade volume both ways; ~2% on a 10-cell radius.
    assert abs(vol - exact) / exact < 0.05


def test_cap_cylinder_volume():
    H, D, h = 0.004, 0.0221, 0.0005
    g = build_tank_geometry(H, D, h, geo="cap")
    R = D / 2
    vol = g.vfrac.sum() * g.cell_volume
    exact = np.pi * R * R * H + (2.0 / 3.0) * np.pi * R ** 3
    assert abs(vol - exact) / exact < 0.06
    # Domain extends below z=0 for the cap.
    assert g.origin[2] < 0


def test_apertures_consistent():
    g = build_tank_geometry(0.05, 0.02, 0.002, geo="flat")
    solid = g.vfrac == 0.0
    # Faces adjacent to solid cells are closed.
    assert np.all(g.ax[1:-1][solid[:-1] | solid[1:]] == 0.0)
    assert np.all(g.ay[:, 1:-1][solid[:, :-1] | solid[:, 1:]] == 0.0)
    assert np.all(g.az[:, :, 1:-1][solid[:, :, :-1] | solid[:, :, 1:]] == 0.0)
    # Domain boundary walls closed except the atmosphere.
    assert np.all(g.ax[0] == 0) and np.all(g.ax[-1] == 0)
    assert np.all(g.az[:, :, 0] == 0)
    assert g.top_open.max() > 0
    # Top is open exactly where the top face aperture is open.
    assert np.array_equal(g.top_open, g.az[:, :, -1])


def test_top_lands_on_H():
    g = build_tank_geometry(0.1, 0.02, 0.003, geo="flat")
    z_top = g.origin[2] + g.shape[2] * g.spacing[2]
    assert abs(z_top - 0.1) < 1e-12


def test_box_geometry_closed():
    g = build_box_geometry(1.0, 0.5, 0.75, 0.25)
    assert g.shape == (4, 2, 3)
    assert g.top_open.max() == 0.0
    assert np.all(g.vfrac == 1.0)
