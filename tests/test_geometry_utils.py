"""GridMapInfo + misc geometry helper tests (reference: GridMapInfo2Dd used
to build pseudo grids, test_sparse_pseudo_input_gp.cpp:147-151)."""

import numpy as np

from erl_gaussian_process_tpu.geometry import GridMapInfo2D, GridMapInfo3D


def test_grid_round_trip():
    g = GridMapInfo2D([-2, -1], [2, 3], [8, 16])
    np.testing.assert_allclose(g.resolution, [0.5, 0.25])
    pts = g.generate_meter_coordinates()
    assert pts.shape == (8 * 16, 2)
    # centers are inside the box and round-trip through meter_to_grid
    assert (pts >= [-2, -1]).all() and (pts <= [2, 3]).all()
    idx = g.meter_to_grid(pts)
    np.testing.assert_allclose(g.grid_to_meter(idx), pts)
    # clipping
    assert (g.meter_to_grid([[99, 99]]) == [7, 15]).all()
    assert (g.meter_to_grid([[-99, -99]]) == [0, 0]).all()


def test_grid_3d_shape():
    g = GridMapInfo3D([0, 0, 0], [1, 1, 1], [4, 5, 6])
    pts = g.generate_meter_coordinates(flatten=False)
    assert pts.shape == (4, 5, 6, 3)
    np.testing.assert_allclose(pts[0, 0, 0], [0.125, 0.1, 1 / 12])
