"""Grid loader and metric tests (vs reference popgrid/rectgrid semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cice4_tpu import constants as cn
from cice4_tpu.grid import make_rect_grid, to_tgrid, to_ugrid
from cice4_tpu.parallel.halo import BoundaryConditions


def test_gx3_loads(gx3_grid):
    g = gx3_grid
    assert g.shape == (116, 100)
    # latitudes within bounds, radians
    assert float(jnp.max(g.ulat)) < np.pi / 2 + 1e-6
    assert float(jnp.min(g.ulat)) > -np.pi / 2 - 1e-6
    # ocean fraction of gx3 is ~65%
    frac = float(jnp.mean(g.hm))
    assert 0.5 < frac < 0.8
    # areas positive over ocean
    assert float(jnp.min(jnp.where(g.tmask, g.tarea, 1.0))) > 0
    # gx3 cells are ~(100-300 km)^2
    typ = float(jnp.median(g.dxt))
    assert 5.0e4 < typ < 5.0e5


def test_gx3_total_ocean_area(gx3_grid):
    # Earth ocean area ~3.6e14 m^2; displaced-pole gx3 should be close
    total = float(jnp.sum(gx3_grid.tarea * gx3_grid.hm))
    assert 2.5e14 < total < 4.5e14


def test_umask_subset_of_tmask_neighbors(gx3_grid):
    g = gx3_grid
    # U point is ocean only if all 4 surrounding T cells are ocean
    assert bool(jnp.all(g.uvm <= g.hm))


def test_rectgrid_metrics():
    bc = BoundaryConditions(ew="cyclic", ns="open")
    g = make_rect_grid(16, 12, bc, dx=1000.0, dy=2000.0, dtype=jnp.float64)
    assert np.allclose(np.asarray(g.dxt), 1000.0)
    assert np.allclose(np.asarray(g.dyt), 2000.0)
    assert np.allclose(np.asarray(g.tarea), 2.0e6)
    # land rows top/bottom
    assert np.all(np.asarray(g.hm)[:2] == 0)
    assert np.all(np.asarray(g.hm)[-2:] == 0)
    assert np.all(np.asarray(g.hm)[2:-2] == 1)


def test_t2u_roundtrip_uniform():
    """A uniform field is a fixed point of T->U on a uniform grid interior."""
    bc = BoundaryConditions(ew="cyclic", ns="open")
    g = make_rect_grid(16, 12, bc, dx=1000.0, dy=1000.0, land_edges=False,
                       dtype=jnp.float64)
    f = jnp.ones((12, 16), jnp.float64)
    u = to_ugrid(g, f)
    # interior rows exact (top row sees zero ghosts)
    assert np.allclose(np.asarray(u)[:-1], 1.0, atol=1e-12)
    t = to_tgrid(g, u)
    assert np.allclose(np.asarray(t)[1:-1], 1.0, atol=1e-12)


def test_coriolis_sign(gx3_grid):
    g = gx3_grid
    north = np.asarray(g.fcor)[np.asarray(g.ulat) > 0.1]
    south = np.asarray(g.fcor)[np.asarray(g.ulat) < -0.1]
    assert np.all(north > 0)
    assert np.all(south < 0)


def test_panarctic_grid_loader(tmp_path):
    """panarctic regional grid: single 8-record binary incl. in-file
    land mask (``ice_grid.F90 panarctic_grid:848-967``)."""
    import os

    import numpy as np

    from cice4_tpu.config import (Config, DomainConfig, DynamicsConfig,
                                  GridConfig)
    from cice4_tpu.grid import make_grid

    ny, nx = 12, 10
    lat = np.deg2rad(70.0 + 0.5 * np.arange(ny))[:, None] * np.ones((1, nx))
    lon = np.deg2rad(10.0 * np.arange(nx))[None, :] * np.ones((ny, 1))
    kmt = np.ones((ny, nx)); kmt[:2] = 0.0
    htn = np.full((ny, nx), 25.0e5)   # cm
    hte = np.full((ny, nx), 30.0e5)
    ang = np.zeros((ny, nx))
    recs = np.stack([kmt, lat, lon, htn, hte, htn, hte, ang])
    path = str(tmp_path / "pips.grid")
    np.asarray(recs, ">f8").tofile(path)

    cfg = Config(
        domain=DomainConfig(nx_global=nx, ny_global=ny,
                            ew_boundary_type="open",
                            ns_boundary_type="open"),
        grid=GridConfig(grid_type="panarctic", grid_file=path),
        dynamics=DynamicsConfig(ndte=5),
    )
    import jax.numpy as jnp
    g = make_grid(cfg, dtype=jnp.float64)
    assert g.ny == ny and g.nx == nx
    assert float(g.hm[0, 0]) == 0.0 and float(g.hm[5, 5]) == 1.0
    np.testing.assert_allclose(float(g.dxu[5, 5]), 25.0e3, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g.ulat), lat, atol=1e-12)
    assert np.isfinite(np.asarray(g.tarea)).all()
    assert (np.asarray(g.tarea) > 0).all()

    # the regional grid steps end-to-end (thermo+dynamics, open BCs)
    from cice4_tpu.forcing import default_forcing
    from cice4_tpu.model import Model, ice_step
    from cice4_tpu.state import init_state
    import jax
    model = Model.create(cfg)
    state = init_state(cfg, grid=g, itd=model.itd, dtype=jnp.float64)
    f = default_forcing(ny, nx, jnp.float64)
    state2, fluxes = jax.jit(
        lambda s: ice_step(model, s, g, f, 80.0, 0.0))(state)
    assert np.isfinite(np.asarray(state2.aicen)).all()
    assert float(jnp.sum(state2.aicen)) > 0.0
