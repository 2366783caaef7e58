"""Tests for linear ITD remapping, frazil growth, lateral melt, ridging."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice4_tpu import constants as cn
from cice4_tpu.config import DynamicsConfig, gx3_config
from cice4_tpu.grid import make_rect_grid
from cice4_tpu.ops import mechred, therm_itd
from cice4_tpu.parallel.halo import BoundaryConditions
from cice4_tpu.state import make_itd_params, zeros_state
from tests.test_itd import random_state, totals


@pytest.fixture(scope="module")
def setup():
    cfg = gx3_config()
    bc = BoundaryConditions(ew="cyclic", ns="open")
    grid = make_rect_grid(16, 12, bc, land_edges=False, dtype=jnp.float64)
    itd = make_itd_params(cfg)
    return cfg, grid, itd


def test_linear_itd_conserves(setup):
    cfg, grid, itd = setup
    s = random_state(cfg, grid, itd, seed=11)
    # simulate thermo growth: thickness grows 2% (area unchanged)
    aicen_init = s.aicen
    vicen_init = s.vicen / 1.02
    before = totals(s)
    out = jax.jit(lambda st: therm_itd.linear_itd(
        st, itd, aicen_init, vicen_init))(s)
    after = totals(out)
    for k in ["vice", "vsno", "eice", "esno", "viage"]:
        assert np.allclose(before[k], after[k], rtol=1e-9, atol=1e-8), k


def test_add_new_ice_volume(setup):
    cfg, grid, itd = setup
    s = random_state(cfg, grid, itd, seed=13)
    frzmlt = jnp.full((grid.ny, grid.nx), 200.0, jnp.float64)  # W/m^2
    Tf = jnp.full_like(frzmlt, -1.8)
    before_v = np.asarray(jnp.sum(s.vicen, 0))
    out, diag = jax.jit(lambda st: therm_itd.add_new_ice(
        st, itd, cfg, 3600.0, frzmlt, Tf, grid.tmask))(s)
    after_v = np.asarray(jnp.sum(out.vicen, 0))
    dv_expect = 200.0 * 3600.0 / (cn.rhoi * cn.Lfresh)
    assert np.allclose(after_v - before_v, dv_expect, rtol=1e-9)
    assert np.allclose(np.asarray(diag["frazil"]), dv_expect, rtol=1e-9)
    # total area stays <= 1
    assert np.asarray(jnp.sum(out.aicen, 0)).max() <= 1.0 + 1e-12


def test_add_new_ice_no_frzmlt(setup):
    cfg, grid, itd = setup
    s = random_state(cfg, grid, itd, seed=17)
    frzmlt = jnp.full((grid.ny, grid.nx), -50.0, jnp.float64)  # melting
    Tf = jnp.full_like(frzmlt, -1.8)
    out, diag = therm_itd.add_new_ice(s, itd, cfg, 3600.0, frzmlt, Tf,
                                      grid.tmask)
    assert np.allclose(np.asarray(out.vicen), np.asarray(s.vicen))


def test_lateral_melt_conserves(setup):
    cfg, grid, itd = setup
    s = random_state(cfg, grid, itd, seed=19)
    rside = jnp.full((grid.ny, grid.nx), 0.25, jnp.float64)
    dt = 3600.0
    before = totals(s)
    out, flux = therm_itd.lateral_melt(s, itd, dt, rside)
    after = totals(out)
    dmass = (cn.rhoi * (before["vice"] - after["vice"])
             + cn.rhos * (before["vsno"] - after["vsno"]))
    assert np.allclose(dmass, np.asarray(flux["fresh"]) * dt, rtol=1e-10)
    de = (before["eice"] - after["eice"]) + (before["esno"] - after["esno"])
    assert np.allclose(de, np.asarray(flux["fhocn"]) * dt, rtol=1e-10)
    assert np.allclose(np.asarray(out.aicen), 0.75 * np.asarray(s.aicen))


def test_ridge_ice_closes_area(setup):
    """Convergent deformation must ridge the pack back to asum = 1 and
    conserve volume/energy (up to snow handed to the ocean)."""
    cfg, grid, itd = setup
    dyn = DynamicsConfig()
    s = random_state(cfg, grid, itd, seed=23)
    # scale areas so total is ~0.95 (so there is open water to close)
    scale = 0.95 / np.asarray(jnp.sum(s.aicen, 0)).max()
    s = s.replace(aicen=s.aicen * scale, vicen=s.vicen * scale,
                  vsnon=s.vsnon * scale, eicen=s.eicen * scale,
                  esnon=s.esnon * scale)
    dt = 3600.0
    rdg_conv = jnp.full((grid.ny, grid.nx), 1.0e-6, jnp.float64)  # 1/s
    rdg_shear = jnp.full_like(rdg_conv, 5.0e-7)
    before = totals(s)
    out, diag = jax.jit(lambda st: mechred.ridge_ice(
        st, itd, dyn, dt, rdg_conv, rdg_shear, grid.tmask))(s)
    after = totals(out)
    # ice volume and energy conserved exactly
    assert np.allclose(before["vice"], after["vice"], rtol=1e-9), "vice"
    assert np.allclose(before["eice"], after["eice"], rtol=1e-9), "eice"
    # snow mass: lost part went to the ocean as fresh water
    dsnow = cn.rhos * (before["vsno"] - after["vsno"])
    assert np.allclose(dsnow, np.asarray(diag["fresh"]) * dt, rtol=1e-8,
                       atol=1e-8)
    desno = before["esno"] - after["esno"]
    assert np.allclose(desno, np.asarray(diag["fhocn"]) * dt, rtol=1e-8,
                       atol=1e-6)
    # area + open water sums to 1
    asum = np.asarray(jnp.sum(out.aicen, 0))
    assert asum.max() <= 1.0 + 1e-9
    # ridging happened
    assert np.asarray(diag["dvirdgdt"]).max() > 0.0
    # ridged ice is thicker: mean thickness increased
    h_before = before["vice"].sum() / np.asarray(jnp.sum(s.aicen, 0)).sum()
    h_after = after["vice"].sum() / asum.sum()
    assert h_after > h_before
