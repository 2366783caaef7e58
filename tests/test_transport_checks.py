"""Transport guard checks and the l_fixed_area mode
(``ice_transport_driver.F90 global_conservation:1147-1218``,
``check_monotonicity:1416-1559``, ``ice_transport_remap.F90``
fixed-area midpoint shift ``:2352-2487``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice4_tpu import constants as cn
from cice4_tpu.config import gx3_config
from cice4_tpu.grid import make_rect_grid
from cice4_tpu.ops.remap import transport_remap
from cice4_tpu.parallel.halo import BoundaryConditions
from cice4_tpu.state import make_itd_params

from tests.test_remap import blob_state, integrals


@pytest.fixture(scope="module")
def setup():
    cfg = gx3_config()
    bc = BoundaryConditions(ew="cyclic", ns="open")
    grid = make_rect_grid(48, 24, bc, dx=20.0e3, dy=20.0e3,
                          land_edges=False, dtype=jnp.float64)
    itd = make_itd_params(cfg)
    return cfg, grid, itd


def test_checks_pass_on_clean_transport(setup):
    cfg, grid, itd = setup
    s = blob_state(cfg, grid, itd)
    step = jax.jit(lambda st: transport_remap(
        st, grid, 3600.0, conservation_check=True,
        monotonicity_check=True))
    for _ in range(5):
        s, aice0, guards = step(s)
        assert int(guards["transport global conservation"]["count"]) == 0
        assert int(guards["transport monotonicity"]["count"]) == 0, \
            float(guards["transport monotonicity"]["worst"])


def test_monotonicity_check_fires_on_corruption(setup):
    """Manufacture a violation: transport a state, then corrupt one
    tracer far outside its neighborhood bounds and re-check (the check
    compares post- to pre-transport fields of the same call, so the
    corruption is injected via the velocity instead: an absurd CFL>1
    velocity makes remap non-monotone)."""
    cfg, grid, itd = setup
    s = blob_state(cfg, grid, itd, u=0.2)
    # CFL > 1 breaks the scheme's monotonicity premise
    s = s.replace(uvel=jnp.full_like(s.uvel, 9.0),
                  vvel=jnp.zeros_like(s.vvel))
    out = jax.jit(lambda st: transport_remap(
        st, grid, 3600.0, monotonicity_check=True))(s)
    _, _, guards = out
    assert int(guards["transport monotonicity"]["count"]) > 0


def test_fixed_area_conserves_and_translates(setup):
    cfg, grid, itd = setup
    s = blob_state(cfg, grid, itd, u=0.2)
    before = integrals(grid, s)
    step = jax.jit(lambda st: transport_remap(st, grid, 3600.0,
                                              fixed_area=True))
    for _ in range(10):
        s, aice0 = step(s)
    after = integrals(grid, s)
    for k in before:
        assert np.isclose(before[k], after[k], rtol=1e-10), \
            (k, before[k], after[k])
    a = np.asarray(s.aicen[2])
    assert a.min() >= -1e-13
    x = np.arange(grid.nx)[None, :]
    com_x = (a * x).sum() / a.sum()
    expect = 12.0 + 0.2 * 3600.0 * 10 / 20.0e3
    assert abs(com_x - expect) < 0.1


def test_fixed_area_total_flux_is_prescribed(setup):
    """With l_fixed_area the AREA divergence equals the divergence of
    the prescribed edge fluxes exactly — for a uniform field (mass = 1
    everywhere, no gradient) the flux through each edge is edgearea, so
    a divergence-free velocity changes nothing."""
    cfg, grid, itd = setup
    s = blob_state(cfg, grid, itd, u=0.13)
    # uniform mass in one category, uniform (divergence-free) flow
    aicen = jnp.zeros_like(s.aicen).at[2].set(0.5)
    s = s.replace(aicen=aicen, vicen=aicen * 1.5, vsnon=aicen * 0.1,
                  uvel=jnp.full_like(s.uvel, 0.13),
                  vvel=jnp.zeros_like(s.vvel))
    # interior cells only (open NS boundary rows see zero ghosts)
    s2, _ = jax.jit(lambda st: transport_remap(st, grid, 3600.0,
                                               fixed_area=True))(s)
    a = np.asarray(s2.aicen[2])[2:-2, :]
    assert np.allclose(a, 0.5, atol=1e-12)
