"""Incremental remapping tests: conservation, monotonicity, accuracy
vs upwind (mirrors the reference's built-in checks:
``ice_transport_driver.F90 global_conservation:1147-1218``,
``check_monotonicity:1416+``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice4_tpu import constants as cn
from cice4_tpu.config import gx3_config
from cice4_tpu.grid import make_rect_grid
from cice4_tpu.ops.remap import transport_remap
from cice4_tpu.ops.transport import transport_upwind
from cice4_tpu.parallel.halo import BoundaryConditions
from cice4_tpu.state import make_itd_params, zeros_state


@pytest.fixture(scope="module")
def setup():
    cfg = gx3_config()
    bc = BoundaryConditions(ew="cyclic", ns="open")
    grid = make_rect_grid(48, 24, bc, dx=20.0e3, dy=20.0e3,
                          land_edges=False, dtype=jnp.float64)
    itd = make_itd_params(cfg)
    return cfg, grid, itd


def blob_state(cfg, grid, itd, u=0.2, v=0.0):
    """Gaussian blob of ice in category 2 moving east."""
    ny, nx = grid.ny, grid.nx
    s = zeros_state(cfg, grid, dtype=jnp.float64)
    x = jnp.arange(nx)[None, :]
    y = jnp.arange(ny)[:, None]
    blob = 0.8 * jnp.exp(-(((x - 12.0) / 4.0) ** 2
                           + ((y - 12.0) / 4.0) ** 2))
    aicen = jnp.zeros((itd.ncat, ny, nx), jnp.float64).at[2].set(blob)
    vicen = aicen * 2.0
    vsnon = aicen * 0.2
    qin = -2.0e8
    eicen = jnp.broadcast_to(qin * vicen[:, None] / itd.nilyr,
                             (itd.ncat, itd.nilyr, ny, nx))
    esnon = jnp.broadcast_to(-1.0e8 * vsnon[:, None],
                             (itd.ncat, itd.nslyr, ny, nx))
    tsfcn = jnp.where(aicen > cn.puny, -10.0, cn.Tocnfrz)
    trcrn = {"iage": jnp.where(aicen > cn.puny, 5.0e6, 0.0)}
    uvel = jnp.full((ny, nx), u, jnp.float64)
    vvel = jnp.full((ny, nx), v, jnp.float64)
    # zero velocity at the open north/south boundaries
    uvel = uvel.at[-1].set(0.0).at[0].set(0.0)
    vvel = vvel.at[-1].set(0.0).at[0].set(0.0)
    return s.replace(aicen=aicen, vicen=vicen, vsnon=vsnon, eicen=eicen,
                     esnon=esnon, tsfcn=tsfcn, trcrn=trcrn,
                     uvel=uvel, vvel=vvel)


def integrals(grid, s):
    ta = np.asarray(grid.tarea)
    return {
        "area": float((np.asarray(jnp.sum(s.aicen, 0)) * ta).sum()),
        "vice": float((np.asarray(jnp.sum(s.vicen, 0)) * ta).sum()),
        "vsno": float((np.asarray(jnp.sum(s.vsnon, 0)) * ta).sum()),
        "eice": float((np.asarray(jnp.sum(s.eicen, (0, 1))) * ta).sum()),
        "esno": float((np.asarray(jnp.sum(s.esnon, (0, 1))) * ta).sum()),
        "viage": float((np.asarray(jnp.sum(
            s.vicen * s.trcrn["iage"], 0)) * ta).sum()),
    }


def test_remap_conserves(setup):
    cfg, grid, itd = setup
    s = blob_state(cfg, grid, itd)
    before = integrals(grid, s)
    step = jax.jit(lambda st: transport_remap(st, grid, 3600.0))
    for _ in range(10):
        s, aice0 = step(s)
    after = integrals(grid, s)
    for k in before:
        assert np.isclose(before[k], after[k], rtol=1e-10), \
            (k, before[k], after[k])


def test_remap_monotone_and_bounded(setup):
    cfg, grid, itd = setup
    s = blob_state(cfg, grid, itd)
    a_max0 = float(jnp.max(s.aicen))
    h_max0 = 2.0
    step = jax.jit(lambda st: transport_remap(st, grid, 3600.0))
    for _ in range(20):
        s, aice0 = step(s)
    a = np.asarray(s.aicen)
    assert a.min() >= -1e-13
    assert a.max() <= a_max0 + 1e-10   # no new extrema in uniform flow
    has = a > cn.puny
    hi = np.where(has, np.asarray(s.vicen) / np.maximum(a, 1e-30), 0.0)
    assert hi.max() <= h_max0 * (1 + 1e-9)  # thickness stays monotone
    iage = np.asarray(s.trcrn["iage"])
    assert iage.max() <= 5.0e6 * (1 + 1e-9)
    assert iage.min() >= -1e-6


def test_remap_translates_blob(setup):
    """After t = N*dt of uniform flow the blob's center of mass moves
    u*t; remap should track this closely (2nd order)."""
    cfg, grid, itd = setup
    s = blob_state(cfg, grid, itd, u=0.2)
    dt = 3600.0
    nsteps = 20
    step = jax.jit(lambda st: transport_remap(st, grid, dt))
    for _ in range(nsteps):
        s, _ = step(s)
    a = np.asarray(s.aicen[2])
    x = np.arange(grid.nx)[None, :]
    com_x = (a * x).sum() / a.sum()
    expect = 12.0 + 0.2 * dt * nsteps / 20.0e3
    assert abs(com_x - expect) < 0.1  # within a tenth of a cell


def test_remap_less_diffusive_than_upwind(setup):
    cfg, grid, itd = setup
    dt = 3600.0
    s_r = blob_state(cfg, grid, itd, u=0.2)
    s_u = blob_state(cfg, grid, itd, u=0.2)
    step_r = jax.jit(lambda st: transport_remap(st, grid, dt))
    step_u = jax.jit(lambda st: transport_upwind(st, grid, dt))
    peak0 = float(jnp.max(s_r.aicen))
    for _ in range(20):
        s_r, _ = step_r(s_r)
        s_u, _ = step_u(s_u)
    # remap loses much less of the peak than donor-cell upwind
    loss_r = peak0 - float(jnp.max(s_r.aicen))
    loss_u = peak0 - float(jnp.max(s_u.aicen))
    assert loss_r < 0.6 * loss_u


def test_remap_zero_velocity_identity(setup):
    """Zero flow is an identity up to the reference's own sub-puny
    handling (state_to_tracers skips cells with area <= puny, zeroing
    their negligible volume — matching `ice_transport_driver.F90:
    847-1003`)."""
    cfg, grid, itd = setup
    s = blob_state(cfg, grid, itd, u=0.0, v=0.0)
    out, aice0 = transport_remap(s, grid, 3600.0)
    assert np.allclose(np.asarray(out.aicen), np.asarray(s.aicen),
                       atol=1e-14)
    sig = np.asarray(s.aicen) > cn.puny
    assert np.allclose(np.asarray(out.vicen)[sig],
                       np.asarray(s.vicen)[sig], atol=1e-14)
    assert np.abs(np.asarray(out.vicen)[~sig]).max() < 1e-10
    sig4 = np.broadcast_to(sig[:, None], s.eicen.shape)
    assert np.allclose(np.asarray(out.eicen)[sig4],
                       np.asarray(s.eicen)[sig4], rtol=1e-12)


def test_remap_midpoint_uniform_flow_identity(setup):
    """With spatially uniform velocity the midpoint velocity equals the
    corner velocity, so l_dp_midpt must not change the result."""
    cfg, grid, itd = setup
    s = blob_state(cfg, grid, itd, u=0.25, v=0.1)
    dt = 3600.0
    s1, a1 = jax.jit(lambda s: transport_remap(s, grid, dt, 2, False))(s)
    s2, a2 = jax.jit(lambda s: transport_remap(s, grid, dt, 2, True))(s)
    # interior is exactly invariant; the zeroed boundary rows create a
    # local shear handled by the midpoint interpolation, and its
    # influence reaches 3 rows in (corner -> midpoint stencil -> flux
    # cell), so compare away from them
    np.testing.assert_allclose(np.asarray(s1.aicen[:, 3:-3, :]),
                               np.asarray(s2.aicen[:, 3:-3, :]),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(s1.vicen[:, 3:-3, :]),
                               np.asarray(s2.vicen[:, 3:-3, :]),
                               rtol=0, atol=1e-13)


def test_remap_midpoint_conserves(setup):
    """Midpoint departure points preserve conservation under shear."""
    cfg, grid, itd = setup
    s = blob_state(cfg, grid, itd, u=0.2, v=0.0)
    # add a shear so the midpoint correction actually fires
    y = jnp.arange(grid.ny, dtype=jnp.float64)[:, None]
    uvel = s.uvel * (1.0 + 0.4 * jnp.sin(2 * jnp.pi * y / grid.ny))
    uvel = uvel.at[-1].set(0.0).at[0].set(0.0)
    s = s.replace(uvel=uvel)
    dt = 3600.0
    s2, _ = jax.jit(lambda s: transport_remap(s, grid, dt, 2, True))(s)
    i0 = integrals(grid, s)
    i2 = integrals(grid, s2)
    for k in ("area", "vice", "vsno", "eice"):
        np.testing.assert_allclose(i2[k], i0[k], rtol=1e-11,
                                   err_msg=k)
    a = np.asarray(jnp.sum(s2.aicen, 0))
    assert a.max() <= 1.0 + 1e-12 and a.min() >= -1e-14
