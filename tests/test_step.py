"""End-to-end model step integration tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice4_tpu import constants as cn
from cice4_tpu.config import Config, DomainConfig, DynamicsConfig, \
    GridConfig, TransportConfig, gx3_config
from cice4_tpu.forcing import default_forcing
from cice4_tpu.grid import make_grid
from cice4_tpu.model import Model, make_step_fn
from cice4_tpu.state import init_state, make_itd_params


@pytest.fixture(scope="module")
def rect_model():
    cfg = Config(
        domain=DomainConfig(nx_global=24, ny_global=20),
        grid=GridConfig(grid_type="rectangular", lat_origin=71.35),
        dynamics=DynamicsConfig(ndte=40),
        transport=TransportConfig(advection="upwind"),
    )
    grid = make_grid(cfg, dtype=jnp.float64)
    model = Model.create(cfg)
    itd = model.itd
    state = init_state(cfg, grid, itd, dtype=jnp.float64)
    return cfg, grid, model, state


def test_step_runs_and_stays_finite(rect_model):
    cfg, grid, model, state = rect_model
    f = default_forcing(grid.ny, grid.nx, jnp.float64)
    f = f.replace(uatm=f.uatm + 5.0, wind=f.wind + 5.0,
                  swvdr=f.swvdr + 50.0, swvdf=f.swvdf + 50.0,
                  swidr=f.swidr + 30.0, swidf=f.swidf + 30.0)
    step = make_step_fn(model)
    s = state
    for k in range(3):
        s, fluxes = step(s, grid, f, 80.0 + k / 24.0, (k % 24) * 3600.0)
    leaves, _ = jax.tree_util.tree_flatten(s)
    for leaf in leaves:
        assert bool(jnp.all(jnp.isfinite(leaf))), "non-finite state"
    a = np.asarray(jnp.sum(s.aicen, 0))
    assert a.max() <= 1.0 + 1e-9
    assert a.min() >= 0.0
    assert np.asarray(s.vicen).min() >= 0.0
    assert np.asarray(s.vsnon).min() >= 0.0
    # ice survived the cold steps
    assert a.max() > 0.5
    # fluxes sane
    assert np.isfinite(np.asarray(fluxes["fhocn"])).all()
    assert np.asarray(fluxes["fsens"]).max() < 500.0


def test_step_cold_growth(rect_model):
    """Very cold air, no sun: ice volume should increase via congelation."""
    cfg, grid, model, state = rect_model
    f = default_forcing(grid.ny, grid.nx, jnp.float64)
    f = f.replace(Tair=f.Tair * 0 + 233.0, potT=f.potT * 0 + 233.0,
                  flw=f.flw * 0 + 120.0)
    step = make_step_fn(model)
    s = state
    v0 = float(jnp.sum(s.vicen * grid.tarea))
    for k in range(3):
        s, fluxes = step(s, grid, f, 20.0, 0.0)
    v1 = float(jnp.sum(s.vicen * grid.tarea))
    assert v1 > v0
    assert np.asarray(fluxes["congel"]).max() > 0.0


def test_gx3_step(gx3_cfg):
    """One full step on the real gx3 displaced-pole grid."""
    cfg = gx3_cfg.replace(
        transport=TransportConfig(advection="upwind"),
        dynamics=DynamicsConfig(ndte=40, kstrength=1),
    )
    grid = make_grid(cfg, dtype=jnp.float64)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float64)
    f = default_forcing(grid.ny, grid.nx, jnp.float64)
    f = f.replace(uatm=f.uatm + 4.0, vatm=f.vatm + 2.0,
                  wind=f.wind + 4.5)
    step = make_step_fn(model)
    s, fluxes = step(state, grid, f, 1.0, 0.0)
    leaves, _ = jax.tree_util.tree_flatten(s)
    for leaf in leaves:
        assert bool(jnp.all(jnp.isfinite(leaf)))
    a = np.asarray(jnp.sum(s.aicen, 0))
    assert a.max() <= 1.0 + 1e-9
    # land stays empty
    assert np.all(a[~np.asarray(grid.tmask)] == 0.0)
    # NH and SH ice both present
    ulat = np.asarray(grid.ulat)
    assert a[ulat > np.deg2rad(75)].max() > 0.5
    assert a[ulat < np.deg2rad(-65)].max() > 0.5
