"""Budget-closure diagnostics (``ice_diagnostics.F90
runtime_diags:105-844`` + ``init_mass_diags:853-927``).

The reference's primary regression instrument: heat / fresh-water /
salt budgets must close — the flux integrals over a step must equal
the change in the corresponding state integrals.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from cice4_tpu.config import (Config, DomainConfig, DynamicsConfig,
                              GridConfig, RunConfig)
from cice4_tpu.diagnostics import (find_points, format_diags,
                                   init_mass_diags, point_diags,
                                   runtime_diags)
from cice4_tpu.forcing import Forcing
from cice4_tpu.grid import make_grid
from cice4_tpu.io.forcing_data import AnalyticForcing
from cice4_tpu.model import Model, ice_step
from cice4_tpu.state import init_state


@pytest.fixture(scope="module")
def stepped():
    cfg = Config(
        domain=DomainConfig(nx_global=48, ny_global=40),
        grid=GridConfig(grid_type="rectangular", lat_origin=71.35),
        dynamics=DynamicsConfig(ndte=20),
    )
    grid = make_grid(cfg, dtype=jnp.float64)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float64)
    f = AnalyticForcing(cfg, grid, jnp.float64)(40.0, 0.0)

    @jax.jit
    def step(s):
        return ice_step(model, s, grid, f, 40.0, 0.0)

    # spin a few steps so every phase is active, then measure one
    for _ in range(3):
        state, _ = step(state)
    init_diag = init_mass_diags(state, grid)
    state, fluxes = step(state)
    return cfg, grid, state, f, fluxes, init_diag


def test_budget_closure(stepped):
    cfg, grid, state, f, fluxes, init_diag = stepped
    d = runtime_diags(state, grid, fluxes=fluxes, forcing=f,
                      init_diag=init_diag, dt=cfg.run.dt,
                      update_ocn_f=cfg.thermo.update_ocn_f)
    # ferrmax-style closure thresholds (reference aborts on violation;
    # heat tolerance is looser: small terms — brine/meltpond enthalpy,
    # SW absorbed in open water — are excluded by the reference too)
    assert abs(float(d["werr_n"])) < 1e-7, "fresh-water budget open"
    assert abs(float(d["serr_n"])) < 1e-7, "salt budget open"
    assert abs(float(d["herr_n"])) < 1e-3, "heat budget open"


def test_state_block_and_strength(stepped):
    cfg, grid, state, f, fluxes, init_diag = stepped
    d = runtime_diags(state, grid, fluxes=fluxes)
    assert float(d["max_strength_n"]) > 0.0   # no longer hardwired 0
    assert float(d["area_n"]) > 0.0
    assert float(d["rms_speed_n"]) >= 0.0
    txt = format_diags(4, d)
    assert "max strength" in txt and "total ice area" in txt


def test_full_table_formats(stepped):
    cfg, grid, state, f, fluxes, init_diag = stepped
    d = runtime_diags(state, grid, fluxes=fluxes, forcing=f,
                      init_diag=init_diag, dt=cfg.run.dt)
    txt = format_diags(4, d)
    assert "water flux error" in txt
    assert "heat error" in txt
    assert "salt flux error" in txt


def test_point_diags(stepped):
    cfg, grid, state, f, fluxes, init_diag = stepped
    pts = find_points(grid, ((90.0, 0.0), (72.0, -160.0)))
    assert len(pts) == 2
    pd = point_diags(state, grid, fluxes, f, cfg.run.dt, pts)
    assert pd[0]["aice"] >= 0.0
    assert "fcondtop" in pd[0]


def test_diags_jittable(stepped):
    """runtime_diags must stay traceable (driver jits it)."""
    cfg, grid, state, f, fluxes, init_diag = stepped
    fn = jax.jit(lambda s, fx, ff, di: runtime_diags(
        s, grid, fluxes=fx, forcing=ff, init_diag=di, dt=cfg.run.dt))
    d = fn(state, fluxes, f, init_diag)
    assert jnp.isfinite(d["herr_n"])
