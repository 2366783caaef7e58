"""Coupled-mode tests: scale_fluxes, prep_radiation ordering, the
ACCESS-OM/CM adapters, and the ESMF-style component lifecycle.

Reference behavior: ``ice_flux.F90 scale_fluxes:776-888``,
``ice_step_mod.F90 prep_radiation:84-218``,
``drivers/access-cm/cpl_interface.F90`` + ``cpl_forcing_handler.F90``,
``drivers/esmf/CICE_ComponentMod.F90:58-214``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice4_tpu import constants as cn
from cice4_tpu.config import (Config, DomainConfig, DynamicsConfig,
                              GridConfig, RadiationConfig, RunConfig,
                              ThermoConfig, TransportConfig)
from cice4_tpu.forcing import default_forcing
from cice4_tpu.grid import make_grid
from cice4_tpu.model import Model, make_step_fn
from cice4_tpu.state import freezing_temperature, init_state


def _rect_cfg(**kw):
    return Config(
        domain=DomainConfig(nx_global=24, ny_global=20),
        grid=GridConfig(grid_type="rectangular", lat_origin=71.35),
        dynamics=DynamicsConfig(ndte=40),
        transport=TransportConfig(advection="upwind"),
        **kw,
    )


def _scale_extensive(state, factor):
    """Scale concentration + all extensive per-category fields by
    `factor`, preserving per-category thickness (intensive state)."""
    return state.replace(
        aicen=state.aicen * factor, vicen=state.vicen * factor,
        vsnon=state.vsnon * factor, eicen=state.eicen * factor,
        esnon=state.esnon * factor)


def test_scale_fluxes_per_ice_area_invariance():
    """scale_fluxes divides by aice: two states identical except for
    concentration (same per-category thickness) must hand the coupler
    the SAME per-unit-ice-area fluxes (``ice_flux.F90:776-888``)."""
    cfg = _rect_cfg()
    grid = make_grid(cfg, dtype=jnp.float64)
    model = Model.create(cfg)
    base = init_state(cfg, grid, model.itd, dtype=jnp.float64)
    f = default_forcing(grid.ny, grid.nx, jnp.float64)
    step = make_step_fn(model)

    outs = {}
    for factor in (0.6, 0.3):
        s = _scale_extensive(base, factor)
        _s1, fluxes = step(s, grid, f, 20.0, 0.0)
        outs[factor] = fluxes

    ice = np.asarray(jnp.sum(_scale_extensive(base, 0.3).aicen, 0)) > 0.0
    assert ice.any()
    for name in ("fsens", "flat", "flwout", "evap", "Tref", "Qref",
                 "fresh", "fsalt", "fhocn", "fswthru",
                 "alvdr", "alidr", "alvdf", "alidf",
                 "strairxT", "strairyT"):
        a = np.asarray(outs[0.6][name])[ice]
        b = np.asarray(outs[0.3][name])[ice]
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-9,
                                   err_msg=name)


def test_scale_fluxes_open_ocean_defaults():
    """Where aice == 0 the coupler sees the documented defaults:
    flwout = -sigma*(Tf+Tffresh)^4, Tref = Tair, Qref = Qa, zero
    stresses/albedos (``ice_flux.F90:866-886``)."""
    cfg = _rect_cfg()
    grid = make_grid(cfg, dtype=jnp.float64)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float64)
    # carve out an ice-free strip
    z = state.aicen.at[:, :, :6].set(0.0)
    state = state.replace(
        aicen=z, vicen=state.vicen.at[:, :, :6].set(0.0),
        vsnon=state.vsnon.at[:, :, :6].set(0.0),
        eicen=state.eicen.at[:, :, :, :6].set(0.0),
        esnon=state.esnon.at[:, :, :, :6].set(0.0))
    f = default_forcing(grid.ny, grid.nx, jnp.float64)
    step = make_step_fn(model)
    s1, fluxes = step(state, grid, f, 20.0, 0.0)

    empty = np.asarray(jnp.sum(s1.aicen, 0)) == 0.0
    empty &= np.asarray(grid.tmask)
    empty[:, 6:] = False
    assert empty.any()
    Tf = np.asarray(freezing_temperature(cfg, f.sss))
    want = -cn.stefan_boltzmann * (Tf + cn.Tffresh) ** 4
    np.testing.assert_allclose(np.asarray(fluxes["flwout"])[empty],
                               want[empty], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(fluxes["Tref"])[empty],
                               np.asarray(f.Tair)[empty])
    np.testing.assert_allclose(np.asarray(fluxes["Qref"])[empty],
                               np.asarray(f.Qa)[empty])
    for name in ("fsens", "alvdr", "alidf", "strairxT", "fresh"):
        assert np.all(np.asarray(fluxes[name])[empty] == 0.0), name


def test_prep_radiation_ordering():
    """Coupled ordering (prep_radiation=True): step 1 has no absorbed
    SW (nothing carried yet); once spun in, the trajectory tracks the
    standalone ordering under constant forcing
    (``ice_step_mod.F90 prep_radiation:84-218``)."""
    sunny = dict(swvdr=120.0, swvdf=60.0, swidr=80.0, swidf=40.0)

    results = {}
    for prep in (False, True):
        cfg = _rect_cfg(radiation=RadiationConfig(prep_radiation=prep))
        grid = make_grid(cfg, dtype=jnp.float64)
        model = Model.create(cfg)
        s = init_state(cfg, grid, model.itd, dtype=jnp.float64)
        f = default_forcing(grid.ny, grid.nx, jnp.float64)
        f = f.replace(**{k: jnp.full_like(f.swvdr, v)
                         for k, v in sunny.items()})
        step = make_step_fn(model)
        traj = []
        for k in range(4):
            s, fluxes = step(s, grid, f, 170.0, 43200.0)
            traj.append((s, fluxes))
        results[prep] = traj

    # step 1 coupled: zero absorbed SW (swn carried state starts empty)
    fswabs1 = np.asarray(results[True][0][1]["fswabs"])
    assert np.all(fswabs1 == 0.0)
    assert np.asarray(results[False][0][1]["fswabs"]).max() > 0.0
    # carried swn populated after a step
    assert "fswsfcn" in results[True][0][0].swn

    # after spin-in the two orderings agree closely (constant forcing)
    v_prep = np.asarray(jnp.sum(results[True][3][0].vicen, 0))
    v_std = np.asarray(jnp.sum(results[False][3][0].vicen, 0))
    np.testing.assert_allclose(v_prep, v_std, rtol=0.02, atol=1e-4)


def test_access_cm_adapter():
    """ACCESS-CM exchange: UM melt fluxes drive the prescribed-flux
    thermo (``cpl_forcing_handler.F90 set_sbc_ice:436-519``)."""
    from cice4_tpu import coupling_cm

    cfg = _rect_cfg(thermo=ThermoConfig(calc_Tsfc=False))
    grid = make_grid(cfg, dtype=jnp.float64)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float64)
    ncat = state.aicen.shape[0]

    names_a2i = coupling_cm.a2i_cm_fields(ncat)
    assert len(names_a2i) == 16 + 2 * ncat
    z = jnp.zeros((grid.ny, grid.nx), jnp.float64)
    a2i = {n: z for n in names_a2i}
    a2i.update({f"tmlt{k:02d}_i": z + 5.0 for k in range(1, ncat + 1)})
    a2i.update({f"bmlt{k:02d}_i": z - 2.0 for k in range(1, ncat + 1)})
    a2i["lhflx_i"] = z - 10.0
    a2i["snow_i"] = z + 1e-5
    a2i["taux_i"] = z + 0.1

    f = default_forcing(grid.ny, grid.nx, jnp.float64)
    f = coupling_cm.from_atm_cm(f, a2i, state.aicen)
    assert f.fsurfn_f is not None and f.fsurfn_f.shape[0] == ncat
    np.testing.assert_allclose(np.asarray(f.fsurfn_f), 3.0)
    np.testing.assert_allclose(np.asarray(f.fcondtopn_f), -2.0)

    o2i = {n: z for n in ("sst_i", "sss_i", "ssu_i", "ssv_i",
                          "sslx_i", "ssly_i", "pfmice_i")}
    o2i["sss_i"] = z + 33.0
    o2i["sst_i"] = z - 1.7
    f, upd = coupling_cm.from_ocn_cm(f, o2i)
    assert float(upd["sst"][0, 0]) == pytest.approx(-1.7)

    step = make_step_fn(model)
    state = state.replace(**{k: jnp.asarray(v) for k, v in upd.items()})
    s1, fluxes = step(state, grid, f, 80.0, 0.0)
    for leaf in jax.tree_util.tree_leaves(s1):
        assert bool(jnp.all(jnp.isfinite(leaf)))

    i2a = coupling_cm.into_atm_cm(s1)
    assert set(i2a) == set(coupling_cm.i2a_cm_fields(ncat))
    hi = np.asarray(i2a["icethk03"])
    assert np.isfinite(hi).all() and hi.max() > 0.0


def test_esmf_component_lifecycle(tmp_path):
    """init/run/finalize with import/export states
    (``CICE_ComponentMod.F90 CICE_SetServices:58-214``)."""
    from cice4_tpu.component import IceComponent
    from cice4_tpu.coupling import (A2I_FIELDS, I2A_FIELDS, I2O_FIELDS,
                                    O2I_FIELDS)

    cfg = _rect_cfg(run=RunConfig(
        npt=2, diagfreq=0, histfreq=("x",) * 5,
        history_dir=str(tmp_path), restart_dir=str(tmp_path),
        pointer_file=str(tmp_path / "ptr")))
    comp = IceComponent(cfg, flavor="om", dtype=jnp.float64,
                        log=lambda *a: None)
    services = comp.set_services()
    assert set(services) == {"init", "run", "finalize"}
    services["init"]()

    ny, nx = comp.runner.grid.ny, comp.runner.grid.nx
    z = jnp.zeros((ny, nx), jnp.float64)
    a2i = {n: z for n in A2I_FIELDS}
    a2i.update(tair_i=z + 253.0, qair_i=z + 2e-4, lwfld_i=z + 180.0,
               swfld_i=z + 80.0, uwnd_i=z + 3.0)
    o2i = {n: z for n in O2I_FIELDS}
    o2i.update(sss_i=z + 34.0, sst_i=z - 1.8)

    export = services["run"]({"a2i": a2i, "o2i": o2i}, n_steps=2)
    assert set(export["i2o"]) == set(I2O_FIELDS)
    assert set(export["i2a"]) == set(I2A_FIELDS)
    for name, v in {**export["i2o"], **export["i2a"]}.items():
        assert bool(jnp.all(jnp.isfinite(v))), name
    assert float(jnp.max(export["i2o"]["aice_io"])) > 0.0
    assert comp.runner.calendar.istep == 2
    services["finalize"]()


def test_cm_flavor_requires_prescribed_thermo():
    from cice4_tpu.component import IceComponent

    with pytest.raises(ValueError):
        IceComponent(_rect_cfg(), flavor="cm")


def test_om_component_gfdl_surface_flux(tmp_path):
    """Coupled OM interval with gfdl_surface_flux=T (the reference's
    default, ``cpl_parameters.F90:54``): open-water sh/lh/lw/stress in
    the i2o export come from the GFDL Monin-Obukhov package, with
    u_star carried across intervals (``gfdl_ocean_fluxes:925-1056``)."""
    from cice4_tpu.component import IceComponent
    from cice4_tpu.coupling import A2I_FIELDS, O2I_FIELDS

    cfg = _rect_cfg(run=RunConfig(
        npt=2, diagfreq=0, histfreq=("x",) * 5,
        history_dir=str(tmp_path), restart_dir=str(tmp_path),
        pointer_file=str(tmp_path / "ptr")))
    comp = IceComponent(cfg, flavor="om", dtype=jnp.float64,
                        log=lambda *a: None, gfdl_surface_flux=True)
    comp.initialize()
    ny, nx = comp.runner.grid.ny, comp.runner.grid.nx
    z = jnp.zeros((ny, nx), jnp.float64)
    a2i = {n: z for n in A2I_FIELDS}
    a2i.update(tair_i=z + 275.0, qair_i=z + 4e-3, lwfld_i=z + 300.0,
               swfld_i=z + 100.0, uwnd_i=z + 6.0, vwnd_i=z - 2.0,
               press_i=z + 1.013e5)
    o2i = {n: z for n in O2I_FIELDS}
    o2i.update(sss_i=z + 34.0, sst_i=z + 1.0)

    export = comp.run({"a2i": a2i, "o2i": o2i}, n_steps=1)
    # u_star was produced and carried for the next interval
    us = comp._boundary.u_star
    assert us is not None
    ocean = np.asarray(comp.runner.grid.tmask)
    assert (np.asarray(us)[ocean] > 0.0).all()
    # the rect test domain sits poleward of 70N, so aice ~ 1 and the
    # open-water weight (1-aice) is ~1e-4: the GFDL fluxes are engaged
    # but strongly downweighted — assert the mechanism fired (nonzero,
    # finite), not a magnitude
    shflx = np.asarray(export["i2o"]["shflx_io"])
    assert np.isfinite(shflx).all()
    assert np.abs(shflx[ocean]).max() > 1e-5
    # second interval reuses the carried u_star without error
    export2 = comp.run({"a2i": a2i, "o2i": o2i}, n_steps=1)
    assert np.isfinite(np.asarray(export2["i2o"]["strsu_io"])).all()


def test_into_ocn_gfdl_signs():
    """Sign conventions of the GFDL open-water export (the advisor's
    round-4 finding): along-wind stress must be exported POSITIVE
    (into the ocean, same direction as the wind), sensible heat from
    warm air over cold ocean must be exported NEGATIVE (= heat INTO
    the ocean, shflx_io positive-out convention), and net LW must be
    flw - sigma*T^4, not flw + sigma*T^4
    (``cpl_forcing_handler.F90 gfdl_ocean_fluxes:925-1056`` followed by
    the ``get_i2o_fluxes:689-780`` merge)."""
    from types import SimpleNamespace

    from cice4_tpu.coupling import gfdl_open_water_fluxes, into_ocn

    ny, nx = 4, 6
    z = jnp.zeros((ny, nx))
    sst = z + 1.0                       # cold ocean, 1 C
    state = SimpleNamespace(
        sst=sst, aicen=jnp.zeros((1, ny, nx)),
        strocnxT=z, strocnyT=z)
    forcing = SimpleNamespace(
        Tair=z + 288.0, Qa=z + 8e-3,     # warm moist air
        uatm=z + 8.0, vatm=z,            # +x wind over resting ocean
        uocn=z, vocn=z, frain=z, fsnow=z,
        flw=z + 300.0, press=z + 1.013e5, runof=None)
    tmask = jnp.ones((ny, nx), bool)
    gfdl = gfdl_open_water_fluxes(state, forcing, tmask)
    fluxes = {"aice": z, "fsalt": z, "fhocn": z, "fswthru": z,
              "fresh": z}
    i2o = into_ocn(fluxes, state, forcing, gfdl=gfdl)

    strsu = np.asarray(i2o["strsu_io"])
    shflx = np.asarray(i2o["shflx_io"])
    lwflx = np.asarray(i2o["lwflx_io"])
    # along-wind surface stress: positive, O(0.01-0.5 N/m^2)
    assert (strsu > 0.0).all(), strsu.min()
    assert strsu.max() < 1.0
    # warm air over cold ocean: downward sensible heat = heat INTO the
    # ocean = negative in the positive-out convention
    assert (shflx < 0.0).all(), shflx.max()
    # net LW into ocean = flw - sigma*Ts^4 (~300 - 311 < 0 here), and
    # certainly NOT flw + sigma*Ts^4 (~ +611)
    assert (lwflx < 50.0).all(), lwflx.max()
    assert (lwflx > -100.0).all()
    # pressure anomaly, not raw pressure (get_i2o tiopress)
    press = np.asarray(i2o["press_io"])
    assert np.allclose(press, 1300.0)


def test_coupler_boundary_u_star_restart(tmp_path):
    """u_star survives a dump/load round trip (the reference saves
    u_star0 in its restart so resumed runs keep the lagged roughness
    input)."""
    from cice4_tpu.coupling import CouplerBoundary

    b = CouplerBoundary.__new__(CouplerBoundary)
    b.u_star = jnp.full((3, 4), 0.23)
    path = str(tmp_path / "ustar.npz")
    b.dump(path)
    b2 = CouplerBoundary.__new__(CouplerBoundary)
    b2.load(path)
    assert np.allclose(np.asarray(b2.u_star), 0.23)
