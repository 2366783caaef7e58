"""GFDL surface-flux package (ACCESS-OM coupled driver physics).

Validates against physical invariants and hand-computed limits of the
reference formulas (``drivers/access-om/surface_flux_mod.F90``,
``monin_obukhov_kernel.F90``, ``ocean_rough_mod.F90``,
``sat_vapor_pres_k_mod.F90``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cice4_tpu.ops import gfdl_flux as gf


def test_escomp_anchor_points():
    # Goff-Gratch at 0C should give ~611 Pa; at 100C ~101325 Pa
    es0 = float(gf.escomp(jnp.asarray(273.15)))
    assert abs(es0 - 611.0) < 5.0
    es100 = float(gf.escomp(jnp.asarray(373.15)))
    assert abs(es100 - 101325.0) < 500.0
    # blend region continuity: no jump at the -20C / 0C seams
    for T in (253.15, 273.15):
        lo = float(gf.escomp(jnp.asarray(T - 1e-3)))
        hi = float(gf.escomp(jnp.asarray(T + 1e-3)))
        assert abs(hi - lo) / hi < 1e-3
    # monotone in T
    Ts = jnp.linspace(230.0, 310.0, 200)
    es = np.asarray(gf.escomp(Ts))
    assert (np.diff(es) > 0).all()


def test_ocean_roughness_schemes():
    us = jnp.asarray([0.0, 0.05, 0.3, 1.0])
    for scheme in ("fixed", "charnock", "beljaars"):
        rm, rh, rq = gf.compute_ocean_roughness(us, scheme)
        assert (np.asarray(rm) >= gf.ROUGHNESS_MIN - 1e-12).all()
        assert np.isfinite(np.asarray(rm)).all()
    # charnock: z0 = a u*^2 / g for large u*
    rm, _, _ = gf.compute_ocean_roughness(jnp.asarray([1.0]), "charnock")
    assert abs(float(rm[0]) - gf.CHARNOCK * 1.0 / 9.80616) < 1e-6
    # beljaars viscous limit at u* -> 0: z0m -> zcom1*gnu^2/g? no —
    # ustar2 floors at gnu^2, so z0m = zcom1*gnu^2/g + zcom2*1
    rm, rh, rq = gf.compute_ocean_roughness(jnp.asarray([0.0]), "beljaars")
    expect = gf.ZCOM1 * gf.GNU**2 / 9.80616 + gf.ZCOM2
    assert abs(float(rm[0]) - expect) / expect < 1e-6


def test_mo_drag_neutral_log_law():
    # neutral stratification (thv_atm == thv_surf): cd = (k/ln(z/z0))^2
    z = jnp.full((4,), 10.0)
    z0 = jnp.full((4,), 1e-4)
    thv = jnp.full((4,), 280.0)
    speed = jnp.full((4,), 5.0)
    cd_m, cd_t, cd_q, us, bs = gf.mo_drag(thv, thv, z, z0, z0, z0,
                                          speed)
    expect = (0.4 / np.log(10.0 / 1e-4)) ** 2
    np.testing.assert_allclose(np.asarray(cd_m), expect, rtol=1e-3)
    # u_star = sqrt(cd)*speed; b_star ~ 0
    np.testing.assert_allclose(np.asarray(us),
                               np.sqrt(expect) * 5.0, rtol=1e-3)
    assert abs(float(bs[0])) < 1e-10


def test_mo_drag_stability_ordering():
    # unstable (surface warmer) must have larger drag than stable
    z = jnp.full((1,), 10.0)
    z0 = jnp.full((1,), 1e-4)
    speed = jnp.full((1,), 5.0)
    atm = jnp.full((1,), 280.0)
    cd_u, *_ = gf.mo_drag(atm, atm + 3.0, z, z0, z0, z0, speed)
    cd_n, *_ = gf.mo_drag(atm, atm, z, z0, z0, z0, speed)
    cd_s, *_ = gf.mo_drag(atm, atm - 3.0, z, z0, z0, z0, speed)
    assert float(cd_u[0]) > float(cd_n[0]) > float(cd_s[0])
    # strongly stable floors at drag_min
    cd_vs, *_ = gf.mo_drag(atm, atm - 40.0, z, z0, z0, z0,
                           jnp.full((1,), 0.1))
    assert float(cd_vs[0]) >= gf.DRAG_MIN - 1e-12


def test_surface_flux_directions():
    shp = (3, 4)
    mask = jnp.ones(shp, bool)
    t_atm = jnp.full(shp, 275.0)
    q_atm = jnp.full(shp, 0.003)
    u_atm = jnp.full(shp, 5.0)
    v_atm = jnp.zeros(shp)
    p = jnp.full(shp, 101325.0)
    z = jnp.full(shp, 10.0)
    t_surf = jnp.full(shp, 271.35)     # ocean colder than air
    r = jnp.full(shp, 1e-4)
    out = gf.surface_flux(t_atm, q_atm, u_atm, v_atm, p, z, p, t_surf,
                          jnp.zeros(shp), jnp.zeros(shp),
                          r, r, r, jnp.ones(shp), jnp.ones(shp), mask)
    # sensible heat: surface colder than (potential) air -> flux_t < 0
    assert (np.asarray(out["flux_t"]) < 0).all()
    # wind stress opposes relative wind: u_surf - u_atm < 0 -> flux_u < 0
    assert (np.asarray(out["flux_u"]) < 0).all()
    assert (np.asarray(out["flux_v"]) == 0).all()
    # LW up: sigma T^4
    np.testing.assert_allclose(np.asarray(out["flux_r"]),
                               5.67e-8 * 271.35**4, rtol=1e-2)
    # evaporation positive over warm-enough water (q_sat(ts) > q_atm)
    es = float(gf.escomp(jnp.asarray(271.35)))
    qsat = gf.d622 * es / (101325.0 - gf.d378 * es)
    assert (np.asarray(out["flux_q"]) > 0).all() == (qsat > 0.003)
    # derivative signs
    assert (np.asarray(out["dhdt_surf"]) > 0).all()
    assert (np.asarray(out["drdt_surf"]) > 0).all()


def test_gfdl_ocean_fluxes_wrapper():
    shp = (6, 8)
    tmask = jnp.ones(shp, bool).at[0].set(False)
    out = gf.gfdl_ocean_fluxes(
        tair=jnp.full(shp, 275.0), qair=jnp.full(shp, 0.004),
        uwnd=jnp.full(shp, 6.0), vwnd=jnp.full(shp, -2.0),
        press=jnp.full(shp, 101000.0), sst=jnp.full(shp, 274.0),
        ssu=jnp.zeros(shp), ssv=jnp.zeros(shp),
        u_star_prev=jnp.full(shp, 0.2), tmask=tmask)
    for k in ("sh", "lh", "lwo", "taox", "taoy", "u_star"):
        v = np.asarray(out[k])
        assert np.isfinite(v).all(), k
        assert (v[0] == 0).all(), f"{k} not masked on land"
    # signs for the ocean: lwo = -sigma T^4 < 0; taox opposite sign of
    # -(u_surf - u_atm) -> wind blowing +x => flux_u<0 => taox>0
    assert (np.asarray(out["lwo"])[1:] < 0).all()
    assert (np.asarray(out["taox"])[1:] > 0).all()
    assert (np.asarray(out["taoy"])[1:] < 0).all()
    # u_star for next step is positive over ocean
    assert (np.asarray(out["u_star"])[1:] > 0).all()
    # celsius SST input handled
    out2 = gf.gfdl_ocean_fluxes(
        tair=jnp.full(shp, 275.0), qair=jnp.full(shp, 0.004),
        uwnd=jnp.full(shp, 6.0), vwnd=jnp.full(shp, -2.0),
        press=jnp.full(shp, 101000.0), sst=jnp.full(shp, 0.85),
        ssu=jnp.zeros(shp), ssv=jnp.zeros(shp),
        u_star_prev=jnp.full(shp, 0.2), tmask=tmask)
    np.testing.assert_allclose(np.asarray(out2["lwo"])[1:],
                               -5.67e-8 * (273.15 + 0.85)**4, rtol=1e-2)


def test_ncar_ocean_fluxes_magnitudes():
    # L-Y neutral 10m drag at 8 m/s should be ~1.1e-3
    n = 4
    mask = jnp.ones((n,), bool)
    cd, ch, ce, us, bs = gf.ncar_ocean_fluxes(
        jnp.full((n,), 8.0), jnp.full((n,), 275.0),
        jnp.full((n,), 275.0), jnp.full((n,), 0.004),
        jnp.full((n,), 0.004), jnp.full((n,), 10.0), mask)
    assert 8e-4 < float(cd[0]) < 2e-3
    assert 0.2 < float(us[0]) < 0.5


def test_gaussian_runoff_regrid():
    """Masked conserving gaussian filter (gaussian_filter.F90)."""
    from cice4_tpu.ops.runoff_regrid import (convolve, gaussian_kernel,
                                             regrid_runoff)
    k = np.asarray(gaussian_kernel(1.5))
    assert k.shape == (13, 13)  # radius = int(4*1.5+0.5) = 6
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-12)
    assert k[6, 6] == k.max()

    ny, nx = 24, 32
    rng = np.random.default_rng(0)
    mask_np = (rng.random((ny, nx)) > 0.3).astype(float)
    mask_np[12, 16] = 1.0          # source cell must be active
    mask = jnp.asarray(mask_np)
    field = jnp.zeros((ny, nx)).at[12, 16].set(100.0) * mask

    out = convolve(field, gaussian_kernel(1.5), mask)
    out_np = np.asarray(out)
    # masked points unchanged
    np.testing.assert_array_equal(out_np[np.asarray(mask) == 0],
                                  np.asarray(field)[np.asarray(mask) == 0])
    # uniform field stays uniform on the active area (weight
    # redistribution property)
    uni = convolve(mask * 3.0, gaussian_kernel(1.5), mask)
    np.testing.assert_allclose(np.asarray(uni)[np.asarray(mask) > 0],
                               3.0, rtol=1e-6)
    # smoothing spreads the point source
    assert out_np.max() < 100.0
    assert (out_np > 0.01).sum() > 10
    # wrapper runs
    r = regrid_runoff(field, mask)
    assert np.isfinite(np.asarray(r)).all()
