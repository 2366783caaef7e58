"""Forcing engine tests: record bracketing, interpolation, derived
fields, wind rotation, precipitation units, ocean climatology +
restoring — against synthetic files in the reference's rda8 layout
(``ice_forcing.F90 read_data:869-1021``, ``prepare_forcing:1530-1809``,
``ocn_data_clim``)."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from cice4_tpu import constants as cn
from cice4_tpu.calendar import Calendar
from cice4_tpu.config import Config, gx3_config
from cice4_tpu.grid import make_rect_grid
from cice4_tpu.io import forcing_data as fd
from cice4_tpu.parallel.halo import BoundaryConditions
from cice4_tpu.state import init_state, make_itd_params

NY, NX = 8, 8


def _write_rda8(path, records):
    """records: (nrec, ny, nx) -> big-endian f8 direct access."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.asarray(records, ">f8").tofile(path)


def _make_cfg(tmp, **forcing_kw):
    cfg = gx3_config()
    dom = dataclasses.replace(cfg.domain, nx_global=NX, ny_global=NY)
    fc = dataclasses.replace(cfg.forcing, atm_data_dir=str(tmp),
                             ocn_data_dir=str(tmp), **forcing_kw)
    return dataclasses.replace(cfg, domain=dom, forcing=fc)


def _grid():
    bc = BoundaryConditions(ew="cyclic", ns="open")
    return make_rect_grid(NX, NY, bc, dx=20.0e3, dy=20.0e3,
                          land_edges=False, dtype=jnp.float64)


def _cal(year=1997, yday=1.0, sec=0.0, year_init=1997):
    cal = Calendar(dt=3600.0, year_init=year_init)
    cal.time = ((year - year_init) * 365.0 + yday - 1.0) * 86400.0 + sec
    cal._recompute()
    return cal


def _write_ncar_flat(tmp, year=1997, ny=NY, nx=NX):
    """Flat-layout NCAR files: 6-hourly records hold their 1-based
    record number; monthly files hold 100*month."""
    recs6 = np.arange(1, 1461, dtype=np.float64)[:, None, None] \
        * np.ones((ny, nx))
    for stem, scale in (("t_10", 260.0), ("q_10", 0.001),
                        ("dn10", 1.3), ("u_10", 0.0), ("v_10", 0.0)):
        data = recs6 * (0.001 if stem == "q_10" else 1.0)
        if stem in ("t_10",):
            data = 230.0 + 0.01 * recs6
        if stem == "q_10":
            data = 1e-6 * recs6
        if stem == "dn10":
            data = 1.3 + 0 * recs6
        _write_rda8(os.path.join(tmp, f"{stem}.{year}.dat"), data)
    mon = np.arange(1, 13, dtype=np.float64)[:, None, None] \
        * np.ones((ny, nx))
    _write_rda8(os.path.join(tmp, f"swdn.{year}.dat"), 10.0 * mon)
    _write_rda8(os.path.join(tmp, f"cldf.{year}.dat"), 0.05 * mon)
    _write_rda8(os.path.join(tmp, f"prec.{year}.dat"), 5.0 * mon)


def test_sixhourly_bracketing_and_interp(tmp_path):
    _write_ncar_flat(tmp_path)
    cfg = _make_cfg(tmp_path, atm_data_type="ncar")
    grid = _grid()
    prov = fd.NcarBulkForcing(cfg, grid, jnp.float64)
    assert prov.available

    # NCEP convention: record r holds conditions at r*6h.  At
    # yday=1, sec=0 the bracketing records are 1460 (persist -> rec 1
    # dup rule) and 1; at sec=21600 exactly record 1.
    cal = _cal(yday=1.0, sec=21600.0)
    f = prov(cal.yday, cal.sec, cal=cal)
    # Tair = 230 + 0.01*rec, exactly rec 1 at 6h
    np.testing.assert_allclose(np.asarray(f.Tair)[0, 0], 230.0 + 0.01,
                               rtol=1e-6)
    # halfway between records 1 and 2 at 9h
    cal = _cal(yday=1.0, sec=21600.0 + 10800.0)
    f = prov(cal.yday, cal.sec, cal=cal)
    np.testing.assert_allclose(np.asarray(f.Tair)[0, 0],
                               230.0 + 0.01 * 1.5, rtol=1e-6)


def test_monthly_midmonth_interpolation(tmp_path):
    _write_ncar_flat(tmp_path)
    cfg = _make_cfg(tmp_path, atm_data_type="ncar")
    grid = _grid()
    prov = fd.NcarBulkForcing(cfg, grid, jnp.float64)

    # exactly mid-January (day 15, sec 0): pure January record;
    # fsw file holds 10*month, and ncar applies the 0.92 bias factor,
    # so the 4 SW bands sum to 10 * 0.92.
    cal = _cal(yday=15.0, sec=0.0)
    f = prov(cal.yday, cal.sec, cal=cal)
    fsw = np.asarray(f.swvdr + f.swvdf + f.swidr + f.swidf)[0, 0]
    np.testing.assert_allclose(fsw, 10.0 * 0.92, rtol=1e-6)

    # exactly mid-February: pure February record
    cal = _cal(yday=46.0, sec=0.0)
    f = prov(cal.yday, cal.sec, cal=cal)
    fsw = np.asarray(f.swvdr + f.swvdf + f.swidr + f.swidf)[0, 0]
    np.testing.assert_allclose(fsw, 20.0 * 0.92, rtol=1e-6)


def test_precip_units_and_rain_snow_split(tmp_path):
    _write_ncar_flat(tmp_path)
    cfg = _make_cfg(tmp_path, atm_data_type="ncar",
                    precip_units="mm_per_month")
    grid = _grid()
    prov = fd.NcarBulkForcing(cfg, grid, jnp.float64)
    cal = _cal(yday=15.0, sec=0.0)
    f = prov(cal.yday, cal.sec, cal=cal)
    # prec file holds 5*month (mm/month); January -> 5 mm/month
    expect = 5.0 * 12.0 / (86400.0 * 365.0)
    # Tair = 230ish < 0C -> all snow
    np.testing.assert_allclose(np.asarray(f.fsnow)[0, 0], expect,
                               rtol=1e-6)
    assert float(jnp.max(f.frain)) == 0.0


def test_ncar_bias_corrections_and_pw79_longwave(tmp_path):
    _write_ncar_flat(tmp_path)
    cfg = _make_cfg(tmp_path, atm_data_type="ncar")
    grid = _grid()
    prov = fd.NcarBulkForcing(cfg, grid, jnp.float64)
    # exactly mid-January (sec=0) so cldf is the pure January record
    cal = _cal(yday=15.0, sec=0.0)
    f = prov(cal.yday, cal.sec, cal=cal)
    Tair = np.asarray(f.Tair)[0, 0]
    Qa = np.asarray(f.Qa)[0, 0]
    # Qa = raw * 0.94
    raw_q = 1e-6 * (Tair - 230.0) / 0.01  # same record as Tair
    np.testing.assert_allclose(Qa, raw_q * 0.94, rtol=1e-6)
    # Parkinson & Washington longwave from cldf (0.05 in January)
    cldf = 0.05
    expect_flw = (cn.stefan_boltzmann * Tair**4
                  * (1.0 - 0.261 * np.exp(-7.77e-4
                                          * (cn.Tffresh - Tair)**2))
                  * (1.0 + 0.275 * cldf))
    np.testing.assert_allclose(np.asarray(f.flw)[0, 0], expect_flw,
                               rtol=1e-6)


def test_wind_rotation_by_anglet(tmp_path):
    _write_ncar_flat(tmp_path)
    # overwrite winds: u=1, v=0 geographic
    _write_rda8(os.path.join(tmp_path, "u_10.1997.dat"),
                np.ones((1460, NY, NX)))
    _write_rda8(os.path.join(tmp_path, "v_10.1997.dat"),
                np.zeros((1460, NY, NX)))
    cfg = _make_cfg(tmp_path, atm_data_type="ncar")
    grid = _grid()
    # rotate the grid by 30 degrees everywhere
    ang = 30.0 * np.pi / 180.0
    grid = dataclasses.replace(
        grid, anglet=jnp.full((NY, NX), ang, jnp.float64))
    prov = fd.NcarBulkForcing(cfg, grid, jnp.float64)
    cal = _cal(yday=10.0, sec=21600.0)
    f = prov(cal.yday, cal.sec, cal=cal)
    np.testing.assert_allclose(np.asarray(f.uatm), np.cos(ang), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f.vatm), -np.sin(ang), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f.wind), 1.0, rtol=1e-6)


def test_year_cycling(tmp_path):
    """ycycle=2: model year 1998 reads forcing year 1998 files; model
    year 1999 cycles back to 1997 (``init_forcing_atmo`` fyear)."""
    _write_ncar_flat(tmp_path, year=1997)
    _write_ncar_flat(tmp_path, year=1998)
    # distinguish the two years via Tair offset
    recs6 = np.arange(1, 1461, dtype=np.float64)[:, None, None] \
        * np.ones((NY, NX))
    _write_rda8(os.path.join(tmp_path, "t_10.1998.dat"),
                280.0 + 0.01 * recs6)
    cfg = _make_cfg(tmp_path, atm_data_type="ncar", fyear_init=1997,
                    ycycle=2)
    grid = _grid()
    prov = fd.NcarBulkForcing(cfg, grid, jnp.float64)

    cal = _cal(year=1998, yday=10.0, sec=21600.0)
    f = prov(cal.yday, cal.sec, cal=cal)
    assert 275.0 < float(f.Tair[0, 0]) < 285.0   # 1998 file

    cal = _cal(year=1999, yday=10.0, sec=21600.0)
    f = prov(cal.yday, cal.sec, cal=cal)
    assert 225.0 < float(f.Tair[0, 0]) < 235.0   # cycled to 1997 file


def test_lyq_qa_fix_and_aomip_sw(tmp_path):
    """LYq: Qa capped at ice saturation; AOMIP shortwave positive in
    daylight; Rosati-Miyakoda flw finite."""
    recs6 = np.ones((1460, NY, NX))
    _write_rda8(os.path.join(tmp_path, "t_10.1997.dat"), 265.0 * recs6)
    _write_rda8(os.path.join(tmp_path, "q_10.1997.dat"), 0.05 * recs6)
    _write_rda8(os.path.join(tmp_path, "u_10.1997.dat"), 1.0 * recs6)
    _write_rda8(os.path.join(tmp_path, "v_10.1997.dat"), 0.0 * recs6)
    mon = np.ones((12, NY, NX))
    _write_rda8(os.path.join(tmp_path, "cldf.omip.dat"), 0.5 * mon)
    _write_rda8(os.path.join(tmp_path, "prec.nmyr.dat"), 1e-5 * mon)
    cfg = _make_cfg(tmp_path, atm_data_type="LYq")
    grid = _grid()
    prov = fd.LYqForcing(cfg, grid, jnp.float64)
    assert prov.available
    cal = _cal(yday=172.0, sec=43200.0)
    f = prov(cal.yday, cal.sec, cal=cal)
    # Qa_fixLY caps the absurd 0.05 kg/kg at ice saturation (~1e-3)
    assert float(jnp.max(f.Qa)) < 0.01
    assert np.isfinite(np.asarray(f.flw)).all()
    fsw = np.asarray(f.swvdr + f.swvdf + f.swidr + f.swidf)
    assert fsw.max() > 0.0
    # mm/s precip passes through unconverted
    np.testing.assert_allclose(
        np.asarray(f.fsnow + f.frain)[0, 0], 1e-5, rtol=1e-6)


def test_ocean_clim_and_sst_restoring(tmp_path):
    mon = np.ones((12, NY, NX))
    sss = mon * np.arange(30, 42)[:, None, None]  # month-dependent
    _write_rda8(os.path.join(tmp_path, "sss.mm.8x8.da"), sss)
    _write_rda8(os.path.join(tmp_path, "sst.mm.8x8.da"), 2.0 * mon)
    cfg = _make_cfg(tmp_path, sss_data_type="clim", sst_data_type="clim",
                    restore_sst=True, trestore=90)
    grid = _grid()
    ocn = fd.OceanClimForcing(cfg, grid, jnp.float64)
    assert ocn.available

    sss0, Tf0, sst0 = ocn.initial_fields(month=1)
    np.testing.assert_allclose(np.asarray(sss0), np.mean(np.arange(30, 42)))
    np.testing.assert_allclose(np.asarray(Tf0),
                               -cn.depressT * np.asarray(sss0))
    # sst clamped to >= Tf
    assert float(jnp.min(sst0)) >= float(jnp.min(Tf0))

    # restoring nudges prognostic sst toward the climatology
    itd = make_itd_params(cfg)
    state = init_state(cfg, grid, itd, dtype=jnp.float64)
    state = state.replace(sst=jnp.full((NY, NX), -1.5, jnp.float64))
    cal = _cal(yday=15.0)
    dt = 3600.0
    new = ocn.ocean_update(state, cal, dt)
    expect = -1.5 + (2.0 - (-1.5)) * dt / (90 * 86400.0)
    np.testing.assert_allclose(np.asarray(new.sst)[0, 0], expect,
                               rtol=1e-6)


def test_monthly_dataset_prescribed_stress(tmp_path):
    mon = np.ones((12, NY, NX))
    _write_rda8(os.path.join(tmp_path, "cldf.omip.dat"), 0.5 * mon)
    _write_rda8(os.path.join(tmp_path, "prec.nmyr.dat"), 1e-5 * mon)
    for stem, val in (("t_10", 260.0), ("q_10", 1e-4), ("strx", 0.1),
                      ("stry", 0.0), ("wind", 5.0)):
        _write_rda8(os.path.join(tmp_path, f"{stem}.1997.dat"), val * mon)
    # MonthlyForcing flat names: tair/qa/strax/stray/wind
    for a, b in (("t_10", "tair"), ("q_10", "qa"), ("strx", "strax"),
                 ("stry", "stray")):
        os.replace(os.path.join(tmp_path, f"{a}.1997.dat"),
                   os.path.join(tmp_path, f"{b}.1997.dat"))
    cfg = _make_cfg(tmp_path, atm_data_type="monthly")
    grid = _grid()
    prov = fd.MonthlyForcing(cfg, grid, jnp.float64)
    assert prov.available
    cal = _cal(yday=15.0)
    f = prov(cal.yday, cal.sec, cal=cal)
    np.testing.assert_allclose(np.asarray(f.strax), 0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f.wind), 5.0, rtol=1e-6)


def test_ecmwf_daily_interpolation(tmp_path):
    """ECMWF daily records + monthly climatological rhoa/precip
    (``ECMWF_data:2316-2474``): mid-day-centered linear interpolation."""
    nrec = 365
    t = np.linspace(250.0, 280.0, nrec)[:, None, None] \
        * np.ones((1, NY, NX))
    for stem, val in (("tair", t), ("qa", t * 0 + 0.003),
                      ("ucmp", t * 0 + 3.0), ("vcmp", t * 0 - 1.0),
                      ("sol", t * 0 + 50.0), ("flo", t * 0 + 260.0)):
        _write_rda8(tmp_path / f"{stem}_1997.r", val)
    clim = np.ones((12, NY, NX))
    _write_rda8(tmp_path / "prec_lanl_12.r", clim * 1.0e-7)
    _write_rda8(tmp_path / "rhoa_ncar85-88_12.r", clim * 1.25)
    cfg = _make_cfg(tmp_path, atm_data_type="ecmwf",
                    precip_units="mm_per_sec")
    grid = _grid()
    prov = fd.EcmwfForcing(cfg, grid, jnp.float64)
    assert prov.available
    # noon day 10: exactly record 10 (mid-interval located)
    f = prov(10.0, 43200.0, cal=_cal(yday=10.0, sec=43200.0))
    np.testing.assert_allclose(float(f.Tair[0, 0]), t[9, 0, 0],
                               rtol=1e-12)
    np.testing.assert_allclose(float(f.rhoa[0, 0]), 1.25, rtol=1e-12)
    # midnight day 11: halfway between records 10 and 11
    f2 = prov(11.0, 0.0, cal=_cal(yday=11.0, sec=0.0))
    np.testing.assert_allclose(float(f2.Tair[0, 0]),
                               0.5 * (t[9, 0, 0] + t[10, 0, 0]),
                               rtol=1e-12)
    assert float(f2.flw[0, 0]) == pytest.approx(260.0)


def test_hadgem_monthly_nc(tmp_path):
    """HadGEM monthly netCDF reader (``hadgem_data:3051-3297``):
    dataset-provided rain/snow split and mid-month interpolation."""
    from scipy.io import netcdf_file
    os.makedirs(tmp_path / "MONTHLY", exist_ok=True)
    vals = {"rainfall": 2.0e-8, "snowfall": 3.0e-8, "u_10": 4.0,
            "v_10": -2.0, "SW_incoming": 80.0, "LW_incoming": 270.0,
            "t_10": 265.0, "rho_10": 1.3, "q_10": 0.002}
    for name, v in vals.items():
        path = tmp_path / "MONTHLY" / f"{name}.1997.nc"
        with netcdf_file(str(path), "w") as nc:
            nc.createDimension("time", 12)
            nc.createDimension("nj", NY)
            nc.createDimension("ni", NX)
            var = nc.createVariable(name, "d", ("time", "nj", "ni"))
            data = np.ones((12, NY, NX)) * v
            data *= (1.0 + 0.1 * np.arange(12))[:, None, None]
            var[:] = data
    cfg = _make_cfg(tmp_path, atm_data_type="hadgem")
    grid = _grid()
    prov = fd.HadgemForcing(cfg, grid, jnp.float64)
    assert prov.available
    # Jan 15 00:00 == exactly the January record (factor 1.0)
    f = prov(15.0, 0.0, cal=_cal(yday=15.0, sec=0.0))
    np.testing.assert_allclose(float(f.Tair[0, 0]), 265.0, rtol=1e-10)
    np.testing.assert_allclose(float(f.frain[0, 0]), 2.0e-8, rtol=1e-10)
    np.testing.assert_allclose(float(f.fsnow[0, 0]), 3.0e-8, rtol=1e-10)
    np.testing.assert_allclose(float(f.flw[0, 0]), 270.0, rtol=1e-10)


def test_rct_hourly_column(tmp_path):
    """rct hourly Barrow dataset broadcast over the grid
    (``rct_data:2066-2226``) incl. the Hyland-Wexler Qa derivation."""
    from scipy.io import netcdf_file

    def col_file(name, fields):
        with netcdf_file(str(tmp_path / name), "w") as nc:
            nc.createDimension("time", 48)
            nc.createDimension("ni", 1)
            for var, series in fields.items():
                v = nc.createVariable(var, "d", ("time", "ni"))
                v[:] = np.asarray(series)[:, None]

    hours = np.arange(48)
    col_file("hourlymet_brw1989_5yr.nc",
             {"Tair": 260.0 + 0.1 * hours, "Uatm": 5.0 + 0 * hours,
              "Vatm": 0.0 * hours})
    col_file("hourlysolar_brw1989_5yr.nc", {"fsw": 10.0 + hours})
    col_file("hourlymet_rh_5yr.nc", {"rh": 80.0 + 0 * hours})
    cfg = _make_cfg(tmp_path, atm_data_type="rct")
    grid = _grid()
    prov = fd.RctForcing(cfg, grid, jnp.float64)
    assert prov.available
    cal = _cal(yday=1.0, sec=7200.0)
    cal.istep = 3
    f = prov(1.0, 7200.0, cal=cal)
    np.testing.assert_allclose(float(f.Tair[3, 4]), 260.0 + 0.2,
                               rtol=1e-12)
    np.testing.assert_allclose(float(f.uatm[0, 0]), 5.0)
    # Qa positive and small; spatially uniform
    qa = np.asarray(f.Qa)
    assert 1e-5 < qa[0, 0] < 5e-3 and np.ptp(qa) == 0.0
    total_sw = float(f.swvdr[0, 0] + f.swvdf[0, 0]
                     + f.swidr[0, 0] + f.swidf[0, 0])
    np.testing.assert_allclose(total_sw, 12.0, rtol=1e-6)


def test_daily_year_boundary_bracketing(tmp_path):
    """Year-crossing rules for daily records (advisor round-4 finding;
    reference ``read_data:869-1021``): on day 1 the SECOND bracketing
    record is always the current year's record 1 (not next year's),
    and at the end of fyear_final the last record persists instead of
    wrapping to Jan 1 of the same year."""
    nrec = 365
    for year, base in ((1997, 1000.0), (1998, 2000.0)):
        vals = (base + np.arange(1, nrec + 1, dtype=np.float64)
                )[:, None, None] * np.ones((1, NY, NX))
        _write_rda8(tmp_path / f"v_{year}.r", vals)
    cfg = _make_cfg(tmp_path, fyear_init=1997, ycycle=2)
    grid = _grid()
    ds = fd._FileDataset(cfg, grid)
    pathfn = lambda y: str(tmp_path / f"v_{y}.r")

    # midnight Jan 1 of year 2: halfway between 1997 rec 365 and
    # 1998 rec 1 (the bug read rec 1 from 1999, which doesn't exist /
    # would be wrong data)
    cal = _cal(year=1998, yday=1.0, sec=0.0)
    v = float(ds.read_daily(pathfn, cal)[0, 0])
    assert v == pytest.approx(0.5 * (1365.0 + 2001.0))

    # end of the final cycle year: 18:00 Dec 31 1998 sits between
    # rec 365 and the PERSISTED rec 365 (reference n4=ixx), so the
    # value is exactly rec 365 of 1998
    cal = _cal(year=1998, yday=365.0, sec=64800.0)
    v = float(ds.read_daily(pathfn, cal)[0, 0])
    assert v == pytest.approx(2365.0)

    # mid-cycle Dec 31 1997 18:00: 1/4 weight on 1998 rec 1
    cal = _cal(year=1997, yday=365.0, sec=64800.0)
    v = float(ds.read_daily(pathfn, cal)[0, 0])
    assert v == pytest.approx(0.75 * 1365.0 + 0.25 * 2001.0)
