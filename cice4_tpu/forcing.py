"""Atmosphere/ocean forcing state passed to the model step.

The dense-field equivalent of the coupler-input section of
``source/ice_flux.F90:38-80`` (atm in + ocn in).  How these fields are
*produced* (file readers, time interpolation, analytic test profiles)
lives in :mod:`cice4_tpu.io.forcing_data`; the model step only sees
this pytree.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from cice4_tpu import constants as cn


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "zlvl", "uatm", "vatm", "wind", "potT", "Tair", "Qa", "rhoa",
        "flw", "swvdr", "swvdf", "swidr", "swidf", "frain", "fsnow",
        "sss", "uocn", "vocn", "ss_tltx", "ss_tlty", "qdp", "hmix",
        "fsurfn_f", "fcondtopn_f", "flatn_f", "strax", "stray",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Forcing:
    """All external forcing fields, (ny, nx) each."""

    # atmosphere
    zlvl: jax.Array    # atm level height (m)
    uatm: jax.Array    # wind velocity components (m/s)
    vatm: jax.Array
    wind: jax.Array    # wind speed (m/s)
    potT: jax.Array    # air potential temperature (K)
    Tair: jax.Array    # air temperature (K)
    Qa: jax.Array      # specific humidity (kg/kg)
    rhoa: jax.Array    # air density (kg/m^3)
    flw: jax.Array     # incoming longwave (W/m^2)
    swvdr: jax.Array   # sw down, visible, direct (W/m^2)
    swvdf: jax.Array   # sw down, visible, diffuse
    swidr: jax.Array   # sw down, near IR, direct
    swidf: jax.Array   # sw down, near IR, diffuse
    frain: jax.Array   # rainfall rate (kg/m^2/s)
    fsnow: jax.Array   # snowfall rate (kg/m^2/s)
    # ocean
    sss: jax.Array     # sea surface salinity (ppt)
    uocn: jax.Array    # ocean current at U points (m/s)
    vocn: jax.Array
    ss_tltx: jax.Array  # sea surface slope at U points (m/m)
    ss_tlty: jax.Array
    qdp: jax.Array     # deep ocean heat flux (W/m^2)
    hmix: jax.Array    # mixed layer depth (m)
    # coupled calc_Tsfc=F mode: prescribed per-category surface fluxes
    # ((ncat, ny, nx); None when the model computes them itself)
    # (CICE_RunMod.F90 set_sfcflux:787-920)
    fsurfn_f: jax.Array | None = None     # net surface flux excl. conductive
    fcondtopn_f: jax.Array | None = None  # downward conductive flux at top
    flatn_f: jax.Array | None = None      # latent heat flux
    # prescribed wind stress for calc_strair=F datasets (already rotated
    # to grid axes and aice-weighted per the coupled convention,
    # ``ice_dyn_evp.F90:255-277`` ACCESS branch)
    strax: jax.Array | None = None
    stray: jax.Array | None = None

    def replace(self, **kw) -> "Forcing":
        return dataclasses.replace(self, **kw)


def default_forcing(ny, nx, dtype=jnp.float32) -> Forcing:
    """Quiescent default forcing (cold, calm, dark)."""
    z = jnp.zeros((ny, nx), dtype)

    def f(v):
        return jnp.full((ny, nx), v, dtype)

    return Forcing(
        zlvl=f(10.0), uatm=z, vatm=z, wind=z, potT=f(253.0), Tair=f(253.0),
        Qa=f(0.0002), rhoa=f(1.3), flw=f(180.0),
        swvdr=z, swvdf=z, swidr=z, swidf=z, frain=z, fsnow=z,
        sss=f(34.0), uocn=z, vocn=z, ss_tltx=z, ss_tlty=z,
        qdp=z, hmix=f(20.0),
    )
