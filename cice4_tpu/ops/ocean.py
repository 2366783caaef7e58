"""Slab ocean mixed layer (``source/ice_ocean.F90 ocean_mixed_layer:64-234``).

Evolves SST from surface fluxes over open water plus the heat the ice
hands to the ocean, applies the deep heat flux qdp, and computes the
freezing/melting potential `frzmlt` (capped at +-1000 W/m^2).
"""

from __future__ import annotations

import jax.numpy as jnp

from cice4_tpu import constants as cn
from cice4_tpu.ops.atmo import atmo_boundary_const, atmo_boundary_layer

frzmlt_max = 1000.0
cprho = cn.cp_ocn * cn.rhow


def ocean_mixed_layer(dt, tmask, aice, sst, Tf, qdp, hmix,
                      uatm, vatm, wind, zlvl, potT, Qa, rhoa, flw,
                      swvdr, swvdf, swidr, swidf, fhocn, fswthru,
                      atmbndy="default"):
    """One mixed-layer update.  Returns dict(sst, frzmlt, qdp, and the
    open-ocean fluxes for history)."""
    if atmbndy == "constant":
        bl = atmo_boundary_const("ice", uatm, vatm, wind, rhoa)
        delt = jnp.zeros_like(sst)
        delq = jnp.zeros_like(sst)
    else:
        bl = atmo_boundary_layer("ocn", sst, potT, uatm, vatm, wind,
                                 zlvl, Qa, rhoa)
        delt, delq = bl["delt"], bl["delq"]

    swabs = ((1.0 - cn.albocn) * (swvdr + swidr + swvdf + swidf))
    TsfK = sst + cn.Tffresh
    flwout_ocn = -cn.stefan_boltzmann * TsfK**4
    fsens_ocn = bl["shcoef"] * delt
    flat_ocn = bl["lhcoef"] * delq
    evap_ocn = -flat_ocn / cn.Lvap

    hmix_safe = jnp.maximum(hmix, cn.puny)
    sst_new = sst + dt * (
        (fsens_ocn + flat_ocn + flwout_ocn + flw + swabs) * (1.0 - aice)
        + fhocn + fswthru) / (cprho * hmix_safe)

    qdp = jnp.where((sst_new <= Tf) & (qdp > 0.0), 0.0, qdp)
    sst_new = sst_new - qdp * dt / (cprho * hmix_safe)

    frzmlt = (Tf - sst_new) * cprho * hmix_safe / dt
    frzmlt = jnp.clip(frzmlt, -frzmlt_max, frzmlt_max)
    sst_new = jnp.maximum(sst_new, Tf)

    sst_new = jnp.where(tmask, sst_new, 0.0)
    frzmlt = jnp.where(tmask, frzmlt, 0.0)
    return dict(sst=sst_new, frzmlt=frzmlt, qdp=qdp,
                flwout_ocn=jnp.where(tmask, flwout_ocn, 0.0),
                fsens_ocn=jnp.where(tmask, fsens_ocn, 0.0),
                flat_ocn=jnp.where(tmask, flat_ocn, 0.0),
                evap_ocn=jnp.where(tmask, evap_ocn, 0.0),
                strairx_ocn=bl["strx"], strairy_ocn=bl["stry"],
                Tref_ocn=bl["Tref"], Qref_ocn=bl["Qref"])
