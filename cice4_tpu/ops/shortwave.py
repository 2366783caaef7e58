"""Shortwave radiation: CCSM3 albedos and Beer's-law absorption.

Dense JAX version of the CCSM3 path of ``source/ice_shortwave.F90``:
`compute_albedos` (``:564-780``), `constant_albedos`, and
`absorbed_solar` (``:974-1185``).  The delta-Eddington (`dEdd`)
multiple-scattering option lives in :mod:`cice4_tpu.ops.shortwave_dedd`.

All functions are per-category: inputs/outputs are (ny, nx) planes
((nilyr, ny, nx) for layer absorption); callers vmap or loop over
categories.
"""

from __future__ import annotations

import jax.numpy as jnp

from cice4_tpu import constants as cn
from cice4_tpu.config import RadiationConfig

i0vis = 0.70   # fraction of visible SW penetrating the surface
# albedo temperature-dependence constants (ice_shortwave.F90:632-640)
dT_mlt = 1.0
dalb_mlt = -0.075
dalb_mltv = -0.1
dalb_mlti = -0.15


def compute_albedos(rad: RadiationConfig, aicen, vicen, vsnon, tsfcn):
    """CCSM3 thickness/temperature-dependent albedos
    (``compute_albedos:564-780``).

    Returns dict of per-band ice (…ni) / snow (…ns) / combined albedos
    plus broadband `albin`/`albsn` history diagnostics.
    """
    has = aicen > cn.puny
    a_safe = jnp.maximum(aicen, cn.puny)
    hi = jnp.where(has, vicen / a_safe, 0.0)
    hs = jnp.where(has, vsnon / a_safe, 0.0)

    fhtan = jnp.arctan(rad.ahmax * 4.0)
    fh = jnp.minimum(jnp.arctan(hi * 4.0) / fhtan, 1.0)
    albo = cn.albocn * (1.0 - fh)
    alvdfni = rad.albicev * fh + albo
    alidfni = rad.albicei * fh + albo

    dTs = cn.Timelt - tsfcn
    fT = jnp.minimum(dTs / dT_mlt - 1.0, 0.0)
    alvdfni = jnp.maximum(alvdfni - dalb_mlt * fT, cn.albocn)
    alidfni = jnp.maximum(alidfni - dalb_mlt * fT, cn.albocn)

    snow = hs > cn.puny
    alvdfns = jnp.where(snow, rad.albsnowv - dalb_mltv * fT, cn.albocn)
    alidfns = jnp.where(snow, rad.albsnowi - dalb_mlti * fT, cn.albocn)

    alvdfni = jnp.where(has, alvdfni, cn.albocn)
    alidfni = jnp.where(has, alidfni, cn.albocn)
    alvdfns = jnp.where(has, alvdfns, cn.albocn)
    alidfns = jnp.where(has, alidfns, cn.albocn)

    asnow = jnp.where(snow & has, hs / (hs + cn.snowpatch), 0.0)

    out = dict(
        alvdrni=alvdfni, alidrni=alidfni, alvdfni=alvdfni, alidfni=alidfni,
        alvdrns=alvdfns, alidrns=alidfns, alvdfns=alvdfns, alidfns=alidfns,
        asnow=asnow,
    )
    for band_i, band_s, name in [("alvdfni", "alvdfns", "alvdfn"),
                                 ("alidfni", "alidfns", "alidfn"),
                                 ("alvdrni", "alvdrns", "alvdrn"),
                                 ("alidrni", "alidrns", "alidrn")]:
        out[name] = out[band_i] * (1.0 - asnow) + out[band_s] * asnow
    out["albin"] = jnp.where(has, cn.awtvdr * out["alvdrni"]
                             + cn.awtidr * out["alidrni"]
                             + cn.awtvdf * out["alvdfni"]
                             + cn.awtidf * out["alidfni"], 0.0)
    out["albsn"] = jnp.where(has, cn.awtvdr * out["alvdrns"]
                             + cn.awtidr * out["alidrns"]
                             + cn.awtvdf * out["alvdfns"]
                             + cn.awtidf * out["alidfns"], 0.0)
    return out


def constant_albedos(rad: RadiationConfig, aicen, vsnon, tsfcn):
    """`albedo_type = 'constant'` variant (``constant_albedos``)."""
    has = aicen > cn.puny
    hs = jnp.where(has, vsnon / jnp.maximum(aicen, cn.puny), 0.0)
    snow = hs > cn.puny
    awi = 0.44  # constant warm ice albedo (ice_shortwave.F90 constant path)
    aws = 0.75
    alb_i = jnp.where(has, awi, cn.albocn)
    alb_s = jnp.where(has & snow, aws, cn.albocn)
    asnow = jnp.where(snow & has, hs / (hs + cn.snowpatch), 0.0)
    comb = alb_i * (1.0 - asnow) + alb_s * asnow
    return dict(alvdrni=alb_i, alidrni=alb_i, alvdfni=alb_i, alidfni=alb_i,
                alvdrns=alb_s, alidrns=alb_s, alvdfns=alb_s, alidfns=alb_s,
                alvdrn=comb, alidrn=comb, alvdfn=comb, alidfn=comb,
                albin=jnp.where(has, alb_i, 0.0),
                albsn=jnp.where(has, alb_s, 0.0), asnow=asnow)


def absorbed_solar(nilyr, heat_capacity, aicen, vicen, vsnon,
                   swvdr, swvdf, swidr, swidf, alb):
    """Partition absorbed SW between surface, interior layers and
    transmission to the ocean (``absorbed_solar:974-1185``).

    Returns dict(fswsfc, fswint, fswthru, Iswabs[(nilyr, ny, nx)]).
    """
    has = aicen > cn.puny
    a_safe = jnp.maximum(aicen, cn.puny)
    hi = jnp.where(has, vicen / a_safe, 0.0)
    hs = jnp.where(has, vsnon / a_safe, 0.0)
    asnow = jnp.where((hs > cn.puny) & has, hs / (hs + cn.snowpatch), 0.0)

    def blend(sw, alb_ice, alb_snow):
        return sw * ((1.0 - alb_ice) * (1.0 - asnow)
                     + (1.0 - alb_snow) * asnow)

    swabsv = blend(swvdr, alb["alvdrni"], alb["alvdrns"]) \
        + blend(swvdf, alb["alvdfni"], alb["alvdfns"])
    swabsi = blend(swidr, alb["alidrni"], alb["alidrns"]) \
        + blend(swidf, alb["alidfni"], alb["alidfns"])
    swabs = swabsv + swabsi

    fswpen = (swvdr * (1.0 - alb["alvdrni"]) * (1.0 - asnow)
              + swvdf * (1.0 - alb["alvdfni"]) * (1.0 - asnow)) * i0vis
    fswsfc = swabs - fswpen

    hilyr = hi / nilyr
    k = jnp.arange(1, nilyr + 1, dtype=hi.dtype).reshape(
        (nilyr,) + (1,) * hi.ndim)
    tranbot = jnp.exp(-cn.kappav * hilyr[None] * k)
    trantop = jnp.concatenate([jnp.ones_like(tranbot[:1]), tranbot[:-1]], 0)
    Iswabs = fswpen[None] * (trantop - tranbot)
    fswthru = fswpen * tranbot[-1]
    fswint = fswpen - fswthru

    fswsfc = jnp.where(has, fswsfc, 0.0)
    fswint = jnp.where(has, fswint, 0.0)
    fswthru = jnp.where(has, fswthru, 0.0)
    Iswabs = jnp.where(has[None], Iswabs, 0.0)

    if not heat_capacity:
        fswsfc = fswsfc + fswint
        fswint = jnp.zeros_like(fswint)
        Iswabs = jnp.zeros_like(Iswabs)

    return dict(fswsfc=fswsfc, fswint=fswint, fswthru=fswthru,
                Iswabs=Iswabs)


def shortwave_ccsm3(rad: RadiationConfig, nilyr, nslyr, heat_capacity,
                    aicen, vicen, vsnon, tsfcn,
                    swvdr, swvdf, swidr, swidf):
    """Full CCSM3 shortwave driver for one category
    (``shortwave_ccsm3:377-541``).  CCSM3 absorbs no SW inside snow, so
    Sswabs is zero (only dEdd populates it)."""
    if rad.albedo_type == "constant":
        alb = constant_albedos(rad, aicen, vsnon, tsfcn)
    else:
        alb = compute_albedos(rad, aicen, vicen, vsnon, tsfcn)
    absorbed = absorbed_solar(nilyr, heat_capacity, aicen, vicen, vsnon,
                              swvdr, swvdf, swidr, swidf, alb)
    return {**alb, **absorbed,
            "Sswabs": jnp.zeros((nslyr,) + aicen.shape, aicen.dtype)}
