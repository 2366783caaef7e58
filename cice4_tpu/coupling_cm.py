"""ACCESS-CM coupling adapter (full climate model: UM atmosphere + MOM
ocean via OASIS).

Pure-function equivalent of ``drivers/access-cm/cpl_interface.F90`` +
``cpl_forcing_handler.F90 set_sbc_ice:436-519``.  The ACCESS-CM ice
runs with ``calc_Tsfc = F``: the UM supplies per-category top/bottom
melt fluxes (tmlt/bmlt) and a latent heat flux, which map onto the
prescribed-flux thermodynamics inputs (`fsurfn_f`, `fcondtopn_f`,
`flatn_f` — ``CICE_RunMod.F90 set_sfcflux:787-920``), plus
aice-weighted wind stress consumed directly by the dynamics.

Field sets follow ``cpl_interface.F90:440-590`` (names truncated at 8
chars by OASIS convention); per-category fields are expanded
``tmlt01_i .. tmlt<ncat>_i`` etc.
"""

from __future__ import annotations

import jax.numpy as jnp

from cice4_tpu import constants as cn
from cice4_tpu.forcing import Forcing


def a2i_cm_fields(ncat: int = 5) -> tuple[str, ...]:
    """The UM -> ice receive set (``cpl_interface.F90:540-590``):
    8 scalar fluxes + 2*ncat category melts + 8 more scalars = 26
    fields at ncat=5 (31 with the optional co2/wnd/wme extras of some
    configurations)."""
    per_cat = [f"tmlt{k:02d}_i" for k in range(1, ncat + 1)] \
        + [f"bmlt{k:02d}_i" for k in range(1, ncat + 1)]
    return tuple(["thflx_i", "pswflx_i", "runoff_i", "wme_i", "rain_i",
                  "snow_i", "evap_i", "lhflx_i"] + per_cat
                 + ["taux_i", "tauy_i", "swflx_i", "lwflx_i", "shflx_i",
                    "press_i", "co2_ai", "wnd_ai"])


def i2a_cm_fields(ncat: int = 5) -> tuple[str, ...]:
    """The ice -> UM send set (``cpl_interface.F90:445-470``)."""
    out = ["isst_ia"]
    out += [f"icecon{k:02d}" for k in range(1, ncat + 1)]
    out += [f"snwthk{k:02d}" for k in range(1, ncat + 1)]
    out += [f"icethk{k:02d}" for k in range(1, ncat + 1)]
    out += ["uvel_ia", "vvel_ia", "co2_i2", "co2fx_i2"]
    return tuple(out)


def from_atm_cm(forcing: Forcing, a2i: dict, aicen) -> Forcing:
    """Map the UM receive set into the model Forcing
    (``set_sbc_ice:436-519``, UM section).

    `aicen` is the current category area (for distributing the GBM
    latent heat flux over categories).
    """
    ncat = aicen.shape[0]
    aice = jnp.sum(aicen, 0)
    tmlt = jnp.stack([a2i[f"tmlt{k:02d}_i"] for k in range(1, ncat + 1)])
    bmlt = jnp.stack([a2i[f"bmlt{k:02d}_i"] for k in range(1, ncat + 1)])

    # latent heat: distributed by category area fraction; all into
    # category 1 where there is no ice (conserved via sfcflux_to_ocn)
    lh = a2i["lhflx_i"]
    frac = jnp.where(aice > 0.0,
                     aicen / jnp.maximum(aice, cn.puny), 0.0)
    flatn_f = lh[None] * frac
    cat1 = jnp.zeros_like(flatn_f).at[0].set(jnp.where(aice > 0.0,
                                                       0.0, lh))
    flatn_f = flatn_f + cat1

    fsurfn_f = tmlt + bmlt
    fcondtopn_f = bmlt

    snow = jnp.maximum(aice * a2i["snow_i"], 0.0)
    rain = jnp.maximum(aice * a2i["rain_i"], 0.0)
    return forcing.replace(
        strax=a2i["taux_i"] * aice,
        stray=a2i["tauy_i"] * aice,
        fsnow=snow, frain=rain,
        fsurfn_f=fsurfn_f, fcondtopn_f=fcondtopn_f, flatn_f=flatn_f,
    )


def from_ocn_cm(forcing: Forcing, o2i: dict,
                meltlimit: float | None = None):
    """Map the MOM receive set (``set_sbc_ice`` MOM section).  Returns
    (forcing, state_updates)."""
    frzmlt = o2i["pfmice_i"]
    if meltlimit is not None:
        frzmlt = jnp.maximum(frzmlt, meltlimit)
    forcing = forcing.replace(
        sss=o2i["sss_i"], uocn=o2i["ssu_i"], vocn=o2i["ssv_i"],
        ss_tltx=o2i["sslx_i"], ss_tlty=o2i["ssly_i"])
    return forcing, dict(sst=o2i["sst_i"], frzmlt=frzmlt)


def into_atm_cm(state) -> dict:
    """Assemble the ice -> UM send set (``get_i2a_fields``): SST (K),
    per-category concentration / snow and ice thickness, ice
    velocity."""
    ncat = state.aicen.shape[0]
    safe_a = jnp.maximum(state.aicen, cn.puny)
    has = state.aicen > cn.puny
    out = {"isst_ia": state.sst + cn.Tffresh}
    for k in range(ncat):
        out[f"icecon{k + 1:02d}"] = state.aicen[k]
        out[f"snwthk{k + 1:02d}"] = jnp.where(
            has[k], state.vsnon[k] / safe_a[k], 0.0)
        out[f"icethk{k + 1:02d}"] = jnp.where(
            has[k], state.vicen[k] / safe_a[k], 0.0)
    out["uvel_ia"] = state.uvel
    out["vvel_ia"] = state.vvel
    out["co2_i2"] = jnp.zeros_like(state.sst)
    out["co2fx_i2"] = jnp.zeros_like(state.sst)
    return out
