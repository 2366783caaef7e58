"""Coupled-model boundary interface (ACCESS-OM / ACCESS-CM field sets).

Pure-function equivalent of the OASIS/PRISM coupling layer
(``drivers/access-om/cpl_interface.F90``): `from_atm:433-511` /
`from_ocn:514-576` map received coupler fields into the model
:class:`~cice4_tpu.forcing.Forcing`; `into_ocn:579-675` /
`into_atm:678-730` assemble the outgoing field sets from the step's
flux output.  The MPMD transport itself (OASIS `prism_get/put`) is a
host-side concern — any coupler (OASIS-like, ESMF-like, or another JAX
model in the same process) exchanges plain arrays through these
adapters.

Field sets match ``cpl_parameters.F90:8-14``: 10 a2i + 7 o2i in,
1 i2a + 15 i2o out.
"""

from __future__ import annotations

import jax.numpy as jnp

from cice4_tpu import constants as cn
from cice4_tpu.forcing import Forcing
from cice4_tpu.io.forcing_data import split_shortwave

# symbolic field names (cpl_interface.F90:289-333)
A2I_FIELDS = ("swfld_i", "lwfld_i", "rain_i", "snow_i", "press_i",
              "runof_i", "tair_i", "qair_i", "uwnd_i", "vwnd_i")
O2I_FIELDS = ("sst_i", "sss_i", "ssu_i", "ssv_i", "sslx_i", "ssly_i",
              "pfmice_i")
I2A_FIELDS = ("isst_ia",)
I2O_FIELDS = ("strsu_io", "strsv_io", "rain_io", "snow_io", "stflx_io",
              "htflx_io", "swflx_io", "qflux_io", "shflx_io", "lwflx_io",
              "runof_io", "press_io", "aice_io", "melt_io", "form_io")


def from_atm(forcing: Forcing, a2i: dict) -> Forcing:
    """Fold received atmosphere fields into the Forcing
    (``from_atm:433-511`` + `prepare_forcing_from_oasis` derived
    fields)."""
    Tair = a2i["tair_i"]
    swdn = a2i["swfld_i"]
    swvdr, swvdf, swidr, swidf = split_shortwave(swdn)
    snow = a2i["snow_i"]
    rain = a2i["rain_i"]
    uatm = a2i["uwnd_i"]
    vatm = a2i["vwnd_i"]
    return forcing.replace(
        Tair=Tair, potT=Tair, Qa=a2i["qair_i"],
        flw=a2i["lwfld_i"], uatm=uatm, vatm=vatm,
        wind=jnp.sqrt(uatm**2 + vatm**2),
        swvdr=swvdr, swvdf=swvdf, swidr=swidr, swidf=swidf,
        fsnow=snow, frain=rain,
    )


def from_ocn(forcing: Forcing, o2i: dict) -> tuple[Forcing, dict]:
    """Fold received ocean fields into the Forcing
    (``from_ocn:514-576``).  Returns (forcing, state_updates) where
    state_updates carries sst/frzmlt to place into the model state."""
    forcing = forcing.replace(
        sss=o2i["sss_i"], uocn=o2i["ssu_i"], vocn=o2i["ssv_i"],
        ss_tltx=o2i["sslx_i"], ss_tlty=o2i["ssly_i"],
    )
    updates = dict(sst=o2i["sst_i"], frzmlt=o2i["pfmice_i"])
    return forcing, updates


def gfdl_open_water_fluxes(state, forcing: Forcing, tmask,
                           u_star_prev=None):
    """Open-water atmosphere fluxes via the GFDL Monin-Obukhov bulk
    package (``cpl_forcing_handler.F90 gfdl_ocean_fluxes:925-1056``;
    enabled by default in the reference, ``cpl_parameters.F90:54``).

    u_star_prev: previous coupling interval's friction velocity (the
    roughness inputs lag one interval, as the reference notes at
    ":984-989"; restart-carried there).  Returns the dict of
    sign-flipped ocean fluxes + the new u_star to carry forward.
    """
    from cice4_tpu.ops.gfdl_flux import gfdl_ocean_fluxes
    if u_star_prev is None:
        u_star_prev = jnp.full_like(state.sst, 0.1)
    press = forcing.press if getattr(forcing, "press", None) is not None \
        else jnp.full_like(state.sst, 1.013e5)
    return gfdl_ocean_fluxes(
        tair=forcing.Tair, qair=forcing.Qa,
        uwnd=forcing.uatm, vwnd=forcing.vatm,
        press=press, sst=state.sst,
        ssu=forcing.uocn, ssv=forcing.vocn,
        u_star_prev=u_star_prev, tmask=tmask)


def into_ocn(fluxes: dict, state, forcing: Forcing,
             gfdl: dict | None = None) -> dict:
    """Assemble the ice->ocean field set (``get_i2o_fluxes``, the merge
    at ``cpl_forcing_handler.F90:689-780``): open-water atmosphere
    fluxes weighted by (1-aice) merged with under-ice fluxes (already
    category-weighted by merge_fluxes), stresses sign-flipped for the
    ocean (the ":724 BUG found here" sign), salt/heat/SW pass-through.

    gfdl: optional dict from :func:`gfdl_open_water_fluxes` — when
    given, the open-water sensible/latent/longwave/stress come from
    the GFDL bulk scheme exactly as `gfdl_surface_flux=.true.` does.
    """
    aice = fluxes.get("aice", jnp.sum(state.aicen, 0))
    ow = 1.0 - aice
    zero = jnp.zeros_like(aice)
    if gfdl is not None:
        # gfdl dict fields are already in the convention the merge
        # expects: the reference's gfdl_ocean_fluxes overwrites
        # fsens_ocn/... with the flipped values (sh=-flux_t, ...) and
        # get_i2o_fluxes applies the same -X*(1-aice) merge to them
        # (cpl_forcing_handler.F90:925-1056, :689-780) — no extra
        # negation here.
        fsens_ocn = gfdl["sh"]
        flat_ocn = gfdl["lh"]
        flwout_ocn = gfdl["lwo"]
        strairx_ocn = gfdl["taox"]
        strairy_ocn = gfdl["taoy"]
    else:
        fsens_ocn = fluxes.get("fsens_ocn", zero)
        flat_ocn = fluxes.get("flat_ocn", zero)
        flwout_ocn = fluxes.get("flwout_ocn", zero)
        strairx_ocn = fluxes.get("strairx_ocn", zero)
        strairy_ocn = fluxes.get("strairy_ocn", zero)
    swabs_ocn = fluxes.get("swabs_ocn", zero)
    flw = forcing.flw if forcing.flw is not None else zero
    return {
        # 1/2) interface stress: open-water air stress + (sign-flipped)
        # ice-ocean stress (":722-726")
        "strsu_io": strairx_ocn * ow - state.strocnxT * aice,
        "strsv_io": strairy_ocn * ow - state.strocnyT * aice,
        "rain_io": forcing.frain * ow,
        "snow_io": forcing.fsnow * ow,
        "stflx_io": fluxes["fsalt"],
        "htflx_io": fluxes["fhocn"],
        # 7) SW: open-water absorbed + penetrating through ice (":744")
        "swflx_io": swabs_ocn * ow + fluxes["fswthru"],
        # 8/9) latent/sensible, positive OUT of ocean (":746-752")
        "qflux_io": -flat_ocn * ow,
        "shflx_io": -fsens_ocn * ow,
        # 10) net LW into ocean (":754")
        "lwflx_io": (flw + flwout_ocn) * ow,
        "runof_io": getattr(forcing, "runof", None)
        if getattr(forcing, "runof", None) is not None else zero,
        # 12) pressure anomaly: the reference sends
        # tiopress = press - 1.0e5 (cpl_forcing_handler.F90 get_i2o
        # pressure block), not the raw surface pressure — a MOM-style
        # consumer expects the anomaly.
        "press_io": (getattr(forcing, "press") - 1.0e5)
        if getattr(forcing, "press", None) is not None else zero,
        "aice_io": aice,
        "melt_io": fluxes["fresh"],
        "form_io": fluxes.get("frazil", zero),
    }


def into_atm(fluxes: dict, state) -> dict:
    """Assemble the ice->atm field set (``into_atm:678-730``)."""
    return {"isst_ia": state.sst + cn.Tffresh}


class CouplerBoundary:
    """Stateful convenience wrapper for a coupled run: holds the latest
    received fields and exposes the 4 exchange calls with the reference
    call pattern (`CICE_RunMod.F90:106-340` coupled loop).

    gfdl_surface_flux mirrors ``cpl_parameters.F90:54`` (default True
    there): open-water sh/lh/lw/stress for the ocean come from the
    GFDL Monin-Obukhov package, with u_star carried between coupling
    intervals (the reference saves it to the restart)."""

    def __init__(self, forcing: Forcing, tmask=None,
                 gfdl_surface_flux: bool = False):
        self.forcing = forcing
        self.state_updates: dict = {}
        self.gfdl_surface_flux = gfdl_surface_flux
        self.tmask = tmask
        self.u_star = None

    def recv_atm(self, a2i: dict):
        self.forcing = from_atm(self.forcing, a2i)

    def recv_ocn(self, o2i: dict):
        self.forcing, self.state_updates = from_ocn(self.forcing, o2i)

    def apply_ocean_state(self, state):
        if self.state_updates:
            state = state.replace(**self.state_updates)
            self.state_updates = {}
        return state

    def send_ocn(self, fluxes, state):
        gfdl = None
        if self.gfdl_surface_flux:
            tmask = self.tmask if self.tmask is not None \
                else jnp.ones_like(state.sst, bool)
            gfdl = gfdl_open_water_fluxes(state, self.forcing, tmask,
                                          self.u_star)
            self.u_star = gfdl["u_star"]
        return into_ocn(fluxes, state, self.forcing, gfdl=gfdl)

    def send_atm(self, fluxes, state):
        return into_atm(fluxes, state)

    # -- restart persistence of the lagged friction velocity ----------
    # The reference saves u_star0 to its restart (cpl_forcing_handler
    # u_star0 read/write blocks) so the first coupling interval after a
    # resume uses the lagged value, not the 0.1 m/s cold-start default.
    def dump(self, path: str):
        """Write the coupler-boundary restart sidecar (u_star)."""
        import numpy as np
        u_star = (np.asarray(self.u_star) if self.u_star is not None
                  else np.zeros(0))
        np.savez_compressed(path, u_star=u_star)
        return path

    def load(self, path: str):
        """Restore the lagged u_star written by :meth:`dump`."""
        import numpy as np
        with np.load(path) as z:
            u_star = z["u_star"]
        self.u_star = jnp.asarray(u_star) if u_star.size else None
