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


def into_ocn(fluxes: dict, state, forcing: Forcing) -> dict:
    """Assemble the ice->ocean field set (``into_ocn:579-675`` via
    `get_i2o_fluxes`): stresses, water/salt/heat fluxes, penetrating
    SW, freeze/melt potential bookkeeping."""
    aice = fluxes.get("aice", jnp.sum(state.aicen, 0))
    return {
        "strsu_io": state.strocnxT * aice * -1.0,  # sign: stress ON ocean
        "strsv_io": state.strocnyT * aice * -1.0,
        "rain_io": forcing.frain * (1.0 - aice),
        "snow_io": forcing.fsnow * (1.0 - aice),
        "stflx_io": fluxes["fsalt"],
        "htflx_io": fluxes["fhocn"],
        "swflx_io": fluxes["fswthru"],
        "qflux_io": fluxes.get("frazil", jnp.zeros_like(aice)),
        "shflx_io": fluxes.get("fsens_ocn", jnp.zeros_like(aice)),
        "lwflx_io": fluxes.get("flwout_ocn", jnp.zeros_like(aice)),
        "runof_io": jnp.zeros_like(aice),
        "press_io": jnp.zeros_like(aice),
        "aice_io": aice,
        "melt_io": fluxes["fresh"],
        "form_io": fluxes.get("frazil", jnp.zeros_like(aice)),
    }


def into_atm(fluxes: dict, state) -> dict:
    """Assemble the ice->atm field set (``into_atm:678-730``)."""
    return {"isst_ia": state.sst + cn.Tffresh}


class CouplerBoundary:
    """Stateful convenience wrapper for a coupled run: holds the latest
    received fields and exposes the 4 exchange calls with the reference
    call pattern (`CICE_RunMod.F90:106-340` coupled loop)."""

    def __init__(self, forcing: Forcing):
        self.forcing = forcing
        self.state_updates: dict = {}

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
        return into_ocn(fluxes, state, self.forcing)

    def send_atm(self, fluxes, state):
        return into_atm(fluxes, state)
