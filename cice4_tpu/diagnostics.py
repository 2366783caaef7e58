"""Runtime diagnostics: hemispheric integrals and budget checks.

Equivalent of ``source/ice_diagnostics.F90 runtime_diags:105-844`` —
the per-`diagfreq` global/hemispheric sums (area, extent, volume, snow
volume, kinetic energy, rms/max speed, max strength) printed as the
log tables the reference ships for regression diffing
(``ice.log.Linux.LANL.coyote:193-775``).

All reductions are plain `jnp.sum` over the dense global fields — under
sharding XLA lowers them to `psum` over the mesh (the reference's
`global_sum`); on TPU the reduction order is deterministic by
construction, giving the REPRODUCIBLE-mode property for free
(``mpi/ice_global_reductions.F90:200-230``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cice4_tpu import constants as cn
from cice4_tpu.grid import Grid
from cice4_tpu.ops.itd import aggregate
from cice4_tpu.state import State


def runtime_diags(state: State, grid: Grid):
    """Hemispheric diagnostics dict of scalars (all jnp 0-d arrays)."""
    agg = aggregate(state, grid.tmask)
    aice, vice, vsno = agg["aice"], agg["vice"], agg["vsno"]

    def hemi(field, area):
        return jnp.sum(field * area)

    out = {}
    for hem, tar in (("n", grid.tarean), ("s", grid.tareas)):
        out[f"area_{hem}"] = hemi(aice, tar) * cn.m2_to_km2
        out[f"extent_{hem}"] = hemi((aice > 0.15).astype(aice.dtype),
                                    tar) * cn.m2_to_km2
        out[f"volume_{hem}"] = hemi(vice, tar)          # m^3
        out[f"snw_vol_{hem}"] = hemi(vsno, tar)

    # kinetic energy and speeds on the U grid
    umass_t = cn.rhoi * vice + cn.rhos * vsno
    spd2 = state.uvel**2 + state.vvel**2
    from cice4_tpu.grid import to_ugrid
    umass = to_ugrid(grid, umass_t)
    ke = 0.5 * umass * spd2
    for hem, lm in (("n", grid.lmask_n), ("s", grid.lmask_s)):
        m = lm & grid.umask
        out[f"ke_{hem}"] = jnp.sum(jnp.where(m, ke * grid.uarea, 0.0))
        out[f"max_speed_{hem}"] = jnp.sqrt(
            jnp.max(jnp.where(m, spd2, 0.0)))
        npts = jnp.maximum(jnp.sum(m.astype(spd2.dtype)), 1.0)
        out[f"rms_speed_{hem}"] = jnp.sqrt(
            jnp.sum(jnp.where(m, spd2, 0.0)) / npts)

    out["max_strength"] = 0.0  # filled by caller from step fluxes
    out["tot_ice_mass"] = jnp.sum(umass_t * grid.tarea * grid.hm)
    out["tot_energy"] = jnp.sum((agg["eice"] + agg["esno"])
                                * grid.tarea * grid.hm)
    return out


def format_diags(istep, d) -> str:
    """Log-table formatting in the spirit of the reference diagnostics."""
    g = lambda k: float(d[k])
    lines = [
        f"istep = {istep}",
        "                              Arctic         Antarctic",
        f"total ice area  (km^2) = {g('area_n'):18.8e} {g('area_s'):18.8e}",
        f"total ice extent(km^2) = {g('extent_n'):18.8e} {g('extent_s'):18.8e}",
        f"total ice volume (m^3) = {g('volume_n'):18.8e} {g('volume_s'):18.8e}",
        f"total snw volume (m^3) = {g('snw_vol_n'):18.8e} {g('snw_vol_s'):18.8e}",
        f"tot kinetic energy (J) = {g('ke_n'):18.8e} {g('ke_s'):18.8e}",
        f"rms ice speed    (m/s) = {g('rms_speed_n'):18.8e} {g('rms_speed_s'):18.8e}",
        f"max ice speed    (m/s) = {g('max_speed_n'):18.8e} {g('max_speed_s'):18.8e}",
    ]
    return "\n".join(lines)


def print_state(state: State, grid: Grid, j: int, i: int) -> str:
    """Full single-cell state dump (``ice_diagnostics.F90
    print_state:1071-1220``) — the `debug_ice` probe."""
    lines = [f"cell (j={j}, i={i})  "
             f"lat={float(grid.tlat[j, i]) * cn.rad_to_deg:.3f} "
             f"lon={float(grid.tlon[j, i]) * cn.rad_to_deg:.3f}"]
    for n in range(state.ncat):
        lines.append(
            f" cat {n}: aicen={float(state.aicen[n, j, i]):.6e}"
            f" vicen={float(state.vicen[n, j, i]):.6e}"
            f" vsnon={float(state.vsnon[n, j, i]):.6e}"
            f" Tsf={float(state.tsfcn[n, j, i]):.4f}")
        for k in range(state.eicen.shape[1]):
            lines.append(f"   eicen[{k}]={float(state.eicen[n, k, j, i]):.6e}")
    lines.append(f" uvel={float(state.uvel[j, i]):.6e}"
                 f" vvel={float(state.vvel[j, i]):.6e}"
                 f" sst={float(state.sst[j, i]):.4f}"
                 f" frzmlt={float(state.frzmlt[j, i]):.4f}")
    return "\n".join(lines)
