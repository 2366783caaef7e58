"""Horizontal transport driver.

Dense JAX version of ``source/ice_transport_driver.F90``.  This module
holds the first-order donor-cell scheme (`transport_upwind:672-834`,
`upwind_field:1790-1878`); the second-order incremental-remapping
scheme lives in :mod:`cice4_tpu.ops.remap` and is selected by
``advection = 'remap'``.

The transported set matches `state_to_work` (``:1223-1363``): open
water, per-category area/volume/snow, depend-weighted tracers, and
layer energies — all conserved quantities.
"""

from __future__ import annotations

import jax.numpy as jnp

from cice4_tpu import constants as cn
from cice4_tpu.constants import FieldLoc, FieldType
from cice4_tpu.grid import Grid
from cice4_tpu.ops.itd import TRACER_DEPEND, _compute_tracers
from cice4_tpu.parallel import halo as h
from cice4_tpu.state import State


def edge_velocities(grid: Grid, uvel, vvel):
    """E-face and N-face velocities from U-corner velocities
    (``transport_upwind:755-760``): uee(j,i) = (u(j,i)+u(j-1,i))/2,
    vnn(j,i) = (v(j,i)+v(j,i-1))/2."""
    kw = dict(loc=FieldLoc.NE_CORNER, ftype=FieldType.VECTOR)
    uee = 0.5 * (uvel + h.nbr_s(uvel, grid.bc, **kw))
    vnn = 0.5 * (vvel + h.nbr_w(vvel, grid.bc, **kw))
    return uee, vnn


def _upwind_tend(grid: Grid, phi, uee, vnn, dt):
    """Donor-cell flux divergence (``upwind_field:1851-1875``)."""
    bc = grid.bc
    phi_e = h.nbr_e(phi, bc)
    phi_n = h.nbr_n(phi, bc)
    fe = 0.5 * dt * grid.hte * ((uee + jnp.abs(uee)) * phi
                                + (uee - jnp.abs(uee)) * phi_e)
    fn = 0.5 * dt * grid.htn * ((vnn + jnp.abs(vnn)) * phi
                                + (vnn - jnp.abs(vnn)) * phi_n)
    div = (fe - h.nbr_w(fe, bc) + fn - h.nbr_s(fn, bc)) * grid.tarear
    return phi - div


def transport_upwind(state: State, grid: Grid, dt):
    """First-order upwind advection of the full ice state.

    Returns (state, aice0) — the advected open-water fraction feeds the
    ridging opening/closing rates."""
    uee, vnn = edge_velocities(grid, state.uvel, state.vvel)

    aice0 = jnp.maximum(1.0 - jnp.sum(state.aicen, 0), 0.0)

    def adv(f):
        return _upwind_tend(grid, f, uee, vnn, dt)

    aicen = adv(state.aicen)
    vicen = adv(state.vicen)
    vsnon = adv(state.vsnon)
    eicen = adv(state.eicen)
    esnon = adv(state.esnon)
    aice0 = jnp.where(grid.tmask, jnp.maximum(adv(aice0), 0.0), 0.0)

    tsfc_a = adv(state.tsfcn * state.aicen)
    atrcrn = {}
    for name, t in state.trcrn.items():
        w = {0: state.aicen, 1: state.vicen,
             2: state.vsnon}[TRACER_DEPEND[name]]
        atrcrn[name] = adv(t * w)

    tsfcn, trcrn = _compute_tracers(atrcrn, tsfc_a, aicen, vicen, vsnon,
                                    list(state.trcrn.keys()))
    # mask land
    m = grid.tmask
    aicen = jnp.where(m[None], aicen, 0.0)
    vicen = jnp.where(m[None], vicen, 0.0)
    vsnon = jnp.where(m[None], vsnon, 0.0)
    eicen = jnp.where(m[None, None], eicen, 0.0)
    esnon = jnp.where(m[None, None], esnon, 0.0)
    state = state.replace(aicen=aicen, vicen=vicen, vsnon=vsnon,
                          eicen=eicen, esnon=esnon, tsfcn=tsfcn,
                          trcrn=trcrn)
    return state, aice0
