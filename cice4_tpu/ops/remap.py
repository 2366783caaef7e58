"""Incremental remapping transport (Dukowicz & Baumgardner 2000;
Lipscomb & Hunke 2004) — ``source/ice_transport_remap.F90``.

Status: the full second-order monotone scheme (reconstruction, departure
triangles, quadrature integrals) is under construction; until it lands,
``transport_remap`` falls back to the first-order donor-cell scheme so
the configured default (`advection = 'remap'`) runs end-to-end.
"""

from __future__ import annotations

from cice4_tpu.grid import Grid
from cice4_tpu.ops.transport import transport_upwind
from cice4_tpu.state import State


def transport_remap(state: State, grid: Grid, dt) -> State:
    return transport_upwind(state, grid, dt)
