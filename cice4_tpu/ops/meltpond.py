"""Explicit melt-pond volume tracer (``source/ice_meltpond.F90``).

`compute_ponds:88-230`: pond volume grows from surface melt + rain
runoff, contracts exponentially under freezing conditions, and sets the
pond area/depth geometry consumed by the delta-Eddington albedo.
"""

from __future__ import annotations

import jax.numpy as jnp

from cice4_tpu import constants as cn

hicemin = 0.1     # minimum ice thickness with ponds (m)
Td = 2.0          # freeze-up temperature difference (C)
rfrac = 0.1       # runoff fraction captured by ponds
rexp = 0.01       # pond contraction scaling
dpthhi = 0.9      # max pond depth / ice thickness
dpthfrac = 0.8    # pond depth / pond fraction ratio


def compute_ponds(dt, meltt, melts, frain, aicen, vicen, vsnon,
                  tsfcn, volpn):
    """Per-category pond update.  meltt/melts: melt this step (m, per
    unit ice area).  Returns (volpn, apondn, hpondn)."""
    has = aicen > cn.puny
    a_s = jnp.maximum(aicen, cn.puny)
    hi = jnp.where(has, vicen / a_s, 0.0)
    hs = jnp.where(has, vsnon / a_s, 0.0)

    vol = volpn + rfrac * (meltt * cn.rhoi / cn.rhofresh
                           + melts * cn.rhos / cn.rhofresh
                           + frain * dt / cn.rhofresh)
    Tp = cn.Timelt - Td
    dTs = jnp.maximum(Tp - tsfcn, 0.0)
    vol = jnp.maximum(vol * jnp.exp(rexp * dTs / Tp), 0.0)

    apondn = jnp.minimum(jnp.sqrt(jnp.maximum(vol, 0.0) / dpthfrac), 1.0)
    hpondn = dpthfrac * apondn
    hpondn = jnp.minimum(hpondn, dpthhi * hi)
    vol = hpondn * apondn
    apondn = jnp.where(hs > cn.puny, 0.0, apondn)

    thin = has & (hi < hicemin)
    gone = thin | ~has
    vol = jnp.where(gone, 0.0, vol)
    apondn = jnp.where(gone, 0.0, apondn)
    hpondn = jnp.where(gone, 0.0, hpondn)
    volpn_new = jnp.where(has, vol, volpn)
    return volpn_new, apondn, hpondn
