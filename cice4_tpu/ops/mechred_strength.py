"""Ice strength and the ridging ITD functions it shares with ridging.

Dense JAX version of the strength part of ``source/ice_mechred.F90``:
`ridge_itd` (participation + ridged-ice ITD, ``:773-1081``) and
`ice_strength` (``:1869-2036``), covering both the Hibler (1979)
(`kstrength=0`) and Rothrock (1975) potential-energy (`kstrength=1`)
formulations with both participation (`krdg_partic` 0/1) and
redistribution (`krdg_redist` 0/1) options.
"""

from __future__ import annotations

import jax.numpy as jnp

from cice4_tpu import constants as cn
from cice4_tpu.config import DynamicsConfig

# fixed ridging parameters (ice_mechred.F90:83-101)
Cs = 0.25        # fraction of shear energy contributing to ridging
fsnowrdg = 0.5   # snow fraction that survives ridging
Gstar = 0.15     # max G(h) participating (krdg_partic = 0)
astar = 0.05     # e-folding of G(h) participation (krdg_partic = 1)
maxraft = 1.0    # max thickness of rafting ice (m)
Hstar = 25.0     # mean ridge thickness parameter (krdg_redist = 0)


def ridge_itd_full(dyn: DynamicsConfig, aicen, vicen, aice0):
    """`ridge_itd` (``ice_mechred.F90:773-1081``).

    Returns dict with:
      apartic0: (ny, nx) open-water participation
      apartic: (ncat, ny, nx)
      hrmin, hrmax, hrexp, krdg: (ncat, ny, nx)
      aksum: (ny, nx) net area removed / area participating
    """
    ncat = aicen.shape[0]

    # cumulative normalized thickness distribution G
    contrib0 = jnp.where(aice0 > cn.puny, aice0, 0.0)
    contribn = jnp.where(aicen > cn.puny, aicen, 0.0)
    gsum0 = contrib0
    gsum = gsum0[None] + jnp.cumsum(contribn, axis=0)  # (ncat, ny, nx)
    total = gsum[-1]
    norm = 1.0 / jnp.maximum(total, cn.puny)
    G0 = gsum0 * norm          # G after open water
    Gn = gsum * norm           # G after category n
    Gm1 = jnp.concatenate([G0[None], Gn[:-1]], axis=0)  # G at cat n-1

    if dyn.krdg_partic == 0:
        # Thorndike et al. 1975: b(h) = (2/G*) (1 - G/G*), integrated
        Gstari = 1.0 / Gstar

        def partic(glo, ghi):
            full = Gstari * (ghi - glo) * (2.0 - (glo + ghi) * Gstari)
            part = Gstari * (Gstar - glo) * (2.0 - (glo + Gstar) * Gstari)
            return jnp.where(ghi < Gstar, full,
                             jnp.where(glo < Gstar, part, 0.0))

        apartic0 = partic(jnp.zeros_like(G0), G0)
        apartic = partic(Gm1, Gn)
    else:
        # exponential b(h) = exp(-G/astar) (ice_mechred.F90:944-975)
        astari = 1.0 / astar
        xtmp = 1.0 / (1.0 - jnp.exp(-astari))

        def expg(g):
            return jnp.exp(-g * astari) * xtmp

        apartic0 = expg(jnp.zeros_like(G0)) - expg(G0)
        apartic = expg(Gm1) - expg(Gn)

    # ridged-ice ITD descriptors
    has = aicen > cn.puny
    hi = jnp.where(has, vicen / jnp.maximum(aicen, cn.puny), 0.0)
    hi = jnp.maximum(hi, cn.puny)
    hrmin = jnp.where(has, jnp.minimum(2.0 * hi, hi + maxraft), 0.0)
    if dyn.krdg_redist == 0:
        hrmax = jnp.where(has, jnp.maximum(2.0 * jnp.sqrt(Hstar * hi),
                                           hrmin + cn.puny), 0.0)
        hrmean = 0.5 * (hrmin + hrmax)
        krdg = jnp.where(has, hrmean / hi, 1.0)
        hrexp = jnp.zeros_like(hrmin)
    else:
        hrexp = jnp.where(has, dyn.mu_rdg * jnp.sqrt(hi), 0.0)
        krdg = jnp.where(has, (hrmin + hrexp) / hi, 1.0)
        hrmax = jnp.zeros_like(hrmin)

    aksum = apartic0 + jnp.sum(apartic * (1.0 - 1.0 / krdg), axis=0)
    return dict(apartic0=apartic0, apartic=apartic, hrmin=hrmin,
                hrmax=hrmax, hrexp=hrexp, krdg=krdg, aksum=aksum, hi=hi)


def ice_strength(dyn: DynamicsConfig, aice, vice, aice0, aicen, vicen,
                 icetmask):
    """Ice strength P (N/m) (``ice_mechred.F90 ice_strength:1869-2036``)."""
    if dyn.kstrength == 1:  # Rothrock 1975 potential-energy strength
        r = ridge_itd_full(dyn, aicen, vicen, aice0)
        apartic, krdg = r["apartic"], r["krdg"]
        hi = r["hi"]
        active = (aicen > cn.puny) & (apartic > 0.0)
        if dyn.krdg_redist == 0:
            hrmin, hrmax = r["hrmin"], r["hrmax"]
            h2rdg = (1.0 / 3.0) * (hrmax**3 - hrmin**3) \
                / jnp.maximum(hrmax - hrmin, cn.puny)
        else:
            hrmin, hrexp = r["hrmin"], r["hrexp"]
            h2rdg = hrmin * hrmin + 2.0 * hrmin * hrexp + 2.0 * hrexp * hrexp
        dh2rdg = -hi * hi + h2rdg / krdg
        strength = jnp.sum(jnp.where(active, apartic * dh2rdg, 0.0), axis=0)
        strength = dyn.Cf * dyn.Cp * strength / jnp.maximum(r["aksum"], cn.puny)
    else:  # Hibler 1979
        strength = dyn.Pstar * vice * jnp.exp(-dyn.Cstar * (1.0 - aice))
    return jnp.where(icetmask, strength, 0.0)
