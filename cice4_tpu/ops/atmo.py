"""Atmospheric surface boundary layer over ice and ocean.

Dense JAX version of ``source/ice_atmo.F90``: Monin-Obukhov stability
iteration (`atmo_boundary_layer:56-376`, fixed 5 iterations) and the
constant-coefficient variant (`atmo_boundary_const:386-509`).
"""

from __future__ import annotations

import jax.numpy as jnp

from cice4_tpu import constants as cn

cpvir = cn.cp_wv / cn.cp_air - 1.0
zTrf = 2.0    # reference height for Tref/Qref (m)
umin = 1.0    # minimum wind speed (m/s)


def _psimhu(x):
    return (jnp.log((1.0 + x * (2.0 + x)) * (1.0 + x * x) / 8.0)
            - 2.0 * jnp.arctan(x) + cn.pih)


def _psixhu(x):
    return 2.0 * jnp.log((1.0 + x * x) / 2.0)


def atmo_boundary_layer(sfctype, Tsf, potT, uatm, vatm, wind, zlvl,
                        Qa, rhoa, calc_strair=True):
    """Monin-Obukhov turbulent transfer coefficients + wind stress +
    2 m reference diagnostics.

    Args:
      sfctype: 'ice' or 'ocn' (static).
      Tsf: surface temperature (C).
    Returns dict(strx, stry, Tref, Qref, delt, delq, shcoef, lhcoef).
    """
    if sfctype == "ice":
        qqq, TTT, Lheat = cn.qqqice, cn.TTTice, cn.Lsub
        vmag = jnp.maximum(umin, wind)
        rdn = cn.vonkar / jnp.log(cn.zref / cn.iceruf)
        rdn = jnp.broadcast_to(rdn, wind.shape).astype(wind.dtype)
    else:
        qqq, TTT, Lheat = cn.qqqocn, cn.TTTocn, cn.Lvap
        vmag = jnp.maximum(umin, wind)
        rdn = jnp.sqrt(0.0027 / vmag + 0.000142 + 0.0000764 * vmag)

    TsfK = Tsf + cn.Tffresh
    qsat = qqq * jnp.exp(-TTT / TsfK)
    ssq = qsat / rhoa
    thva = potT * (1.0 + cn.zvir * Qa)
    delt = potT - TsfK
    delq = Qa - ssq
    alz = jnp.log(zlvl / cn.zref)
    cp = cn.cp_air * (1.0 + cpvir * ssq)

    rhn = rdn
    ren = rdn
    ustar = rdn * vmag
    tstar = rhn * delt
    qstar = ren * delq

    rd = rdn
    rh = rhn
    re = ren
    stable = jnp.zeros_like(wind)
    psixh = jnp.zeros_like(wind)
    hol = jnp.zeros_like(wind)

    for _ in range(5):  # fixed MO iteration (ice_atmo.F90:271-307)
        hol = cn.vonkar * cn.gravit * zlvl \
            * (tstar / thva + qstar / (1.0 / cn.zvir + Qa)) / ustar**2
        hol = jnp.sign(hol) * jnp.minimum(jnp.abs(hol), 10.0)
        stable = 0.5 + jnp.sign(hol) * 0.5
        xqq = jnp.maximum(jnp.sqrt(jnp.abs(1.0 - 16.0 * hol)), 1.0)
        xqq = jnp.sqrt(xqq)
        psimhs = -(0.7 * hol + 0.75 * (hol - 14.3)
                   * jnp.exp(-0.35 * hol) + 10.7)
        psimh = psimhs * stable + (1.0 - stable) * _psimhu(xqq)
        psixh = psimhs * stable + (1.0 - stable) * _psixhu(xqq)
        rd = rdn / (1.0 + rdn / cn.vonkar * (alz - psimh))
        rh = rhn / (1.0 + rhn / cn.vonkar * (alz - psixh))
        re = ren / (1.0 + ren / cn.vonkar * (alz - psixh))
        ustar = rd * vmag
        tstar = rh * delt
        qstar = re * delq

    if calc_strair:
        tau = rhoa * ustar * rd
        strx = tau * uatm
        stry = tau * vatm
    else:
        strx = jnp.zeros_like(wind)
        stry = jnp.zeros_like(wind)

    shcoef = rhoa * ustar * cp * rh + 1.0  # windless term, Jordan et al 1999
    lhcoef = rhoa * ustar * Lheat * re

    # 2 m reference diagnostics
    al2 = jnp.log(cn.zref / zTrf)
    hol2 = hol * zTrf / zlvl
    xqq = jnp.maximum(1.0, jnp.sqrt(jnp.abs(1.0 - 16.0 * hol2)))
    xqq = jnp.sqrt(xqq)
    psix2 = -5.0 * hol2 * stable + (1.0 - stable) * _psixhu(xqq)
    fac = (rh / cn.vonkar) * (alz + al2 - psixh + psix2)
    Tref = potT - delt * fac - 0.01 * zTrf
    fac = (re / cn.vonkar) * (alz + al2 - psixh + psix2)
    Qref = Qa - delq * fac

    return dict(strx=strx, stry=stry, Tref=Tref, Qref=Qref,
                delt=delt, delq=delq, shcoef=shcoef, lhcoef=lhcoef)


def atmo_boundary_const(sfctype, uatm, vatm, wind, rhoa,
                        calc_strair=True):
    """Constant-coefficient boundary layer (``atmo_boundary_const``)."""
    Lheat = cn.Lsub if sfctype == "ice" else cn.Lvap
    if calc_strair:
        tau = rhoa * 0.0012 * wind
        strx = tau * uatm
        stry = tau * vatm
    else:
        strx = jnp.zeros_like(wind)
        stry = jnp.zeros_like(wind)
    shcoef = 1.20e-3 * cn.cp_air * rhoa * wind
    lhcoef = 1.50e-3 * Lheat * rhoa * wind
    return dict(strx=strx, stry=stry, shcoef=shcoef, lhcoef=lhcoef,
                Tref=jnp.zeros_like(wind), Qref=jnp.zeros_like(wind),
                delt=jnp.zeros_like(wind), delq=jnp.zeros_like(wind))
