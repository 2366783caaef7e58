"""Mechanical redistribution (ridging/rafting).

Dense JAX version of ``source/ice_mechred.F90`` `ridge_ice:133-552`:
iterate opening/closing (`ridge_prep:647-745`, `asum_ridging:573-631`,
`ridge_check:1788-1842`) with the participation/redistribution ITD of
`ridge_itd` and the conservative category transfer of
`ridge_shift:1099-1773`, until the total area sums to 1 (<= 20
iterations via `lax.while_loop`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cice4_tpu import constants as cn
from cice4_tpu.config import DynamicsConfig
from cice4_tpu.ops.itd import TRACER_DEPEND, _compute_tracers
from cice4_tpu.ops.mechred_strength import Cs, fsnowrdg, ridge_itd_full
from cice4_tpu.state import ItdParams, State

nitermax_ridge = 20


def _ridge_prep(dt, rdg_conv, rdg_shear, asum):
    """(``ridge_prep:647-745``)"""
    closing_net = Cs * rdg_shear + rdg_conv
    divu_adv = (1.0 - asum) / dt
    closing_net = jnp.where(divu_adv < 0.0,
                            jnp.maximum(closing_net, -divu_adv), closing_net)
    opning = closing_net + divu_adv
    return closing_net, divu_adv, opning


def _ridge_shift(dyn: DynamicsConfig, itd: ItdParams, dt, carry,
                 closing_net, opning):
    """One `ridge_shift` pass (``:1099-1773``) on the dense carry."""
    ncat, nilyr, nslyr = itd.ncat, itd.nilyr, itd.nslyr
    hin_max = list(itd.hin_max)
    hin_max[ncat] = 1.0e8  # ridge_prep sets top bound to big

    aicen = carry["aicen"]
    vicen = carry["vicen"]
    vsnon = carry["vsnon"]
    eicen = carry["eicen"]
    esnon = carry["esnon"]
    aice0 = carry["aice0"]
    tsfc_a = carry["tsfc_a"]
    atrcrn = dict(carry["atrcrn"])

    r = ridge_itd_full(dyn, aicen, vicen, aice0)
    apartic0, apartic = r["apartic0"], r["apartic"]
    hrmin, hrmax, hrexp, krdg = r["hrmin"], r["hrmax"], r["hrexp"], r["krdg"]
    aksum = r["aksum"]

    closing_gross = closing_net / jnp.maximum(aksum, cn.puny)

    # reduce rates if they would remove more area than exists (":1240-1282")
    wk1 = apartic0 * closing_gross * dt
    fac = jnp.where((apartic0 > 0.0) & (wk1 > aice0),
                    aice0 / jnp.maximum(wk1, cn.puny), 1.0)
    closing_gross = closing_gross * fac
    opning = opning * fac
    for n in range(ncat):
        wk1 = apartic[n] * closing_gross * dt
        fac = jnp.where((aicen[n] > cn.puny) & (apartic[n] > 0.0)
                        & (wk1 > aicen[n]),
                        aicen[n] / jnp.maximum(wk1, cn.puny), 1.0)
        closing_gross = closing_gross * fac
        opning = opning * fac

    aice0 = jnp.maximum(aice0 - apartic0 * closing_gross * dt
                        + opning * dt, 0.0)
    aopen = opning * dt

    aicen_init = aicen
    vicen_init = vicen
    vsnon_init = vsnon
    eicen_init = eicen
    esnon_init = esnon

    msnow_mlt = carry["msnow_mlt"]
    esnow_mlt = carry["esnow_mlt"]
    ardg1 = carry["ardg1"]
    ardg2 = carry["ardg2"]
    virdg = carry["virdg"]

    for n in range(ncat):
        active = (aicen_init[n] > cn.puny) & (apartic[n] > 0.0) \
            & (closing_gross > 0.0)
        ardg1n = jnp.where(active,
                           jnp.minimum(apartic[n] * closing_gross * dt,
                                       aicen_init[n]), 0.0)
        ardg2n = ardg1n / jnp.maximum(krdg[n], cn.puny)
        afrac = ardg1n / jnp.maximum(aicen_init[n], cn.puny)
        virdgn = vicen_init[n] * afrac
        vsrdgn = vsnon_init[n] * afrac

        aicen = aicen.at[n].add(-ardg1n)
        vicen = vicen.at[n].add(-virdgn)
        vsnon = vsnon.at[n].add(-vsrdgn)
        ardg1 = ardg1 + ardg1n
        ardg2 = ardg2 + ardg2n
        virdg = virdg + virdgn
        msnow_mlt = msnow_mlt + cn.rhos * vsrdgn * (1.0 - fsnowrdg)

        eirdgn = eicen_init[n] * afrac[None]           # (nilyr, ny, nx)
        eicen = eicen.at[n].add(-eirdgn)
        esrdgn = esnon_init[n] * afrac[None]
        esnon = esnon.at[n].add(-esrdgn)
        esnow_mlt = esnow_mlt + jnp.sum(esrdgn, 0) * (1.0 - fsnowrdg)

        # weighted tracers leave the donor (tracer values unchanged)
        tsfc_a = tsfc_a.at[n].add(-ardg1n * carry["tsfcn"][n])
        # level-ice tracers: level and ridged ice ridge proportionally,
        # so the level portion of the ridging ice leaves the level
        # tracers — an extra multiplicative decrement applied BEFORE
        # the general weighted subtraction (ice_mechred.F90 ridge_shift
        # :1474-1482; the general loops :1546+, :1717+ also act on
        # alvl/vlvl)
        for name in ("alvl", "vlvl"):
            if name in atrcrn:
                atrcrn[name] = atrcrn[name].at[n].multiply(1.0 - afrac)
        datr = {}
        for name in atrcrn:
            dep = TRACER_DEPEND[name]
            amt = {0: ardg1n, 1: virdgn, 2: vsrdgn}[dep]
            datr[name] = amt * carry["trcrn"][name][n]
            atrcrn[name] = atrcrn[name].at[n].add(-datr[name])
        dhr = jnp.maximum(hrmax[n] - hrmin[n], cn.puny)
        dhr2 = jnp.maximum(hrmax[n] ** 2 - hrmin[n] ** 2, cn.puny)

        for nr in range(ncat):
            if dyn.krdg_redist == 0:  # Hibler 1980 uniform
                empty = (hrmin[n] >= hin_max[nr + 1]) \
                    | (hrmax[n] <= hin_max[nr])
                hLr = jnp.maximum(hrmin[n], hin_max[nr])
                hRr = jnp.minimum(hrmax[n], hin_max[nr + 1])
                farea = jnp.where(empty, 0.0, (hRr - hLr) / dhr)
                fvol = jnp.where(empty, 0.0, (hRr**2 - hLr**2) / dhr2)
            else:                     # exponential
                hi1 = hrmin[n]
                hexp = jnp.maximum(hrexp[n], cn.puny)
                if nr < ncat - 1:
                    empty = hi1 >= hin_max[nr + 1]
                    hLr = jnp.maximum(hi1, hin_max[nr])
                    hRr = hin_max[nr + 1]
                    expL = jnp.exp(-(hLr - hi1) / hexp)
                    expR = jnp.exp(-(hRr - hi1) / hexp)
                    farea = jnp.where(empty, 0.0, expL - expR)
                    fvol = jnp.where(
                        empty, 0.0,
                        ((hLr + hexp) * expL - (hRr + hexp) * expR)
                        / jnp.maximum(hi1 + hexp, cn.puny))
                else:
                    hLr = jnp.maximum(hi1, hin_max[nr])
                    expL = jnp.exp(-(hLr - hi1) / hexp)
                    farea = expL
                    fvol = (hLr + hexp) * expL \
                        / jnp.maximum(hi1 + hexp, cn.puny)

            aicen = aicen.at[nr].add(farea * ardg2n)
            vicen = vicen.at[nr].add(fvol * virdgn)
            vsnon = vsnon.at[nr].add(fvol * vsrdgn * fsnowrdg)
            eicen = eicen.at[nr].add(fvol[None] * eirdgn)
            esnon = esnon.at[nr].add(fvol[None] * esrdgn * fsnowrdg)
            tsfc_a = tsfc_a.at[nr].add(farea * ardg2n * carry["tsfcn"][n])
            # the general deposit loops act on ALL tracers, including
            # alvl/vlvl (ice_mechred.F90 :1717+ has no tr_lvl skip; the
            # level-ice budget's ridge consumption comes from the extra
            # donor decrement above).  NB the area-tracer deposit is
            # weighted by the RIDGED area ardg2n (":1726-1729"), not
            # the consumed area ardg1n that left the donor — ridging
            # does not conserve global aicen*trcrn for area tracers
            # (reference note ":1711-1715")
            for name in atrcrn:
                dep = TRACER_DEPEND[name]
                amt = {0: farea * ardg2n, 1: fvol * virdgn,
                       2: fvol * vsrdgn * fsnowrdg}[dep]
                atrcrn[name] = atrcrn[name].at[nr].add(
                    amt * carry["trcrn"][name][n])

    tsfcn, trcrn = _compute_tracers(atrcrn, tsfc_a, aicen, vicen, vsnon,
                                    list(atrcrn.keys()))

    return dict(carry, aicen=aicen, vicen=vicen, vsnon=vsnon,
                eicen=eicen, esnon=esnon, aice0=aice0,
                tsfcn=tsfcn, trcrn=trcrn, tsfc_a=tsfcn * aicen,
                atrcrn={k: trcrn[k]
                        * {0: aicen, 1: vicen, 2: vsnon}[TRACER_DEPEND[k]]
                        for k in trcrn},
                msnow_mlt=msnow_mlt, esnow_mlt=esnow_mlt,
                ardg1=ardg1, ardg2=ardg2, virdg=virdg,
                aopen=carry["aopen"] + aopen)


def ridge_ice(state: State, itd: ItdParams, dyn: DynamicsConfig, dt,
              rdg_conv, rdg_shear, tmask, aice0=None, guards=False):
    """Ridging driver (``ridge_ice:133-552``).

    aice0: advected open-water fraction from the transport step (its
    deviation from 1 - sum(aicen) drives the divergence-implied
    opening/closing, ``ridge_prep:715-725``).  Defaults to the
    in-bounds complement when no transport ran.

    Returns (state, diag) where diag carries dardg1dt, dardg2dt,
    dvirdgdt, opening (1/s or m/s) and fresh/fhocn corrections from
    snow lost to the ocean during ridging.
    """
    zero = jnp.zeros_like(state.sst)
    if aice0 is None:
        aice0 = jnp.maximum(1.0 - jnp.sum(state.aicen, 0), 0.0)

    carry = dict(
        aicen=state.aicen, vicen=state.vicen, vsnon=state.vsnon,
        eicen=state.eicen, esnon=state.esnon, aice0=aice0,
        tsfcn=state.tsfcn, trcrn=dict(state.trcrn),
        tsfc_a=state.tsfcn * state.aicen,
        atrcrn={k: state.trcrn[k] * {0: state.aicen, 1: state.vicen,
                                     2: state.vsnon}[TRACER_DEPEND[k]]
                for k in state.trcrn},
        msnow_mlt=zero, esnow_mlt=zero,
        ardg1=zero, ardg2=zero, virdg=zero, aopen=zero,
        closing_net=zero, divu_adv=zero, opning=zero,
        niter=jnp.asarray(0), done=jnp.asarray(False),
    )

    asum = aice0 + jnp.sum(state.aicen, 0)
    closing_net, divu_adv, opning = _ridge_prep(dt, rdg_conv, rdg_shear,
                                                asum)
    carry["closing_net"] = jnp.where(tmask, closing_net, 0.0)
    carry["divu_adv"] = divu_adv
    carry["opning"] = jnp.where(tmask, opning, 0.0)

    def cond(c):
        return (~c["done"]) & (c["niter"] < nitermax_ridge)

    def body(c):
        c = _ridge_shift(dyn, itd, dt, c, c["closing_net"], c["opning"])
        # ridge_check (":1788-1842")
        asum = c["aice0"] + jnp.sum(c["aicen"], 0)
        ok = jnp.abs(asum - 1.0) < cn.puny
        ok = ok | ~tmask
        divu_adv = (1.0 - asum) / dt
        c["closing_net"] = jnp.where(ok, 0.0,
                                     jnp.maximum(0.0, -divu_adv))
        c["opning"] = jnp.where(ok, 0.0, jnp.maximum(0.0, divu_adv))
        c["done"] = jnp.all(ok)
        c["niter"] = c["niter"] + 1
        return c

    res = jax.lax.while_loop(cond, body, carry)

    guard_rec = None
    if guards:
        # ridge_check (ice_mechred.F90:1788-1842): abort with the
        # failing cell if the iteration did not close the area sum
        from cice4_tpu.guards import check_ridge
        asum_final = res["aice0"] + jnp.sum(res["aicen"], 0)
        guard_rec = check_ridge(asum_final, tmask, res["done"])

    state = state.replace(aicen=res["aicen"], vicen=res["vicen"],
                          vsnon=res["vsnon"], eicen=res["eicen"],
                          esnon=res["esnon"], tsfcn=res["tsfcn"],
                          trcrn=res["trcrn"])
    dti = 1.0 / dt
    diag = dict(
        dardg1dt=res["ardg1"] * dti, dardg2dt=res["ardg2"] * dti,
        dvirdgdt=res["virdg"] * dti, opening=res["aopen"] * dti,
        fresh=res["msnow_mlt"] * dti, fhocn=res["esnow_mlt"] * dti,
        niter=res["niter"],
    )
    if guard_rec is not None:
        diag["_guard"] = guard_rec
    return state, diag
