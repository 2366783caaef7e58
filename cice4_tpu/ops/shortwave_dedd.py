"""Delta-Eddington multiple-scattering shortwave radiation.

Dense JAX version of the dEdd path of ``source/ice_shortwave.F90``
(Briegleb & Light 2007, NCAR/TN-472+STR): snow grain/pond geometry
(`shortwave_dEdd_set_snow:3467-3587`, `set_pond:3597-3650`), per-band
inherent optical property profiles (`compute_dEdd:1796-2903`), and the
two-stream layer-combination solution (`solution_dEdd:2912-3457`).

The reference builds compressed cell lists per surface type (bare /
snow-covered / ponded) and calls `compute_dEdd` three times; here each
surface type is a masked dense pass over the whole plane, weighted by
its fractional coverage and summed.  The spectral (3 bands), layer
(klev+1) and Gauss-quadrature (8 angles) loops are unrolled into
vector code.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cice4_tpu import constants as cn
from cice4_tpu.config import RadiationConfig
from cice4_tpu.ops._dedd_tables import Qs_tab, gs_tab, rsnw_tab, ws_tab

nspint = 3

# band-mean IOPs (compute_dEdd data blocks, ice_shortwave.F90:2240-2322)
ki_ssl_mn = np.array([1000.1, 1003.7, 7042.0])
wi_ssl_mn = np.array([0.9999, 0.9963, 0.9088])
gi_ssl_mn = np.array([0.94, 0.94, 0.94])
ki_dl_mn = np.array([100.2, 107.7, 1309.0])
wi_dl_mn = np.array([0.998, 0.9287, 0.0305])
gi_dl_mn = np.array([0.94, 0.94, 0.94])
ki_int_mn = np.array([20.2, 27.7, 1445.0])
wi_int_mn = np.array([0.9901, 0.7223, 0.0277])
gi_int_mn = np.array([0.94, 0.94, 0.94])
ki_p_ssl_mn = np.array([70.2, 77.7, 1309.0])
wi_p_ssl_mn = np.array([0.9972, 0.9009, 0.0305])
gi_p_ssl_mn = np.array([0.94, 0.94, 0.94])
ki_p_int_mn = np.array([20.2, 27.7, 1445.0])
wi_p_int_mn = np.array([0.9901, 0.7223, 0.0277])
gi_p_int_mn = np.array([0.94, 0.94, 0.94])
kw = np.array([0.2, 12.0, 729.0])
ww = np.array([0.0, 0.0, 0.0])
gw = np.array([0.0, 0.0, 0.0])

# tuning / geometry parameters
fp_ice, fm_ice = 0.15, 0.15
fp_pnd, fm_pnd = 2.00, 0.50
fr_max, fr_min = 1.00, 0.80
hs_ssl = 0.040
hi_ssl = 0.050
kalg = 0.60
hpmin, hp0 = 0.005, 0.200
refindx = 1.310
cp063, cp455 = 0.063, 0.455
trmin = 0.001
exp_min = float(np.exp(-10.0))
cp67, cp33, cp78, cp22, cp01 = 0.67, 0.33, 0.78, 0.22, 0.01

gauspt = np.array([0.9894009, 0.9445750, 0.8656312, 0.7554044,
                   0.6178762, 0.4580168, 0.2816036, 0.0950125])
gauswt = np.array([0.0271525, 0.0622535, 0.0951585, 0.1246290,
                   0.1495960, 0.1691565, 0.1826034, 0.1894506])

# snow grain / pond geometry (set_snow/set_pond)
hsmin, hs0 = 0.0001, 0.0300
rsnw_fresh, rsnw_nonmelt = 100.0, 500.0
rsnw_sig, rsnw_melt = 250.0, 1000.0


def _tuned_iops(R, fp, fm, k_mn, w_mn):
    """Scattering-coefficient tuning (``:2354-2424``)."""
    f = fp if R >= 0 else fm
    sigp = np.maximum(k_mn * w_mn * (1.0 + f * R), 0.0)
    k = sigp + k_mn * (1.0 - w_mn)
    w = sigp / k
    return k, w


def set_snow(rad: RadiationConfig, aice, vsno, tsfcn):
    """Snow fraction, density, grain radius (``set_snow:3467-3587``)."""
    has = aice > cn.puny
    hs = jnp.where(has, vsno / jnp.maximum(aice, cn.puny), 0.0)
    fs = jnp.where(hs < hsmin, 0.0,
                   jnp.where(hs <= hs0, hs / hs0, 1.0))
    fs = jnp.where(has, fs, 0.0)
    dTs = cn.Timelt - tsfcn
    fT = -jnp.minimum(dTs / 1.0 - 1.0, 0.0)
    rsnw_nm = np.clip(rsnw_nonmelt - rad.R_snw * rsnw_sig,
                      rsnw_fresh, rsnw_melt)
    rsnw = jnp.clip(rsnw_nm + (rsnw_melt - rsnw_nm) * fT,
                    rsnw_fresh, rsnw_melt)
    rsnw = jnp.where(has, rsnw, 0.0)
    rhosnw = jnp.where(has, cn.rhos, 0.0)
    return fs, rhosnw, rsnw


def set_pond(aice, tsfcn, fs):
    """Parameterized melt-pond fraction/depth (``set_pond:3597-3650``)."""
    has = aice > cn.puny
    dTs = cn.Timelt - tsfcn
    fT = -jnp.minimum(dTs / 1.0 - 1.0, 0.0)
    fp = jnp.where(has, 0.3 * fT * (1.0 - fs), 0.0)
    hp = jnp.where(has, 0.3 * fT * (1.0 - fs), 0.0)
    return fp, hp


def _snow_iops(ns, rsnw_eff, rhosnw):
    """Table interpolation of snow IOPs in grain radius
    (``:2455-2484``)."""
    r = jnp.clip(rsnw_eff, rsnw_tab[0], rsnw_tab[-1])
    idx = jnp.searchsorted(jnp.asarray(rsnw_tab), r, side="right") - 1
    idx = jnp.clip(idx, 0, len(rsnw_tab) - 2)
    r0 = jnp.asarray(rsnw_tab)[idx]
    r1 = jnp.asarray(rsnw_tab)[idx + 1]
    delr = jnp.clip((r - r0) / (r1 - r0), 0.0, 1.0)

    def interp(tab):
        t = jnp.asarray(tab[ns])
        return t[idx] * (1.0 - delr) + t[idx + 1] * delr

    Qs = interp(Qs_tab)
    ws = interp(ws_tab)
    gs = interp(gs_tab)
    ks = Qs * ((rhosnw / 917.0) * 3.0
               / (4.0 * jnp.maximum(rsnw_eff, 1.0) * 1.0e-6))
    return ks, ws, gs


def _solution_dedd(tau, w0, g, albodr, albodf, mu0, kfrsnl):
    """Two-stream layer combination (``solution_dEdd:2912-3457``).

    tau/w0/g: (klev+1, ny, nx).  kfrsnl: static int layer index of the
    Fresnel layer.  Returns interface arrays (klev+2, ny, nx).
    """
    klev = tau.shape[0] - 1
    shape = tau.shape[1:]
    one = jnp.ones(shape, tau.dtype)
    zero = jnp.zeros(shape, tau.dtype)

    mu0 = jnp.maximum(mu0, 0.01)
    mu0n_refr = jnp.sqrt(1.0 - (1.0 - mu0 * mu0) / (refindx * refindx))

    trndir = [one]
    trntdr = [one]
    trndif = [one]
    rdndif = [zero]

    rdir_l = []
    rdif_a_l = []
    rdif_b_l = []
    tdir_l = []
    tdif_a_l = []
    tdif_b_l = []
    trnlay_l = []

    def dedd_layer(ts, ws_, gs_, mu):
        """Single-layer delta-Eddington direct solution at cosine mu."""
        lm = jnp.sqrt(3.0 * (1.0 - ws_) * (1.0 - ws_ * gs_))
        ue = 1.5 * (1.0 - ws_ * gs_) / jnp.maximum(lm, cn.puny)
        extins = jnp.maximum(exp_min, jnp.exp(-lm * ts))
        ne = ((ue + 1.0) ** 2 / extins) - ((ue - 1.0) ** 2 * extins)
        rdif = (ue + 1.0) * (ue - 1.0) * (1.0 / extins - extins) / ne
        tdif = 4.0 * ue / ne
        trn = jnp.maximum(exp_min, jnp.exp(-ts / mu))
        denom = 1.0 - lm * lm * mu * mu
        denom = jnp.where(jnp.abs(denom) < cn.puny,
                          jnp.where(denom < 0.0, -cn.puny, cn.puny), denom)
        alp = 0.75 * ws_ * mu * (1.0 + gs_ * (1.0 - ws_)) / denom
        gam = 0.5 * ws_ * ((1.0 + 3.0 * gs_ * (1.0 - ws_) * mu * mu)
                           / denom)
        apg = alp + gam
        amg = alp - gam
        rdr = amg * (tdif * trn - 1.0) + apg * rdif
        tdr = apg * tdif + (amg * rdif - (apg - 1.0)) * trn
        return rdif, tdif, trn, rdr, tdr

    for k in range(klev + 1):
        if k > 0:
            refkm1 = 1.0 / (1.0 - rdndif[k - 1] * rdif_a_l[k - 1])
            tdrrdir = trndir[k - 1] * rdir_l[k - 1]
            tdndif = trntdr[k - 1] - trndir[k - 1]
            trndir.append(trndir[k - 1] * trnlay_l[k - 1])
            trntdr.append(trndir[k - 1] * tdir_l[k - 1]
                          + (tdndif + tdrrdir * rdndif[k - 1])
                          * refkm1 * tdif_a_l[k - 1])
            rdndif.append(rdif_b_l[k - 1]
                          + tdif_b_l[k - 1] * rdndif[k - 1]
                          * refkm1 * tdif_a_l[k - 1])
            trndif.append(trndif[k - 1] * refkm1 * tdif_a_l[k - 1])

        active = trntdr[k] > trmin

        wtot = w0[k]
        gtot = g[k]
        ftot = gtot * gtot
        ts = (1.0 - wtot * ftot) * tau[k]
        ws_ = (1.0 - ftot) * wtot / jnp.maximum(1.0 - wtot * ftot, cn.puny)
        gs_ = (gtot - ftot) / jnp.maximum(1.0 - ftot, cn.puny)
        ws_ = jnp.minimum(ws_, 1.0 - cn.puny)

        mu0n = mu0n_refr if k >= kfrsnl else mu0
        if kfrsnl == 0:
            mu0n = mu0n_refr  # pond: refraction at the very top

        rdif_a, tdif_a, trnlay, rdir, tdir = dedd_layer(ts, ws_, gs_, mu0n)

        # angular re-integration of the diffuse terms (":3303-3320")
        swt = 0.0
        smr = 0.0
        smt = 0.0
        for ng in range(8):
            mu = float(gauspt[ng])
            gwt = float(gauswt[ng])
            swt += mu * gwt
            _rd, _td, _tr, rdr_g, tdr_g = dedd_layer(ts, ws_, gs_, mu)
            smr = smr + mu * rdr_g * gwt
            smt = smt + mu * tdr_g * gwt
        rdif_a = smr / swt
        tdif_a = smt / swt
        rdif_b = rdif_a
        tdif_b = tdif_a

        if k == kfrsnl:
            # insert the Fresnel (refractive) interface (":3345-3393")
            R1 = (mu0 - refindx * mu0n_refr) / (mu0 + refindx * mu0n_refr)
            R2 = (refindx * mu0 - mu0n_refr) / (refindx * mu0 + mu0n_refr)
            T1 = 2.0 * mu0 / (mu0 + refindx * mu0n_refr)
            T2 = 2.0 * mu0 / (refindx * mu0 + mu0n_refr)
            Rf_dir_a = 0.5 * (R1 * R1 + R2 * R2)
            Tf_dir_a = 0.5 * (T1 * T1 + T2 * T2) * refindx * mu0n_refr / mu0
            Rf_dif_a, Tf_dif_a = cp063, 1.0 - cp063
            Rf_dif_b, Tf_dif_b = cp455, 1.0 - cp455

            rintfc = 1.0 / (1.0 - Rf_dif_b * rdif_a)
            tdir = Tf_dir_a * tdir \
                + Tf_dir_a * rdir * Rf_dif_b * rintfc * tdif_a
            rdir = Rf_dir_a + Tf_dir_a * rdir * rintfc * Tf_dif_b
            rdif_b = rdif_b + tdif_b * Rf_dif_b * rintfc * tdif_a
            rdif_a = Rf_dif_a + Tf_dif_a * rdif_a * rintfc * Tf_dif_b
            tdif_a_new = Tf_dif_a * rintfc * tdif_a
            tdif_b = tdif_b * rintfc * Tf_dif_b
            tdif_a = tdif_a_new
            trnlay = Tf_dir_a * trnlay

        # layers with no penetrating radiation stay opaque-zero
        rdir_l.append(jnp.where(active, rdir, 0.0))
        rdif_a_l.append(jnp.where(active, rdif_a, 0.0))
        rdif_b_l.append(jnp.where(active, rdif_b, 0.0))
        tdir_l.append(jnp.where(active, tdir, 0.0))
        tdif_a_l.append(jnp.where(active, tdif_a, 0.0))
        tdif_b_l.append(jnp.where(active, tdif_b, 0.0))
        trnlay_l.append(jnp.where(active, trnlay, 0.0))

    # bottom interface (k = klevp)
    k = klev + 1
    refkm1 = 1.0 / (1.0 - rdndif[k - 1] * rdif_a_l[k - 1])
    tdrrdir = trndir[k - 1] * rdir_l[k - 1]
    tdndif = trntdr[k - 1] - trndir[k - 1]
    trndir.append(trndir[k - 1] * trnlay_l[k - 1])
    trntdr.append(trndir[k - 1] * tdir_l[k - 1]
                  + (tdndif + tdrrdir * rdndif[k - 1])
                  * refkm1 * tdif_a_l[k - 1])
    rdndif.append(rdif_b_l[k - 1] + tdif_b_l[k - 1] * rdndif[k - 1]
                  * refkm1 * tdif_a_l[k - 1])
    trndif.append(trndif[k - 1] * refkm1 * tdif_a_l[k - 1])

    # combine upwards from the ocean (":3418-3443")
    rupdir = [None] * (klev + 2)
    rupdif = [None] * (klev + 2)
    rupdir[klev + 1] = albodr
    rupdif[klev + 1] = albodf
    for k in range(klev, -1, -1):
        refkp1 = 1.0 / (1.0 - rdif_b_l[k] * rupdif[k + 1])
        rupdir[k] = rdir_l[k] + (trnlay_l[k] * rupdir[k + 1]
                                 + (tdir_l[k] - trnlay_l[k])
                                 * rupdif[k + 1]) * refkp1 * tdif_b_l[k]
        rupdif[k] = rdif_a_l[k] + tdif_a_l[k] * rupdif[k + 1] \
            * refkp1 * tdif_b_l[k]

    return (jnp.stack(trndir), jnp.stack(trntdr), jnp.stack(trndif),
            jnp.stack(rupdir), jnp.stack(rupdif), jnp.stack(rdndif))


def _compute_dedd(rad: RadiationConfig, nilyr, nslyr, srftyp, active,
                  fnidr, coszen, swvdr, swvdf, swidr, swidf,
                  hs, rhosnw, rsnw, hi, hp):
    """One surface-type pass of ``compute_dEdd:1796-2903``.

    srftyp: static int (0 bare, 1 snow, 2 pond); active: (ny, nx) mask.
    Returns per-unit-area albedos and absorbed fluxes.
    """
    klev = nslyr + nilyr + 1
    shape = coszen.shape
    dtype = coszen.dtype
    zero = jnp.zeros(shape, dtype)

    avdr = zero
    avdf = zero
    aidr = zero
    aidf = zero
    fsfc = zero
    fint = zero
    fthru = zero
    Sabs = [zero] * nslyr
    Iabs = [zero] * nilyr

    wghtns2 = cp67 + (cp78 - cp67) * (1.0 - fnidr)
    wghtns3 = cp33 + (cp22 - cp33) * (1.0 - fnidr)

    kfrsnl = 0 if srftyp == 2 else nslyr + 2

    for ns in range(nspint):
        ki_ssl, wi_ssl = _tuned_iops(rad.R_ice, fp_ice, fm_ice,
                                     ki_ssl_mn[ns], wi_ssl_mn[ns])
        ki_dl, wi_dl = _tuned_iops(rad.R_ice, fp_ice, fm_ice,
                                   ki_dl_mn[ns], wi_dl_mn[ns])
        ki_int, wi_int = _tuned_iops(rad.R_ice, fp_ice, fm_ice,
                                     ki_int_mn[ns], wi_int_mn[ns])
        ki_p_ssl, wi_p_ssl = _tuned_iops(rad.R_pnd, fp_pnd, fm_pnd,
                                         ki_p_ssl_mn[ns], wi_p_ssl_mn[ns])
        ki_p_int, wi_p_int = _tuned_iops(rad.R_pnd, fp_pnd, fm_pnd,
                                         ki_p_int_mn[ns], wi_p_int_mn[ns])

        taus = []
        w0s = []
        gs = []

        # --- layers above the sea ice (0 .. nslyr) ------------------------
        if srftyp == 0:       # air
            for k in range(nslyr + 1):
                taus.append(zero)
                w0s.append(zero)
                gs.append(zero)
        elif srftyp == 1:     # snow
            dz = hs / nslyr
            dz_ssl = jnp.minimum(hs_ssl, dz / 2.0)
            fr = fr_max * fnidr + fr_min * (1.0 - fnidr)
            for k in range(nslyr + 1):
                ksnow = 0 if k <= 1 else k - 1
                ks_, ws_, gs_ = _snow_iops(ns, fr * rsnw[ksnow],
                                           rhosnw[ksnow])
                if k == 0:
                    taus.append(ks_ * dz_ssl)
                elif k == 1:
                    taus.append(ks_ * (dz - dz_ssl))
                else:
                    taus.append(ks_ * dz)
                w0s.append(ws_ * jnp.ones(shape, dtype))
                gs.append(gs_ * jnp.ones(shape, dtype))
        else:                 # pond
            dz = hp / (nslyr + 1)
            for k in range(nslyr + 1):
                taus.append(kw[ns] * dz)
                w0s.append(jnp.full(shape, ww[ns], dtype))
                gs.append(jnp.full(shape, gw[ns], dtype))

        # --- sea ice layers (kii .. klev) ----------------------------------
        dz = hi / nilyr
        dz_ssl = jnp.where(hi < 1.5, hi / 30.0, hi_ssl)
        dz_ssl = jnp.minimum(dz_ssl, dz / 2.0)
        fs_scale = nilyr / 4.0
        if srftyp <= 1:
            taus.append(ki_ssl * dz_ssl)
            w0s.append(jnp.full(shape, wi_ssl, dtype))
            gs.append(jnp.full(shape, gi_ssl_mn[ns], dtype))
            taus.append(ki_dl * (dz - dz_ssl) * fs_scale)
            w0s.append(jnp.full(shape, wi_dl, dtype))
            gs.append(jnp.full(shape, gi_dl_mn[ns], dtype))
            for k in range(nslyr + 3, klev):
                taus.append(ki_int * dz)
                w0s.append(jnp.full(shape, wi_int, dtype))
                gs.append(jnp.full(shape, gi_int_mn[ns], dtype))
            # lowest layer with algae absorption in the visible
            kabs = ki_int * (1.0 - wi_int)
            if ns == 0:
                kabs = kabs + kalg * (0.50 / jnp.maximum(dz, cn.puny))
            sig = ki_int * wi_int
            taus.append((kabs + sig) * dz)
            w0s.append(sig / (sig + kabs) * jnp.ones(shape, dtype))
            gs.append(jnp.full(shape, gi_int_mn[ns], dtype))
        else:                 # ponded ice column
            taus.append(ki_p_ssl * dz_ssl)
            w0s.append(jnp.full(shape, wi_p_ssl, dtype))
            gs.append(jnp.full(shape, gi_p_ssl_mn[ns], dtype))
            taus.append(ki_p_int * (dz - dz_ssl))
            w0s.append(jnp.full(shape, wi_p_int, dtype))
            gs.append(jnp.full(shape, gi_p_int_mn[ns], dtype))
            for k in range(nslyr + 3, klev + 1):
                taus.append(ki_p_int * dz)
                w0s.append(jnp.full(shape, wi_p_int, dtype))
                gs.append(jnp.full(shape, gi_p_int_mn[ns], dtype))
            # shallow-pond transition back toward bare-ice optics
            trans = (hp >= hpmin) & (hp <= hp0)
            frac = hp / hp0
            kii = nslyr + 1
            sig_i = ki_ssl * wi_ssl
            sig_p = ki_p_ssl * wi_p_ssl
            sig = sig_i + (sig_p - sig_i) * frac
            kext = sig + ki_p_ssl * (1.0 - wi_p_ssl)
            taus[kii] = jnp.where(trans, kext * dz_ssl, taus[kii])
            w0s[kii] = jnp.where(trans, sig / kext, w0s[kii])
            sig_i = ki_dl * wi_dl * fs_scale
            sig_p = ki_p_int * wi_p_int
            sig = sig_i + (sig_p - sig_i) * frac
            kext = sig + ki_p_int * (1.0 - wi_p_int)
            taus[kii + 1] = jnp.where(trans, kext * (dz - dz_ssl),
                                      taus[kii + 1])
            w0s[kii + 1] = jnp.where(trans, sig / kext, w0s[kii + 1])
            sig_i = ki_int * wi_int
            sig = sig_i + (sig_p - sig_i) * frac
            kext = sig + ki_p_int * (1.0 - wi_p_int)
            for k in range(kii + 2, klev + 1):
                taus[k] = jnp.where(trans, kext * dz, taus[k])
                w0s[k] = jnp.where(trans, sig / kext, w0s[k])

        tau = jnp.stack(taus)
        w0 = jnp.stack(w0s)
        g = jnp.stack(gs)

        albodr = jnp.full(shape, cp01 if ns == 0 else 0.0, dtype)
        albodf = albodr

        trndir, trntdr, trndif, rupdir, rupdif, rdndif = _solution_dedd(
            tau, w0, g, albodr, albodf, coszen, kfrsnl)

        # interface fluxes (":2656-2680")
        refk = 1.0 / (1.0 - rdndif * rupdif)
        fdirup = (trndir * rupdir + (trntdr - trndir) * rupdif) * refk
        fdirdn = trndir + (trntdr - trndir
                           + trndir * rupdir * rdndif) * refk
        fdifup = trndif * rupdif * refk
        fdifdn = trndif * refk

        ksrf = 1 if srftyp == 1 else nslyr + 2
        klevp = klev + 1

        if ns == 0:
            swdr, swdf = swvdr, swvdf
            wght = 1.0
        else:
            swdr, swdf = swidr, swidf
            wght = wghtns2 if ns == 1 else wghtns3

        def net(k):
            return ((fdirdn[k] - fdirup[k]) * swdr
                    + (fdifdn[k] - fdifup[k]) * swdf)

        if ns == 0:
            avdr = rupdir[0]
            avdf = rupdif[0]
        else:
            aidr = aidr + rupdir[0] * wght
            aidf = aidf + rupdif[0] * wght

        fsfc = fsfc + (net(0) - net(ksrf)) * wght
        fint = fint + (net(ksrf) - net(klevp)) * wght
        fthru = fthru + net(klevp) * wght

        if srftyp == 1:
            for k in range(1, nslyr + 1):
                Sabs[k - 1] = Sabs[k - 1] + (net(k) - net(k + 1)) * wght
        for ki_ in range(nilyr):
            k = nslyr + 2 + ki_
            km, kp = k, k + 1
            if srftyp == 1 and ki_ == 0:
                km, kp = k - 1, k + 1
            Iabs[ki_] = Iabs[ki_] + (net(km) - net(kp)) * wght

    m = active
    out = dict(
        avdr=jnp.where(m, avdr, 0.0), avdf=jnp.where(m, avdf, 0.0),
        aidr=jnp.where(m, aidr, 0.0), aidf=jnp.where(m, aidf, 0.0),
        fsfc=jnp.where(m, fsfc, 0.0), fint=jnp.where(m, fint, 0.0),
        fthru=jnp.where(m, fthru, 0.0),
        Sabs=jnp.stack([jnp.where(m, s, 0.0) for s in Sabs]),
        Iabs=jnp.stack([jnp.where(m, s, 0.0) for s in Iabs]),
    )
    return out


def shortwave_dEdd(rad: RadiationConfig, nilyr, nslyr,
                   aicen, vicen, vsnon, tsfcn, coszen,
                   swvdr, swvdf, swidr, swidf,
                   apond=None, hpond=None):
    """Full dEdd driver for one category (``shortwave_dEdd:1372-1787``).

    apond/hpond: explicit pond tracer fields (when tr_pond); otherwise
    the parameterized pond of `set_pond` is used.

    Returns the same dict keys as shortwave_ccsm3.
    """
    has = (aicen > cn.puny) & (coszen > cn.puny)
    a_s = jnp.maximum(aicen, cn.puny)
    hi = jnp.where(has, vicen / a_s, 0.0)
    hs = jnp.where(has, vsnon / a_s, 0.0)

    fnidr = jnp.where(swidr + swidf > cn.puny,
                      swidr / jnp.maximum(swidr + swidf, cn.puny), 0.0)

    fs, rhosnw_v, rsnw_v = set_snow(rad, aicen, vsnon, tsfcn)
    if apond is not None and hpond is not None:
        fp_, hp_ = apond, hpond
        fp_ = jnp.minimum(fp_, 1.0 - fs)
    else:
        fp_, hp_ = set_pond(aicen, tsfcn, fs)
    fp_ = jnp.where(hp_ > hpmin, fp_, 0.0)
    fi = jnp.maximum(1.0 - fs - fp_, 0.0)

    rhosnw_l = [rhosnw_v] * nslyr
    rsnw_l = [rsnw_v] * nslyr

    zero = jnp.zeros_like(aicen)
    tot = dict(alvdrn=zero, alvdfn=zero, alidrn=zero, alidfn=zero,
               fswsfc=zero, fswint=zero, fswthru=zero,
               Sswabs=jnp.zeros((nslyr,) + aicen.shape, aicen.dtype),
               Iswabs=jnp.zeros((nilyr,) + aicen.shape, aicen.dtype),
               albin=zero, albsn=zero, albpn=zero)

    for srftyp, frac in ((0, fi), (1, fs), (2, fp_)):
        active = has & (frac > 0.0)
        r = _compute_dedd(rad, nilyr, nslyr, srftyp, active, fnidr,
                          coszen, swvdr, swvdf, swidr, swidf,
                          hs, rhosnw_l, rsnw_l, hi, hp_)
        tot["alvdrn"] = tot["alvdrn"] + r["avdr"] * frac
        tot["alvdfn"] = tot["alvdfn"] + r["avdf"] * frac
        tot["alidrn"] = tot["alidrn"] + r["aidr"] * frac
        tot["alidfn"] = tot["alidfn"] + r["aidf"] * frac
        tot["fswsfc"] = tot["fswsfc"] + r["fsfc"] * frac
        tot["fswint"] = tot["fswint"] + r["fint"] * frac
        tot["fswthru"] = tot["fswthru"] + r["fthru"] * frac
        tot["Sswabs"] = tot["Sswabs"] + r["Sabs"] * frac[None]
        tot["Iswabs"] = tot["Iswabs"] + r["Iabs"] * frac[None]
        broadband = (cn.awtvdr * r["avdr"] + cn.awtidr * r["aidr"]
                     + cn.awtvdf * r["avdf"] + cn.awtidf * r["aidf"])
        key = {0: "albin", 1: "albsn", 2: "albpn"}[srftyp]
        tot[key] = tot[key] + broadband

    # aliases matching the ccsm3 interface
    tot["alvdrni"] = tot["alvdrn"]
    tot["alidrni"] = tot["alidrn"]
    tot["alvdfni"] = tot["alvdfn"]
    tot["alidfni"] = tot["alidfn"]
    tot["alvdrns"] = tot["alvdrn"]
    tot["alidrns"] = tot["alidrn"]
    tot["alvdfns"] = tot["alvdfn"]
    tot["alidfns"] = tot["alidfn"]
    tot["asnow"] = fs
    return tot
