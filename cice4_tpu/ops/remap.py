"""Incremental remapping transport (Dukowicz & Baumgardner 2000;
Lipscomb & Hunke 2004).

Dense JAX reworking of ``source/ice_transport_remap.F90`` +
``ice_transport_driver.F90 transport_remap:179-663``.  Second-order,
monotone (van-Leer-limited linear reconstruction), conservative, and
cheap per tracer.

The reference builds compressed triangle lists per edge with ~1400
lines of branchy geometry (`locate_triangles:1763-3146`); here every
edge of the grid carries a dense set of up-to-6 departure triangles
(the reference's `ngroups = 6`), selected with nested `jnp.where`
over the mutually-exclusive geometric cases — no data-dependent
shapes, fully vectorized over the plane.

As in the reference, all local geometry is computed on the *scaled*
grid (cell = unit square; `horizontal_remap` passes 1.0 for
HTN/HTE/dxt/dyt, and `init_remap:266-319` sets xav = yav = 0,
xxav = yyav = 1/12); physical areas enter only through the corner
area factors dxu*dyu and the final 1/tarea.

Transported quantities (`state_to_tracers:847-1003`): open water and
per-category area are the "mass"; thickness hi = v/a and hs, surface
temperature and area tracers ride on the mass; layer enthalpies
q = e/v and volume tracers ride on hi (tracer_type 2 with dependents).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cice4_tpu import constants as cn
from cice4_tpu.constants import FieldLoc, FieldType
from cice4_tpu.grid import Grid
from cice4_tpu.ops.itd import TRACER_DEPEND
from cice4_tpu.parallel import halo as h
from cice4_tpu.state import State

NGROUPS = 6

# neighbor-position codes for flux cells
TL, BL, TR, BR, TC, BC = 0, 1, 2, 3, 4, 5

# (ishift, jshift) per position, per edge (ice_transport_remap.F90:1990-2030)
SHIFTS = {
    "north": {TL: (-1, 1), BL: (-1, 0), TR: (1, 1), BR: (1, 0),
              TC: (0, 1), BC: (0, 0)},
    "east": {TL: (1, 1), BL: (0, 1), TR: (1, -1), BR: (0, -1),
             TC: (1, 0), BC: (0, 0)},
}


def _shifted(field, edge, pos, bc):
    """Field value at the flux cell `pos` relative to each edge cell."""
    if edge == "north":
        ops = {TL: lambda f: h.nbr_n(h.nbr_w(f, bc), bc),
               BL: lambda f: h.nbr_w(f, bc),
               TR: lambda f: h.nbr_ne(f, bc),
               BR: lambda f: h.nbr_e(f, bc),
               TC: lambda f: h.nbr_n(f, bc),
               BC: lambda f: f}
    else:
        ops = {TL: lambda f: h.nbr_ne(f, bc),
               BL: lambda f: h.nbr_n(f, bc),
               TR: lambda f: h.nbr_e(h.nbr_s(f, bc), bc),
               BR: lambda f: h.nbr_s(f, bc),
               TC: lambda f: h.nbr_e(f, bc),
               BC: lambda f: f}
    return ops[pos](field)


def limited_gradient(phi, phimask, cnx, cny, bc):
    """Van-Leer limited gradient on the scaled grid
    (``limited_gradient:1392-1556`` with dxt = dyt = HTN = HTE = 1).

    cnx/cny: coordinates of the reference point the reconstruction is
    centered on (e.g. center of mass).
    """
    def nb(dirfn):
        m = dirfn(phimask, bc)
        p = dirfn(phi, bc)
        return m * p + (1.0 - m) * phi

    phi_e = nb(h.nbr_e)
    phi_w = nb(h.nbr_w)
    phi_n = nb(h.nbr_n)
    phi_s = nb(h.nbr_s)
    phi_ne = nb(h.nbr_ne)
    phi_nw = nb(h.nbr_nw)
    phi_se = nb(h.nbr_se)
    phi_sw = nb(h.nbr_sw)

    # reference: (phi_e-phi)/2 + (phi-phi_w)/2 = (phi_e - phi_w)/2
    gx = 0.5 * (phi_e - phi_w)
    gy = 0.5 * (phi_n - phi_s)

    pmn = jnp.minimum(
        jnp.minimum(jnp.minimum(phi_nw, phi_n),
                    jnp.minimum(phi_ne, phi_w)),
        jnp.minimum(jnp.minimum(phi, phi_e),
                    jnp.minimum(jnp.minimum(phi_sw, phi_s), phi_se)))
    pmx = jnp.maximum(
        jnp.maximum(jnp.maximum(phi_nw, phi_n),
                    jnp.maximum(phi_ne, phi_w)),
        jnp.maximum(jnp.maximum(phi, phi_e),
                    jnp.maximum(jnp.maximum(phi_sw, phi_s), phi_se)))
    pmn = pmn - phi
    pmx = pmx - phi

    # reconstruction at the 4 cell corners (scaled widths = 1)
    w1 = (0.5 - cnx) * gx + (0.5 - cny) * gy
    w2 = (0.5 - cnx) * gx - (0.5 + cny) * gy
    w3 = -(0.5 + cnx) * gx - (0.5 + cny) * gy
    w4 = (0.5 - cny) * gy - (0.5 + cnx) * gx

    qmn = jnp.minimum(jnp.minimum(w1, w2), jnp.minimum(w3, w4))
    qmx = jnp.maximum(jnp.maximum(w1, w2), jnp.maximum(w3, w4))

    wa = jnp.where(jnp.abs(qmn) > 0.0,
                   jnp.maximum(0.0, pmn / jnp.where(qmn != 0.0, qmn, 1.0)),
                   1.0)
    wb = jnp.where(jnp.abs(qmx) > 0.0,
                   jnp.maximum(0.0, pmx / jnp.where(qmx != 0.0, qmx, 1.0)),
                   1.0)
    lim = jnp.minimum(1.0, jnp.minimum(wa, wb))
    lim = lim * phimask  # no gradient where the center itself is masked
    return lim * gx, lim * gy


def _edge_geometry(edge, grid: Grid, dx, dy):
    """Departure-triangle geometry for all edges of one direction
    (``locate_triangles:1763-3146``, l_fixed_area = F, 0-based groups).

    dx/dy: scaled departure displacements at U corners (= -dt*u/dxu).
    Returns per group g: verts[g] = (x1,y1,x2,y2,x3,y3) in edge-local
    coordinates, pos[g] (int code), fac[g] (signed physical area
    factor).  All arrays (ny, nx), indexed by the cell whose
    north/east edge this is.
    """
    bc = grid.bc
    kw = dict(loc=FieldLoc.NE_CORNER, ftype=FieldType.VECTOR)
    zero = jnp.zeros_like(dx)

    afac = grid.dxu * grid.dyu
    if edge == "north":
        dxl = h.nbr_w(dx, bc, **kw)
        dyl = h.nbr_w(dy, bc, **kw)
        xdl = -0.5 + dxl
        ydl = dyl
        xdr = 0.5 + dx
        ydr = dy
        afl = h.nbr_w(afac, bc)
        afr = afac
    else:  # east edge; rotate trajectory by pi/2
        xdl = -0.5 - dy
        ydl = dx
        xdr = 0.5 - h.nbr_s(dy, bc, **kw)
        ydr = h.nbr_s(dx, bc, **kw)
        afl = afac
        afr = h.nbr_s(afac, bc)
    afc = 0.5 * (afl + afr)

    xcl, ycl = -0.5, 0.0
    xcr, ycr = 0.5, 0.0

    xdm = 0.5 * (xdr + xdl)
    ydm = 0.5 * (ydr + ydl)

    dxseg = jnp.where(jnp.abs(xdm - xdl) > 0.0, xdm - xdl, cn.puny)
    yil = (xcl * (ydm - ydl) + xdm * ydl - xdl * ydm) / dxseg
    dxseg = jnp.where(jnp.abs(xdr - xdm) > 0.0, xdr - xdm, cn.puny)
    yir = (xcr * (ydr - ydm) - xdm * ydr + xdr * ydm) / dxseg

    md = (ydr - ydl) / jnp.where(jnp.abs(xdr - xdl) > 0.0,
                                 xdr - xdl, cn.puny)
    xic = jnp.where(jnp.abs(md) > cn.puny,
                    xdl - ydl / jnp.where(md != 0.0, md, 1.0), 0.0)
    yic = zero
    xil = jnp.full_like(dx, xcl)
    xir = jnp.full_like(dx, xcr)

    def tri(x1, y1, x2, y2, x3, y3):
        return (x1, y1, x2, y2, x3, y3)

    ZTRI = tri(zero, zero, zero, zero, zero, zero)
    iZ = jnp.full_like(dx, BC, dtype=jnp.int32)

    verts = [ZTRI] * NGROUPS
    pos = [iZ] * NGROUPS
    fac = [zero] * NGROUPS

    def sel_tri(cond, newtri, newpos, newfac, g):
        v = tuple(jnp.where(cond, nv, ov)
                  for nv, ov in zip(newtri, verts[g]))
        p = jnp.where(cond, newpos, pos[g])
        f = jnp.where(cond, newfac, fac[g])
        verts[g] = v
        pos[g] = p
        fac[g] = f

    CL = jnp.full_like(dx, xcl)
    CR = jnp.full_like(dx, xcr)
    Z = zero

    # ---- left corner triangles (groups 0 and 2) ---------------------------
    left = xdl < xcl
    c_tl = left & (yil > 0.0) & (ydl >= 0.0)
    c_bl = left & (yil < 0.0) & (ydl < 0.0)
    c_tl1 = left & (yil < 0.0) & (ydl >= 0.0)
    c_tl2 = left & (yil > 0.0) & (ydl < 0.0)

    sel_tri(c_tl, tri(CL, Z, xil, yil, xdl, ydl), TL, -afl, 0)
    sel_tri(c_bl, tri(CL, Z, xdl, ydl, xil, yil), BL, afl, 0)
    sel_tri(c_tl1, tri(CL, Z, xdl, ydl, xic, yic), TL, afl, 0)
    sel_tri(c_tl1, tri(CL, Z, xic, yic, xil, yil), BL, afl, 2)
    sel_tri(c_tl2, tri(CL, Z, xil, yil, xic, yic), TL, -afl, 2)
    sel_tri(c_tl2, tri(CL, Z, xic, yic, xdl, ydl), BL, -afl, 0)

    # ---- right corner triangles (groups 1 and 2) --------------------------
    right = xdr >= xcr
    c_tr = right & (yir > 0.0) & (ydr >= 0.0)
    c_br = right & (yir < 0.0) & (ydr < 0.0)
    c_tr1 = right & (yir < 0.0) & (ydr >= 0.0)
    c_tr2 = right & (yir > 0.0) & (ydr < 0.0)

    sel_tri(c_tr, tri(CR, Z, xdr, ydr, xir, yir), TR, -afr, 1)
    sel_tri(c_br, tri(CR, Z, xir, yir, xdr, ydr), BR, afr, 1)
    sel_tri(c_tr1, tri(CR, Z, xic, yic, xdr, ydr), TR, afr, 1)
    sel_tri(c_tr1, tri(CR, Z, xir, yir, xic, yic), BR, afr, 2)
    sel_tri(c_tr2, tri(CR, Z, xic, yic, xir, yir), TR, -afr, 2)
    sel_tri(c_tr2, tri(CR, Z, xdr, ydr, xic, yic), BR, -afr, 1)

    # note: c_tl1 & c_tr* combinations can both claim group 2; the
    # reference guarantees exclusivity (left and right corner cannot
    # both split in the same cell unless flow is wildly divergent, in
    # which case one of the pair overwrites as in the sequential code).

    # ---- redefine DL/DR to the edge intersections if beyond corners -------
    xdl2 = jnp.where(left, xil, xdl)
    ydl2 = jnp.where(left, yil, ydl)
    xdr2 = jnp.where(right, xir, xdr)
    ydr2 = jnp.where(right, yir, ydr)
    icl = xic
    icr = xic

    # ---- center triangles (groups 3, 4, 5) --------------------------------
    dlp = ydl2 >= 0.0
    drp = ydr2 >= 0.0
    dmp = ydm >= 0.0
    icp = xic >= 0.0

    DL = (xdl2, ydl2)
    DR = (xdr2, ydr2)
    DM = (xdm, ydm)
    ICL = (icl, yic)
    ICR = (icr, yic)
    CLt = (CL, Z)
    CRt = (CR, Z)

    def T(a, b, c):
        return tri(a[0], a[1], b[0], b[1], c[0], c[1])

    cases = [
        # (condition, [(tri, pos, fac) for groups 3,4,5])
        (dlp & drp & dmp,
         [(T(CLt, CRt, DL), TC, -afc), (T(CRt, DR, DL), TC, -afc),
          (T(DL, DR, DM), TC, -afc)]),
        (dlp & drp & ~dmp,
         [(T(CLt, ICL, DL), TC, -afc), (T(CRt, DR, ICR), TC, -afc),
          (T(ICR, ICL, DM), BC, afc)]),
        (~dlp & ~drp & ~dmp,
         [(T(CLt, DL, CRt), BC, afc), (T(CRt, DL, DR), BC, afc),
          (T(DL, DM, DR), BC, afc)]),
        (~dlp & ~drp & dmp,
         [(T(CLt, DL, ICL), BC, afc), (T(CRt, ICR, DR), BC, afc),
          (T(ICL, ICR, DM), TC, -afc)]),
        (dlp & ~drp & icp & dmp,
         [(T(CLt, ICR, DL), TC, -afc), (T(CRt, ICR, DR), BC, afr),
          (T(DL, ICR, DM), TC, -afc)]),
        (dlp & ~drp & icp & ~dmp,
         [(T(CLt, ICL, DL), TC, -afc), (T(CRt, ICR, DR), BC, afr),
          (T(ICR, ICL, DM), BC, afc)]),
        (dlp & ~drp & ~icp & ~dmp,
         [(T(CLt, ICL, DL), TC, -afl), (T(CRt, ICL, DR), BC, afc),
          (T(DR, ICL, DM), BC, afc)]),
        (dlp & ~drp & ~icp & dmp,
         [(T(CLt, ICL, DL), TC, -afl), (T(CRt, ICR, DR), BC, afc),
          (T(ICL, ICR, DM), TC, -afc)]),
        (~dlp & drp & ~icp & dmp,
         [(T(CLt, DL, ICL), BC, afl), (T(CRt, DR, ICL), TC, -afc),
          (T(ICL, DR, DM), TC, -afc)]),
        (~dlp & drp & ~icp & ~dmp,
         [(T(CLt, DL, ICL), BC, afl), (T(CRt, DR, ICR), TC, -afc),
          (T(ICR, ICL, DM), BC, afc)]),
        (~dlp & drp & icp & ~dmp,
         [(T(CLt, DL, ICR), BC, afc), (T(CRt, DR, ICR), TC, -afr),
          (T(ICR, DL, DM), BC, afc)]),
        (~dlp & drp & icp & dmp,
         [(T(CLt, DL, ICL), BC, afc), (T(CRt, DR, ICR), TC, -afr),
          (T(ICL, ICR, DM), TC, -afc)]),
    ]
    for cond, tris in cases:
        for k, (tv, tp, tf) in enumerate(tris):
            sel_tri(cond, tv, tp, tf, 3 + k)

    # ---- triangle areas ----------------------------------------------------
    triarea = []
    for g in range(NGROUPS):
        x1, y1, x2, y2, x3, y3 = verts[g]
        a = 0.5 * ((x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)) * fac[g]
        a = jnp.where(jnp.abs(a) < cn.eps16 * afc, 0.0, a)
        triarea.append(a)

    # ---- transform vertices to flux-cell coordinates ----------------------
    ish = {p: SHIFTS[edge][p][0] for p in range(6)}
    jsh = {p: SHIFTS[edge][p][1] for p in range(6)}
    local = []
    for g in range(NGROUPS):
        x1, y1, x2, y2, x3, y3 = verts[g]
        isg = sum(jnp.where(pos[g] == p, ish[p], 0) for p in range(6))
        jsg = sum(jnp.where(pos[g] == p, jsh[p], 0) for p in range(6))
        if edge == "north":
            lx = tuple(x - isg for x in (x1, x2, x3))
            ly = tuple(y + 0.5 - jsg for y in (y1, y2, y3))
        else:
            lx = tuple(y + 0.5 - isg for y in (y1, y2, y3))
            ly = tuple(-x - jsg for x in (x1, x2, x3))
        local.append((lx, ly))

    return dict(verts=local, pos=pos, triarea=triarea)


def _quad_points(lx, ly, order):
    """Quadrature points + weights from triangle vertices
    (``triangle_coordinates:3155-3297``)."""
    x0 = (lx[0] + lx[1] + lx[2]) / 3.0
    y0 = (ly[0] + ly[1] + ly[2]) / 3.0
    if order == 1:
        return [(x0, y0, 1.0)]
    if order == 2:
        pts = []
        for k in range(3):
            pts.append((0.5 * lx[k] + 0.5 * x0, 0.5 * ly[k] + 0.5 * y0,
                        1.0 / 3.0))
        return pts
    # cubic 4-point
    pts = [(x0, y0, -0.5625)]
    for k in range(3):
        pts.append((0.4 * lx[k] + 0.6 * x0, 0.4 * ly[k] + 0.6 * y0,
                    0.52083333333333333))
    return pts


class _TraceField:
    """One transported tracer: value + reconstruction + hierarchy."""

    __slots__ = ("name", "ttype", "parent", "tm", "tmask", "tc", "tx", "ty",
                 "mtxav", "mtyav")

    def __init__(self, name, ttype, parent):
        self.name = name
        self.ttype = ttype
        self.parent = parent


def _construct_category(mm, hm_real, tracers, bc):
    """Reconstruction coefficients for one category
    (``construct_fields:1069-1382``)."""
    mmask = (mm > cn.puny).astype(mm.dtype)
    mx, my = limited_gradient(mm, hm_real, jnp.zeros_like(mm),
                              jnp.zeros_like(mm), bc)
    mc = mm  # xav = yav = 0
    safe_mm = jnp.maximum(mm, cn.puny)
    mxav = jnp.where(mmask > 0, mx / (12.0 * safe_mm), 0.0)
    myav = jnp.where(mmask > 0, my / (12.0 * safe_mm), 0.0)

    for t in tracers:
        t.tmask = (jnp.abs(t.tm) > 0.0).astype(mm.dtype) * mmask
        if t.ttype == 1:
            tx, ty = limited_gradient(t.tm, mmask, mxav, myav, bc)
            tcv = t.tm - tx * mxav - ty * myav
            t.tc, t.tx, t.ty = tcv, tx, ty
            # center of mass*tracer, needed by dependents
            w2 = mc * tx + mx * tcv
            w3 = mc * ty + my * tcv
            denom = jnp.maximum(mm * t.tm, cn.puny)
            good = (mmask > 0) & (jnp.abs(t.tm) > cn.puny)
            t.mtxav = jnp.where(good, w2 / (12.0 * denom), 0.0)
            t.mtyav = jnp.where(good, w3 / (12.0 * denom), 0.0)
        else:  # ttype == 2
            p = tracers[t.parent]
            tx, ty = limited_gradient(t.tm, p.tmask, p.mtxav, p.mtyav, bc)
            t.tc = t.tm - tx * p.mtxav - ty * p.mtyav
            t.tx, t.ty = tx, ty
            t.mtxav = None
            t.mtyav = None
    return dict(mc=mc, mx=mx, my=my)


def _edge_integrals(edge, geom, mrec, tracers, bc, order):
    """Mass and mass*tracer fluxes across all edges of one direction
    (``transport_integrals:3307-3632``)."""
    # shifted copies of reconstruction fields for the 6 flux positions
    def shift6(f):
        return [_shifted(f, edge, p, bc) for p in range(6)]

    mc6 = shift6(mrec["mc"])
    mx6 = shift6(mrec["mx"])
    my6 = shift6(mrec["my"])
    tc6 = [shift6(t.tc) for t in tracers]
    tx6 = [shift6(t.tx) for t in tracers]
    ty6 = [shift6(t.ty) for t in tracers]

    mflx = 0.0
    mtflx = [0.0] * len(tracers)

    for g in range(NGROUPS):
        lx, ly = geom["verts"][g]
        pos = geom["pos"][g]
        area = geom["triarea"][g]

        def gather(f6):
            out = f6[5]
            for p in range(5):
                out = jnp.where(pos == p, f6[p], out)
            return out

        mcg = gather(mc6)
        mxg = gather(mx6)
        myg = gather(my6)

        pts = _quad_points(lx, ly, order)
        msum = 0.0
        mxsum = 0.0
        mysum = 0.0
        mxxsum = 0.0
        mxysum = 0.0
        myysum = 0.0
        for (px, py, w) in pts:
            mq = w * (mcg + px * mxg + py * myg)
            msum = msum + mq
            mxsum = mxsum + mq * px
            mysum = mysum + mq * py
            mxxsum = mxxsum + mq * px * px
            mxysum = mxysum + mq * px * py
            myysum = myysum + mq * py * py
        mflx = mflx + area * msum

        mtsum = [None] * len(tracers)
        mtxsum = [None] * len(tracers)
        mtysum = [None] * len(tracers)
        for k, t in enumerate(tracers):
            tcg = gather(tc6[k])
            txg = gather(tx6[k])
            tyg = gather(ty6[k])
            if t.ttype == 1:
                mts = msum * tcg + mxsum * txg + mysum * tyg
                mtxsum[k] = mxsum * tcg + mxxsum * txg + mxysum * tyg
                mtysum[k] = mysum * tcg + mxysum * txg + myysum * tyg
            else:
                kp = t.parent
                mts = (mtsum[kp] * tcg + mtxsum[kp] * txg
                       + mtysum[kp] * tyg)
            mtsum[k] = mts
            mtflx[k] = mtflx[k] + area * mts

    return mflx, mtflx


def transport_remap(state: State, grid: Grid, dt,
                    integral_order: int = 2) -> State:
    """Full incremental-remapping advection of the ice state."""
    bc = grid.bc
    ncat = state.ncat
    nilyr = state.eicen.shape[1]
    nslyr = state.esnon.shape[1]

    # scaled departure displacements at U corners (departure_points)
    dx = -dt * state.uvel / grid.dxu
    dy = -dt * state.vvel / grid.dyu

    geom_e = _edge_geometry("east", grid, dx, dy)
    geom_n = _edge_geometry("north", grid, dx, dy)

    # --- state_to_tracers (driver ":847-1003") -----------------------------
    aice0 = jnp.maximum(1.0 - jnp.sum(state.aicen, 0), 0.0)
    tracer_names = list(state.trcrn.keys())

    def cat_tracers(n):
        """Build the ordered tracer list for category n."""
        a = state.aicen[n]
        has = a > cn.puny
        a_s = jnp.maximum(a, cn.puny)
        hi = jnp.where(has, state.vicen[n] / a_s, 0.0)
        hs = jnp.where(has, state.vsnon[n] / a_s, 0.0)
        v_s = jnp.maximum(state.vicen[n], cn.puny)
        vs_s = jnp.maximum(state.vsnon[n], cn.puny)

        tr = []
        t = _TraceField("hi", 1, None)
        t.tm = hi
        tr.append(t)
        t = _TraceField("hs", 1, None)
        t.tm = hs
        tr.append(t)
        t = _TraceField("Tsfc", 1, None)
        t.tm = jnp.where(has, state.tsfcn[n], 0.0)
        tr.append(t)
        for name in tracer_names:
            dep = TRACER_DEPEND[name]
            ttype = 1 if dep == 0 else 2
            parent = None if dep == 0 else (0 if dep == 1 else 1)
            t = _TraceField(name, ttype, parent)
            t.tm = jnp.where(has, state.trcrn[name][n], 0.0)
            tr.append(t)
        for k in range(nilyr):
            # qice_k = eicen_k / vicen (state_to_tracers ":925-931")
            t = _TraceField(f"qi{k}", 2, 0)
            t.tm = jnp.where(has, state.eicen[n, k] / v_s, 0.0)
            tr.append(t)
        for k in range(nslyr):
            # qsno_k = esnon_k / vsnon + rhos*Lfresh (":936-943")
            t = _TraceField(f"qs{k}", 2, 1)
            qs = state.esnon[n, k] / vs_s + cn.rhos * cn.Lfresh
            t.tm = jnp.where(has & (hs > cn.puny), qs, 0.0)
            tr.append(t)
        return a, tr

    # --- advect open water (mass only); the advected aice0 feeds the
    # ridging opening/closing rates (ridge_prep's divu_adv) ----------------
    rec0 = _construct_category(aice0, grid.hm, [], bc)
    mflx0_e, _ = _edge_integrals("east", geom_e, rec0, [], bc,
                                 integral_order)
    mflx0_n, _ = _edge_integrals("north", geom_n, rec0, [], bc,
                                 integral_order)
    aice0_new = aice0 - (mflx0_e - h.nbr_w(mflx0_e, bc)
                         + mflx0_n - h.nbr_s(mflx0_n, bc)) * grid.tarear
    aice0_new = jnp.where(grid.tmask, jnp.maximum(aice0_new, 0.0), 0.0)

    # --- advect each category ----------------------------------------------
    new_aicen = []
    new_vicen = []
    new_vsnon = []
    new_tsfcn = []
    new_eicen = []
    new_esnon = []
    new_trcrn = {name: [] for name in tracer_names}

    for n in range(ncat):
        mm, tracers = cat_tracers(n)
        rec = _construct_category(mm, grid.hm, tracers, bc)
        mfe, mtfe = _edge_integrals("east", geom_e, rec, tracers, bc,
                                    integral_order)
        mfn, mtfn = _edge_integrals("north", geom_n, rec, tracers, bc,
                                    integral_order)

        # update_fields (":3642-3868")
        mtold = []
        for k, t in enumerate(tracers):
            if t.ttype == 1:
                mtold.append(mm * t.tm)
            else:
                mtold.append(mm * tracers[t.parent].tm * t.tm)

        div = (mfe - h.nbr_w(mfe, bc) + mfn - h.nbr_s(mfn, bc)) \
            * grid.tarear
        mm_new = jnp.maximum(mm - div, 0.0)
        mm_new = jnp.where(grid.tmask, mm_new, 0.0)
        pos_m = mm_new > 0.0
        safe = jnp.maximum(mm_new, cn.puny)

        tnew = []
        for k, t in enumerate(tracers):
            divt = (mtfe[k] - h.nbr_w(mtfe[k], bc)
                    + mtfn[k] - h.nbr_s(mtfn[k], bc)) * grid.tarear
            mt = mtold[k] - divt
            if t.ttype == 1:
                tv = jnp.where(pos_m, mt / safe, 0.0)
            else:
                # parents (hi, hs) are nonnegative thicknesses
                pv = tnew[t.parent]
                tv = jnp.where(pos_m & (pv > 0.0),
                               mt / jnp.maximum(mm_new * pv, cn.puny), 0.0)
            tnew.append(tv)

        # tracers_to_state (driver ":1012-1137")
        a = mm_new
        hi = jnp.maximum(tnew[0], 0.0)
        hs = jnp.maximum(tnew[1], 0.0)
        new_aicen.append(a)
        new_vicen.append(a * hi)
        new_vsnon.append(a * hs)
        new_tsfcn.append(jnp.where(pos_m, tnew[2], cn.Tocnfrz))
        base = 3
        for idx, name in enumerate(tracer_names):
            new_trcrn[name].append(tnew[base + idx])
        base = 3 + len(tracer_names)
        eic = []
        for k in range(nilyr):
            # eicen_k = qice_k * vicen (tracers_to_state inverse)
            eic.append(jnp.minimum(tnew[base + k], 0.0) * a * hi)
        new_eicen.append(jnp.stack(eic))
        base = base + nilyr
        esn = []
        for k in range(nslyr):
            qs = tnew[base + k] - cn.rhos * cn.Lfresh
            esn.append(jnp.minimum(qs, 0.0) * a * hs)
        new_esnon.append(jnp.stack(esn))

    state = state.replace(
        aicen=jnp.stack(new_aicen), vicen=jnp.stack(new_vicen),
        vsnon=jnp.stack(new_vsnon), tsfcn=jnp.stack(new_tsfcn),
        eicen=jnp.stack(new_eicen), esnon=jnp.stack(new_esnon),
        trcrn={k: jnp.stack(v) for k, v in new_trcrn.items()})
    return state, aice0_new
