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

# which positions each triangle group can flux into (static): the
# corner groups touch only their own corner cells, the three central
# groups only TC/BC — this bounds the gather-select chains
GROUP_POSITIONS = ((TL, BL), (TR, BR), (TL, BL, TR, BR),
                   (TC, BC), (TC, BC), (TC, BC))

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


def _tracer_meta(tracer_names, nilyr, nslyr):
    """Static transported-tracer table (``init_transport:81-170``):
    (name, tracer_type, parent_row).  Rows: hi, hs, Tsfc, optional
    tracers, qice layers (depend on hi), qsno layers (depend on hs)."""
    meta = [("hi", 1, -1), ("hs", 1, -1), ("Tsfc", 1, -1)]
    for name in tracer_names:
        dep = TRACER_DEPEND[name]
        meta.append((name, 1 if dep == 0 else 2,
                     -1 if dep == 0 else (0 if dep == 1 else 1)))
    for k in range(nilyr):
        meta.append((f"qi{k}", 2, 0))
    for k in range(nslyr):
        meta.append((f"qs{k}", 2, 1))
    return meta


def _construct(mm, hm_real, tm, meta, bc):
    """Batched reconstruction for one category
    (``construct_fields:1069-1382``).  tm: (T, ny, nx) stacked tracers.

    Returns (mc, mx, my, tc, tx, ty) with tracer arrays stacked.
    """
    idx1 = [k for k, (_, tt, _p) in enumerate(meta) if tt == 1]
    idx2 = [k for k, (_, tt, _p) in enumerate(meta) if tt == 2]
    par2 = [meta[k][2] for k in idx2]

    mmask = (mm > cn.puny).astype(mm.dtype)
    mx, my = limited_gradient(mm, hm_real, jnp.zeros_like(mm),
                              jnp.zeros_like(mm), bc)
    mc = mm
    safe_mm = jnp.maximum(mm, cn.puny)
    mxav = jnp.where(mmask > 0, mx / (12.0 * safe_mm), 0.0)
    myav = jnp.where(mmask > 0, my / (12.0 * safe_mm), 0.0)

    tmask = (jnp.abs(tm) > 0.0).astype(mm.dtype) * mmask[None]

    # type-1 tracers: batched gradient about the center of mass
    tm1 = tm[jnp.asarray(idx1)] if idx1 else tm[:0]
    tx1, ty1 = limited_gradient(tm1, jnp.broadcast_to(mmask, tm1.shape),
                                mxav[None], myav[None], bc)
    tc1 = tm1 - tx1 * mxav[None] - ty1 * myav[None]

    # centers of mass*tracer for rows with dependents
    w2 = mc[None] * tx1 + mx[None] * tc1
    w3 = mc[None] * ty1 + my[None] * tc1
    denom = mm[None] * tm1
    good = (mmask[None] > 0) & (jnp.abs(tm1) > cn.puny)
    mtxav1 = jnp.where(good, w2 / (12.0 * jnp.where(jnp.abs(denom) > cn.puny,
                                                    denom, 1.0)), 0.0)
    mtyav1 = jnp.where(good, w3 / (12.0 * jnp.where(jnp.abs(denom) > cn.puny,
                                                    denom, 1.0)), 0.0)

    # type-2 tracers: batched gradient about parent's mass*tracer center
    if idx2:
        # map parent row index in `meta` -> row in the type-1 stack
        row1_of = {k: r for r, k in enumerate(idx1)}
        par_rows = jnp.asarray([row1_of[p] for p in par2])
        tm2 = tm[jnp.asarray(idx2)]
        pmask = tmask[jnp.asarray(par2)]
        pmx = mtxav1[par_rows]
        pmy = mtyav1[par_rows]
        tx2, ty2 = limited_gradient(tm2, pmask, pmx, pmy, bc)
        tc2 = tm2 - tx2 * pmx - ty2 * pmy
    else:
        tx2 = ty2 = tc2 = tm[:0]

    # interleave back to the full stack order
    T = len(meta)
    out_shape = (T,) + mm.shape
    tc = jnp.zeros(out_shape, mm.dtype)
    tx = jnp.zeros(out_shape, mm.dtype)
    ty = jnp.zeros(out_shape, mm.dtype)
    if idx1:
        a = jnp.asarray(idx1)
        tc = tc.at[a].set(tc1)
        tx = tx.at[a].set(tx1)
        ty = ty.at[a].set(ty1)
    if idx2:
        a = jnp.asarray(idx2)
        tc = tc.at[a].set(tc2)
        tx = tx.at[a].set(tx2)
        ty = ty.at[a].set(ty2)
    return mc, mx, my, tc, tx, ty


def _edge_integrals(edge, geom, mc, mx, my, tc, tx, ty, meta, bc, order):
    """Batched mass and mass*tracer fluxes across one edge direction
    (``transport_integrals:3307-3632``).  Tracer arrays (T, ny, nx).

    TPU restructuring: the reference (and a naive translation) gathers
    the reconstruction coefficients of the flux-donor cell *per triangle
    group* and sums mass*tracer quadrature per group — O(ngroups * T)
    tracer-deep planes of traffic.  Because every group's donor cell is
    one of 6 static positions, the triangle quadrature moments can
    instead be accumulated into per-*position* weight planes
    (6 positions x 6 moments, tracer-independent), after which the
    tracer flux is a single weighted sum over positions — O(npos * T)
    with a ~4x smaller constant.  Pure reassociation of the same sums.
    """
    idx2 = [k for k, (_, tt, _p) in enumerate(meta) if tt == 2]
    T = len(meta)

    # shifted copies only for positions some group can use
    used = sorted({p for ps in GROUP_POSITIONS for p in ps})

    def shift6(f):
        return {p: _shifted(f, edge, p, bc) for p in used}

    mc6 = shift6(mc)
    mx6 = shift6(mx)
    my6 = shift6(my)

    # per-position accumulated quadrature moments (x area): order is
    # (m, mx, my, mxx, mxy, myy)
    W = {p: [0.0] * 6 for p in used}
    mflx = 0.0

    for g in range(NGROUPS):
        lx, ly = geom["verts"][g]
        pos = geom["pos"][g]
        area = geom["triarea"][g]
        cands = GROUP_POSITIONS[g]

        def gather(f6):
            out = f6[cands[-1]]
            for p in cands[:-1]:
                out = jnp.where(pos == p, f6[p], out)
            return out

        mcg = gather(mc6)
        mxg = gather(mx6)
        myg = gather(my6)

        pts = _quad_points(lx, ly, order)
        moms = [0.0] * 6
        for (px, py, w) in pts:
            mq = w * (mcg + px * mxg + py * myg)
            moms[0] = moms[0] + mq
            moms[1] = moms[1] + mq * px
            moms[2] = moms[2] + mq * py
            moms[3] = moms[3] + mq * px * px
            moms[4] = moms[4] + mq * px * py
            moms[5] = moms[5] + mq * py * py
        mflx = mflx + area * moms[0]

        if T:
            for p in cands:
                sel = pos == p
                acc = W[p]
                for k in range(6):
                    acc[k] = acc[k] + jnp.where(sel, area * moms[k], 0.0)

    if not T:
        shape = (0,) + (mflx.shape if hasattr(mflx, "shape") else ())
        return mflx, jnp.zeros(shape, mc.dtype)

    if idx2:
        a2 = jnp.asarray(idx2)
        ap = jnp.asarray([meta[k][2] for k in idx2])

    mtflx = 0.0
    for p in used:
        tcp = _shifted(tc, edge, p, bc)
        txp = _shifted(tx, edge, p, bc)
        typ = _shifted(ty, edge, p, bc)
        wm, wx, wy, wxx, wxy, wyy = W[p]
        # type-1 rows: Σ_tri area * (m·tc + mx·tx + my·ty)
        mts = wm[None] * tcp + wx[None] * txp + wy[None] * typ
        if idx2:
            # type-2 rows: Σ_tri area * (mt_par·tc2 + mtx_par·tx2
            # + mty_par·ty2) with the parent moments at the same position
            pc, px_, py_ = tcp[ap], txp[ap], typ[ap]
            g0 = wm[None] * pc + wx[None] * px_ + wy[None] * py_
            g1 = wx[None] * pc + wxx[None] * px_ + wxy[None] * py_
            g2 = wy[None] * pc + wxy[None] * px_ + wyy[None] * py_
            mts = mts.at[a2].set(
                g0 * tcp[a2] + g1 * txp[a2] + g2 * typ[a2])
        mtflx = mtflx + mts

    return mflx, mtflx


def _departure_midpoint(uvel, vvel, dx, dy, dt, grid: Grid, bc):
    """Second-order departure points via corrected midpoint velocity
    (``departure_points:1673-1751``, l_dp_midpt = T).

    dx/dy are the scaled first-order displacements (-dt u / dxu); the
    returned displacements are scaled the same way.  The reference's
    quadrant branch (which of the four cells around the corner holds
    the trajectory midpoint) becomes a 4-way masked select; the
    bilinear velocity estimate uses the 8 neighboring U corners.
    """
    from cice4_tpu.constants import FieldLoc, FieldType
    kw = dict(loc=FieldLoc.NE_CORNER, ftype=FieldType.VECTOR)

    def nbrs(f):
        e = h.nbr_e(f, bc, **kw)
        w = h.nbr_w(f, bc, **kw)
        n = h.nbr_n(f, bc, **kw)
        s = h.nbr_s(f, bc, **kw)
        return dict(c=f, e=e, w=w, n=n, s=s,
                    ne=h.nbr_n(e, bc, **kw), nw=h.nbr_n(w, bc, **kw),
                    se=h.nbr_s(e, bc, **kw), sw=h.nbr_s(w, bc, **kw))

    u, v = nbrs(uvel), nbrs(vvel)
    mpx, mpy = 0.5 * dx, 0.5 * dy
    px, py = mpx >= 0.0, mpy >= 0.0

    def bilin(f, c00, c10, c11, c01, mpxt, mpyt):
        # f(i2-1,j2-1)*(x-.5)(y-.5) - f(i2,j2-1)*(x+.5)(y-.5)
        # + f(i2,j2)*(x+.5)(y+.5) - f(i2-1,j2)*(x-.5)(y+.5)
        return (f[c00] * (mpxt - 0.5) * (mpyt - 0.5)
                - f[c10] * (mpxt + 0.5) * (mpyt - 0.5)
                + f[c11] * (mpxt + 0.5) * (mpyt + 0.5)
                - f[c01] * (mpxt - 0.5) * (mpyt + 0.5))

    # quadrant corner names: (i2-1,j2-1), (i2,j2-1), (i2,j2), (i2-1,j2)
    quads = [
        (px & py, ("c", "e", "ne", "n"), mpx - 0.5, mpy - 0.5),    # NE cell
        (~px & ~py, ("sw", "s", "c", "w"), mpx + 0.5, mpy + 0.5),  # SW cell
        (px & ~py, ("s", "se", "e", "c"), mpx - 0.5, mpy + 0.5),   # SE cell
        (~px & py, ("w", "c", "n", "nw"), mpx + 0.5, mpy - 0.5),   # NW cell
    ]
    ump = jnp.zeros_like(uvel)
    vmp = jnp.zeros_like(vvel)
    for sel, (c00, c10, c11, c01), mpxt, mpyt in quads:
        ump = jnp.where(sel, bilin(u, c00, c10, c11, c01, mpxt, mpyt), ump)
        vmp = jnp.where(sel, bilin(v, c00, c10, c11, c01, mpxt, mpyt), vmp)

    moving = (uvel != 0.0) | (vvel != 0.0)
    dx_new = jnp.where(moving, -dt * ump / grid.dxu, dx)
    dy_new = jnp.where(moving, -dt * vmp / grid.dyu, dy)
    return dx_new, dy_new


def _remap_category(mm, tm, hm_real, tmask_land, tarear, geom_e, geom_n,
                    meta, bc, order):
    """Advect one category: reconstruction, integrals, update.

    mm: (ny, nx) area; tm: (T, ny, nx) tracers.
    Returns (mm_new, tm_new).
    """
    mc, mx, my, tc, tx, ty = _construct(mm, hm_real, tm, meta, bc)
    mfe, mtfe = _edge_integrals("east", geom_e, mc, mx, my, tc, tx, ty,
                                meta, bc, order)
    mfn, mtfn = _edge_integrals("north", geom_n, mc, mx, my, tc, tx, ty,
                                meta, bc, order)

    # update_fields (":3642-3868")
    par = jnp.asarray([max(p, 0) for (_n, _t, p) in meta])
    is2 = jnp.asarray([1.0 if t == 2 else 0.0
                       for (_n, t, _p) in meta])[:, None, None]
    mtold = mm[None] * tm * jnp.where(is2 > 0, tm[par], 1.0)

    div = (mfe - h.nbr_w(mfe, bc) + mfn - h.nbr_s(mfn, bc)) * tarear
    mm_new = jnp.maximum(mm - div, 0.0)
    mm_new = jnp.where(tmask_land, mm_new, 0.0)
    pos_m = mm_new > 0.0
    safe = jnp.maximum(mm_new, cn.puny)

    divt = (mtfe - h.nbr_w(mtfe, bc) + mtfn - h.nbr_s(mtfn, bc)) \
        * tarear[None]
    mt = mtold - divt
    t1 = jnp.where(pos_m[None], mt / safe[None], 0.0)
    # type-2: divide by (mm * parent); parents (hi, hs) are nonnegative
    pv = t1[par]
    t2 = jnp.where(pos_m[None] & (pv > 0.0),
                   mt / jnp.maximum(mm_new[None] * pv, cn.puny), 0.0)
    tm_new = jnp.where(is2 > 0, t2, t1)
    return mm_new, tm_new


def transport_remap(state: State, grid: Grid, dt,
                    integral_order: int = 2, dp_midpt: bool = False):
    """Full incremental-remapping advection of the ice state.

    Returns (state, aice0) — the advected open-water fraction feeds the
    ridging opening/closing rates.
    """
    bc = grid.bc
    ncat = state.ncat
    nilyr = state.eicen.shape[1]
    nslyr = state.esnon.shape[1]
    tracer_names = list(state.trcrn.keys())
    meta = _tracer_meta(tracer_names, nilyr, nslyr)

    # scaled departure displacements at U corners (departure_points)
    dx = -dt * state.uvel / grid.dxu
    dy = -dt * state.vvel / grid.dyu
    if dp_midpt:
        dx, dy = _departure_midpoint(state.uvel, state.vvel, dx, dy, dt,
                                     grid, bc)

    geom_e = _edge_geometry("east", grid, dx, dy)
    geom_n = _edge_geometry("north", grid, dx, dy)

    # --- state_to_tracers (driver ":847-1003") -----------------------------
    aice0 = jnp.maximum(1.0 - jnp.sum(state.aicen, 0), 0.0)
    has = state.aicen > cn.puny
    a_s = jnp.maximum(state.aicen, cn.puny)
    v_s = jnp.maximum(state.vicen, cn.puny)
    vs_s = jnp.maximum(state.vsnon, cn.puny)
    hi = jnp.where(has, state.vicen / a_s, 0.0)
    hs = jnp.where(has, state.vsnon / a_s, 0.0)

    rows = [hi, hs, jnp.where(has, state.tsfcn, 0.0)]
    for name in tracer_names:
        rows.append(jnp.where(has, state.trcrn[name], 0.0))
    for k in range(nilyr):
        rows.append(jnp.where(has, state.eicen[:, k] / v_s, 0.0))
    for k in range(nslyr):
        qs = state.esnon[:, k] / vs_s + cn.rhos * cn.Lfresh
        rows.append(jnp.where(has & (hs > cn.puny), qs, 0.0))
    tm = jnp.stack(rows, axis=1)          # (ncat, T, ny, nx)

    # --- advect open water (mass only); feeds ridging ----------------------
    empty = jnp.zeros((0,) + aice0.shape, aice0.dtype)
    mc0, mx0, my0, _tc, _tx, _ty = _construct(aice0, grid.hm, empty, [], bc)
    mflx0_e, _ = _edge_integrals("east", geom_e, mc0, mx0, my0,
                                 empty, empty, empty, [], bc,
                                 integral_order)
    mflx0_n, _ = _edge_integrals("north", geom_n, mc0, mx0, my0,
                                 empty, empty, empty, [], bc,
                                 integral_order)
    aice0_new = aice0 - (mflx0_e - h.nbr_w(mflx0_e, bc)
                         + mflx0_n - h.nbr_s(mflx0_n, bc)) * grid.tarear
    aice0_new = jnp.where(grid.tmask, jnp.maximum(aice0_new, 0.0), 0.0)

    # --- advect every category (vmapped) -----------------------------------
    mm_new, tm_new = jax.vmap(
        lambda mmn, tmn: _remap_category(mmn, tmn, grid.hm, grid.tmask,
                                         grid.tarear, geom_e, geom_n,
                                         meta, bc, integral_order)
    )(state.aicen, tm)

    # --- tracers_to_state (driver ":1012-1137") ----------------------------
    a = mm_new
    pos_m = a > 0.0
    hi_n = jnp.maximum(tm_new[:, 0], 0.0)
    hs_n = jnp.maximum(tm_new[:, 1], 0.0)
    tsfcn = jnp.where(pos_m, tm_new[:, 2], cn.Tocnfrz)
    base = 3
    trcrn = {}
    for i, name in enumerate(tracer_names):
        trcrn[name] = tm_new[:, base + i]
    base += len(tracer_names)
    eicen = jnp.stack(
        [jnp.minimum(tm_new[:, base + k], 0.0) * a * hi_n
         for k in range(nilyr)], axis=1)
    base += nilyr
    esnon = jnp.stack(
        [jnp.minimum(tm_new[:, base + k] - cn.rhos * cn.Lfresh, 0.0)
         * a * hs_n for k in range(nslyr)], axis=1)

    state = state.replace(aicen=a, vicen=a * hi_n, vsnon=a * hs_n,
                          tsfcn=tsfcn, eicen=eicen, esnon=esnon,
                          trcrn=trcrn)
    return state, aice0_new
