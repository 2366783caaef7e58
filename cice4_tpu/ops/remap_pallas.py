"""Fused Pallas TPU kernel for incremental-remapping transport.

Round 2 fused the EVP subcycle into VMEM (`evp_pallas.py`); this does
the same for the other half of the dynamics step.  The XLA remap path
streams ~60 HBM-materialized moment planes plus 27 shifted copies of
the T-deep tracer-reconstruction stacks per category (measured 8.5 ms
of the 17 ms gx1 step, >2 GB of HBM traffic); here the whole pipeline —
departure-triangle geometry, monomial moment accumulation, van-Leer
reconstruction, and the flux-divergence contraction — runs inside one
`pallas_call` with every intermediate VMEM-resident.

Structure (reference ``ice_transport_remap.F90 horizontal_remap:
328-881``):

* grid = ncat+1 sequential steps (open water rides as a mass-only
  extra category, the reference's aim(0)).
* step 0 computes the category-independent geometric divergence
  accumulators GA[offset][k] (`remap._geom_accumulators`: the ±scatter
  of `transport_integrals` triangle moments hoisted to geometric
  space) into a VMEM scratch that persists across grid steps — TPU
  grid iteration is sequential, so later categories reuse it.
* each step reconstructs its fields (`remap._construct`, the SAME
  function the XLA path runs — in-kernel neighbor shifts come from an
  interface-compatible `pltpu.roll` shim) and contracts the shifted
  reconstruction stacks against GA:
  ``div(c) = Σ_off Σ_k GA_k[off](c) · U_k(c+off)`` where U_k are the
  monomial coefficients of the donor-cell product polynomial
  m·t (type-1 tracers) or m·t_parent·t (type-2), expanded on the fly.

Mathematically this is the exact same quadrature sum as the XLA path,
reassociated (distributivity only); the paths agree to roundoff.

Eligibility (`remap._use_pallas_remap`): single TPU device,
non-tripole boundaries, working set within VMEM.  Sharded / tripole /
CPU runs use the jnp path, whose global rolls GSPMD turns into ICI
collective-permutes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cice4_tpu.ops.evp_pallas import KernelNbr


class PallasShift(KernelNbr):
    """In-VMEM twin of `remap.JnpShift` (same e/w/n/s interface)."""


def _shift_by(sh, f, off):
    """Composite masked shift by offset (di, dj) — x first, then y,
    matching `_shift9`'s incremental composition order."""
    di, dj = off
    if di == 1:
        f = sh.e(f)
    elif di == -1:
        f = sh.w(f)
    if dj == 1:
        f = sh.n(f)
    elif dj == -1:
        f = sh.s(f)
    return f


def _ga_kernel(order, ew, ns, emit_shifted, dx_ref, dy_ref, afac_ref,
               ga_o):
    """K0: departure-triangle geometry + monomial moments + ±scatter,
    entirely in VMEM.

    Same sums as `remap._geom_accumulators`, but each triangle group's
    moment planes are scattered into the OUTPUT ref as soon as they are
    computed (per group, per position) instead of accumulating a
    90-plane python-side table — keeps the live set to the edge
    geometry + one group's monomials.

    emit_shifted=True additionally back-shifts each offset's planes by
    -offset before returning (the `GSH` tables `_flux_divergence_ga`
    consumes), saving the XLA-side shift pass.
    """
    from cice4_tpu.ops.remap import (ALL_OFFSETS, GROUP_POSITIONS,
                                     NGROUPS, SHIFTS, _edge_geometry,
                                     _quad_points)

    ny, nx = dx_ref.shape
    dtype = dx_ref.dtype
    sh = PallasShift(ew, ns, ny, nx, dtype)
    off_idx = {off: o for o, off in enumerate(ALL_OFFSETS)}
    dx, dy, afac = dx_ref[:], dy_ref[:], afac_ref[:]

    for o in range(9):
        for k in range(10):
            ga_o[o, k] = jnp.zeros((ny, nx), dtype)

    for edge in ("east", "north"):
        geom = _edge_geometry(edge, afac, dx, dy, sh)
        back = sh.w if edge == "east" else sh.s
        bo = (-1, 0) if edge == "east" else (0, -1)
        for g in range(NGROUPS):
            lx, ly = geom["verts"][g]
            pos = geom["pos"][g]
            area = geom["triarea"][g]
            pts = _quad_points(lx, ly, order)
            mono = [0.0] * 10
            for (px, py, w) in pts:
                pxx, pxy, pyy = px * px, px * py, py * py
                for k, v in enumerate((w, w * px, w * py, w * pxx,
                                       w * pxy, w * pyy, w * pxx * px,
                                       w * pxx * py, w * pxy * py,
                                       w * pyy * py)):
                    mono[k] = mono[k] + v
            for p in GROUP_POSITIONS[g]:
                ag = jnp.where(pos == p, area, 0.0)
                d = SHIFTS[edge][p]
                g2 = (d[0] + bo[0], d[1] + bo[1])
                od, og = off_idx[d], off_idx[g2]
                for k in range(10):
                    plane = ag * mono[k]
                    ga_o[od, k] += plane
                    ga_o[og, k] -= back(plane)

    if emit_shifted:
        for o, off in enumerate(ALL_OFFSETS):
            if off == (0, 0):
                continue
            boff = (-off[0], -off[1])
            for k in range(10):
                ga_o[o, k] = _shift_by(sh, ga_o[o, k], boff)


def ga_gsh_pallas(dx, dy, afac, ew, ns, order=2, *, interpret=False,
                  keep_pad=False):
    """Back-shifted GA divergence accumulators (the `GSH` planes) as a
    single VMEM-resident kernel: (9, 10, ny, nx), offset-major in
    `remap.ALL_OFFSETS` order.  TPU fast path for the GA-factored XLA
    contraction (non-tripole, free-area mode)."""
    ny, nx_real = dx.shape
    nx = pad_nx(nx_real)
    if nx != nx_real:
        dx, dy, afac = (_pad_x(a, nx, ew) for a in (dx, dy, afac))
    params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM)
    gsh = pl.pallas_call(
        partial(_ga_kernel, order, ew, ns, True),
        out_shape=jax.ShapeDtypeStruct((9, 10, ny, nx), dx.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=params,
        interpret=interpret,
    )(dx, dy, afac)
    return gsh if keep_pad else gsh[..., :nx_real]


def _k12_kernel(meta, ew, ns, chunk, gsh_ref, hm_ref, mm_ref, tm_ref,
                div_o, divt_o):
    """K12: van-Leer reconstruction + GA contraction for one category,
    entirely in VMEM (grid = (ncat,), the GSH planes are a constant
    block fetched once).

    Identical math to the XLA GA path: `_construct_vmem` for the
    reconstruction and `remap._flux_divergence_ga` for the contraction
    (shared code, Pallas shift provider).  `chunk` bounds the live
    type-2 product stacks: the tracer contraction runs in chunks of
    that many type-2 rows, re-deriving the chunk's products instead of
    holding all of them live."""
    from cice4_tpu.ops.remap import (ALL_OFFSETS, _flux_divergence_ga,
                                     _n_type1)

    ny, nx = hm_ref.shape
    dtype = hm_ref.dtype
    sh = PallasShift(ew, ns, ny, nx, dtype)
    meta = list(meta)
    T = len(meta)
    n1 = _n_type1(meta)

    GSH = {off: [gsh_ref[o, k] for k in range(10)]
           for o, off in enumerate(ALL_OFFSETS)}
    mm = mm_ref[0]
    tm = tm_ref[0] if T else jnp.zeros((0, ny, nx), dtype)
    mc, mx, my, tc, tx, ty = _construct_vmem(mm, hm_ref[:], tm, meta,
                                             sh)

    if T == 0 or chunk >= T - n1:
        div, divt = _flux_divergence_ga(GSH, mc, mx, my, tc, tx, ty,
                                        meta, sh)
    else:
        # mass + type-1 in one pass, then type-2 rows chunkwise
        meta1 = meta[:n1]
        div, divt1 = _flux_divergence_ga(
            GSH, mc, mx, my, tc[:n1], tx[:n1], ty[:n1], meta1, sh)
        parts = [divt1]
        for lo in range(n1, T, chunk):
            hi = min(lo + chunk, T)
            msub = meta[:n1] + meta[lo:hi]
            csub = jnp.concatenate([tc[:n1], tc[lo:hi]], 0)
            xsub = jnp.concatenate([tx[:n1], tx[lo:hi]], 0)
            ysub = jnp.concatenate([ty[:n1], ty[lo:hi]], 0)
            _d, dsub = _flux_divergence_ga(GSH, mc, mx, my, csub,
                                           xsub, ysub, msub, sh)
            parts.append(dsub[n1:])
        divt = jnp.concatenate(parts, 0)
    div_o[0] = div
    if T:
        divt_o[0] = divt
    else:
        divt_o[0] = jnp.zeros_like(divt_o[0])


def k12_divergence(gsh, hm, mm_ext, tm_ext, meta, ew, ns, *,
                   chunk=2, interpret=False):
    """(div_ext, divt_ext) for the extended category batch via the
    fused reconstruction+contraction kernel.  `gsh` is the padded
    (9, 10, ny, nxp) tensor from `ga_gsh_pallas(..., keep_pad=True)`;
    mm_ext/tm_ext/hm are unpadded (categories-leading) arrays."""
    ncat1, T = tm_ext.shape[0], tm_ext.shape[1]
    ny, nx_real = hm.shape
    nx = pad_nx(nx_real)
    if nx != nx_real:
        hm, mm_ext, tm_ext = (_pad_x(a, nx, ew)
                              for a in (hm, mm_ext, tm_ext))
    dtype = hm.dtype
    params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM)
    gsh_spec = pl.BlockSpec((9, 10, ny, nx), lambda i: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    glob2 = pl.BlockSpec((ny, nx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    cat3 = pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    cat4 = pl.BlockSpec((1, max(T, 1), ny, nx), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    div, divt = pl.pallas_call(
        partial(_k12_kernel, tuple(meta), ew, ns, chunk),
        grid=(ncat1,),
        in_specs=[gsh_spec, glob2, cat3, cat4],
        out_specs=(cat3, cat4),
        out_shape=(jax.ShapeDtypeStruct((ncat1, ny, nx), dtype),
                   jax.ShapeDtypeStruct((ncat1, max(T, 1), ny, nx),
                                        dtype)),
        compiler_params=params,
        interpret=interpret,
    )(gsh, hm, mm_ext if T else mm_ext,
      tm_ext if T else jnp.zeros((ncat1, 1, ny, nx), dtype))
    div = div[..., :nx_real]
    divt = divt[..., :nx_real][:, :T]
    return div, divt


AXES = ((1, 0), (-1, 0), (0, 1), (0, -1))
DIAGS = ((1, 1), (-1, 1), (1, -1), (-1, -1))


def _grad_stream(sh, phi, phimask, cnx, cny, sval, smask):
    """`remap._limited_gradient_shifted` in streaming form: neighbor
    planes are produced one offset at a time (sval/smask callables)
    and folded into running min/max, so no 9-offset table is ever
    live.  Same formulas — min/max folding is order-exact, and the
    gx/gy axis neighbors are the identical masked values.
    """
    def nb(off):
        m = smask(off)
        return m * sval(off) + (1.0 - m) * phi

    phi_e = nb((1, 0))
    phi_w = nb((-1, 0))
    phi_n = nb((0, 1))
    phi_s = nb((0, -1))

    gx = 0.5 * (phi_e - phi_w)
    gy = 0.5 * (phi_n - phi_s)

    pmn = jnp.minimum(jnp.minimum(phi_e, phi_w),
                      jnp.minimum(phi_n, phi_s))
    pmx = jnp.maximum(jnp.maximum(phi_e, phi_w),
                      jnp.maximum(phi_n, phi_s))
    pmn = jnp.minimum(pmn, phi)
    pmx = jnp.maximum(pmx, phi)
    for off in DIAGS:
        v = nb(off)
        pmn = jnp.minimum(pmn, v)
        pmx = jnp.maximum(pmx, v)
    pmn = pmn - phi
    pmx = pmx - phi

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
    lim = jnp.minimum(1.0, jnp.minimum(wa, wb)) * phimask
    return lim * gx, lim * gy


def _construct_vmem(mm, hm_real, tm, meta, sh):
    """`remap._construct` restructured for VMEM residency: identical
    reconstruction (same masked-neighbor values, same limiter), but
    every neighbor shift is produced on demand instead of via the
    9-offset `_shift9` tables (which would hold 9 copies of the
    T-deep stacks live)."""
    import cice4_tpu.constants as cn
    from cice4_tpu.ops.remap import _n_type1

    n1 = _n_type1(meta)
    T = len(meta)
    par2 = [meta[k][2] for k in range(n1, T)]

    def shift(f, off):
        return _shift_by(sh, f, off)

    mmask = (mm > cn.puny).astype(mm.dtype)
    zero = jnp.zeros_like(mm)
    mx, my = _grad_stream(
        sh, mm, hm_real, zero, zero,
        lambda off: shift(mm, off),
        lambda off: shift(hm_real, off))
    mc = mm
    safe_mm = jnp.maximum(mm, cn.puny)
    mxav = jnp.where(mmask > 0, mx / (12.0 * safe_mm), 0.0)
    myav = jnp.where(mmask > 0, my / (12.0 * safe_mm), 0.0)

    def mmask_sh(off):
        return (shift(mm, off) > cn.puny).astype(mm.dtype)

    # type-1 tracers
    tm1 = tm[:n1]
    tx1, ty1 = _grad_stream(
        sh, tm1, mmask, mxav, myav,
        lambda off: shift(tm1, off),
        lambda off: mmask_sh(off))
    tc1 = tm1 - tx1 * mxav[None] - ty1 * myav[None]

    w2 = mc[None] * tx1 + mx[None] * tc1
    w3 = mc[None] * ty1 + my[None] * tc1
    denom = mm[None] * tm1
    good = (mmask[None] > 0) & (jnp.abs(tm1) > cn.puny)
    mtxav1 = jnp.where(good, w2 / (12.0 * jnp.where(
        jnp.abs(denom) > cn.puny, denom, 1.0)), 0.0)
    mtyav1 = jnp.where(good, w3 / (12.0 * jnp.where(
        jnp.abs(denom) > cn.puny, denom, 1.0)), 0.0)

    if par2:
        tm2 = tm[n1:]
        tmask1 = (jnp.abs(tm1) > 0.0).astype(mm.dtype) * mmask[None]
        pick = lambda s: jnp.stack([s[p] for p in par2])  # noqa: E731
        pmask = pick(tmask1)
        parstack = pick(tm1)
        pmx_, pmy_ = pick(mtxav1), pick(mtyav1)
        tx2, ty2 = _grad_stream(
            sh, tm2, pmask, pmx_, pmy_,
            lambda off: shift(tm2, off),
            lambda off: ((jnp.abs(shift(parstack, off)) > 0.0)
                         .astype(mm.dtype) * mmask_sh(off)))
        tc2 = tm2 - tx2 * pmx_ - ty2 * pmy_
        tc = jnp.concatenate([tc1, tc2], axis=0)
        tx = jnp.concatenate([tx1, tx2], axis=0)
        ty = jnp.concatenate([ty1, ty2], axis=0)
    else:
        tc, tx, ty = tc1, tx1, ty1
    return mc, mx, my, tc, tx, ty


def _construct_kernel(meta, ew, ns, hm_ref, mm_ref, tm_ref, mass_o,
                      trc_o):
    """K1: van-Leer-limited reconstruction for one category.

    Outputs: mass planes (3, ny, nx) = [mc, mx, my] and the tracer
    reconstruction in per-tracer-contiguous layout (T, 3, ny, nx) so
    K2 can stream tracer CHUNKS through VMEM (the flat 3+3T layout
    couldn't be block-sliced per tracer)."""
    ny, nx = hm_ref.shape
    dtype = hm_ref.dtype
    sh = PallasShift(ew, ns, ny, nx, dtype)
    mc, mx, my, tc, tx, ty = _construct_vmem(mm_ref[0], hm_ref[:],
                                             tm_ref[0], list(meta), sh)
    mass_o[0] = jnp.stack([mc, mx, my], axis=0)
    if len(meta):
        trc_o[0] = jnp.stack([tc, tx, ty], axis=1)  # (T, 3, ny, nx)


def _contract_kernel(meta, ew, ns, chunk, nchunks, parset, ga_ref,
                     mass_ref, trc_ref, par_ref, div_o, divt_o):
    """K2: flux-divergence contraction in scatter form:

    ``div(c) = Σ_off S_off( S_-off(GA[off]) · U )(c)``

    where U_k are the monomial coefficients of the donor-cell product
    polynomial m·p·t (p = parent tracer for type-2 rows, p ≡ 1 for
    type-1 — the type-1 polynomial is exactly the p=1 special case,
    so one formula covers all rows), computed on the fly from the
    VMEM-resident reconstruction.

    Grid = (ncat1, nchunk, 9): the offset is the minor grid dimension,
    so the output block stays VMEM-resident across all 9 visits and
    this kernel accumulates into it while Pallas's standard pipeline
    streams each offset's 10 GA planes HBM->VMEM (the round-3 manual
    ``make_async_copy`` from a ``pl.ANY`` ref crashed the TPU worker;
    the grid pipeline is the supported way to stream).  The middle
    dimension streams `chunk`-sized tracer batches, bounding the VMEM
    live set for any T and grid size (gx1's full-T working set was
    RESOURCE_EXHAUSTED).  The offset value is only known at trace
    time as ``program_id(2)``, so the 9 statically-shifted variants
    live in a ``lax.switch``; the chunk's row types/parents are
    resolved per-chunk with another switch over nchunk variants.
    """
    from cice4_tpu.ops.remap import ALL_OFFSETS

    meta = list(meta)
    T = len(meta)
    ny, nx = ga_ref.shape[-2:]
    dtype = ga_ref.dtype
    sh = PallasShift(ew, ns, ny, nx, dtype)
    t = pl.program_id(1)
    o = pl.program_id(2)

    mass = mass_ref[0]
    mc, mx, my = mass[0], mass[1], mass[2]
    trc = trc_ref[0]           # (chunk, 3, ny, nx)
    c2, x2, y2 = trc[:, 0], trc[:, 1], trc[:, 2]
    ga = ga_ref[0]             # (10, ny, nx): this offset's planes

    def parent_stack(tchunk):
        """Static per-chunk parent planes (pc, px, py), each
        (chunk, ny, nx): ones/zeros for type-1 rows, the parent row's
        reconstruction for type-2."""
        pcs, pxs, pys = [], [], []
        one = jnp.ones((ny, nx), dtype)
        zer = jnp.zeros((ny, nx), dtype)
        for r in range(tchunk * chunk, (tchunk + 1) * chunk):
            if r >= T or meta[r][1] != 2:
                pcs.append(one), pxs.append(zer), pys.append(zer)
            else:
                pos = parset.index(meta[r][2])
                pr = par_ref[0, pos]
                pcs.append(pr[0]), pxs.append(pr[1]), pys.append(pr[2])
        return (jnp.stack(pcs), jnp.stack(pxs), jnp.stack(pys))

    if T:
        pc, px, py = jax.lax.switch(
            t, [partial(parent_stack, k) for k in range(nchunks)])

    def offset_branch(off):
        def branch():
            neg = (-off[0], -off[1])
            g = [_shift_by(sh, ga[k], neg) for k in range(10)]
            g0, g1, g2, g3, g4, g5, g6, g7, g8, g9 = g

            p_mass = g0 * mc + g1 * mx + g2 * my
            dm = _shift_by(sh, p_mass, off)
            if not T:
                return dm
            mpc, mpx, mpy = mc * pc, mc * px, mc * py
            xpc, xpx, xpy = mx * pc, mx * px, mx * py
            ypc, ypx, ypy = my * pc, my * px, my * py
            p = (g0 * (mpc * c2)
                 + g1 * (xpc * c2 + mpx * c2 + mpc * x2)
                 + g2 * (ypc * c2 + mpy * c2 + mpc * y2)
                 + g3 * (xpx * c2 + xpc * x2 + mpx * x2)
                 + g4 * (xpy * c2 + ypx * c2 + xpc * y2
                         + ypc * x2 + mpx * y2 + mpy * x2)
                 + g5 * (ypy * c2 + ypc * y2 + mpy * y2)
                 + g6 * (xpx * x2)
                 + g7 * (xpx * y2 + xpy * x2 + ypx * x2)
                 + g8 * (xpy * y2 + ypx * y2 + ypy * x2)
                 + g9 * (ypy * y2))
            return dm, _shift_by(sh, p, off)
        return branch

    out = jax.lax.switch(o, [offset_branch(off) for off in ALL_OFFSETS])

    @pl.when((o == 0) & (t == 0))
    def _init_mass():
        div_o[0] = out[0] if T else out

    @pl.when((o > 0) & (t == 0))
    def _acc_mass():
        div_o[0] += out[0] if T else out

    if T:
        @pl.when(o == 0)
        def _init_trc():
            divt_o[0] = out[1]

        @pl.when(o > 0)
        def _acc_trc():
            divt_o[0] += out[1]


_VMEM = 128 * 1024 * 1024

# Mosaic requires HBM slices (K2's per-offset GA stream) to be
# lane-aligned: the last dim must be a multiple of 128.  Real grids
# (gx3 nx=100, gx1 nx=320) are not, so the kernels run on an
# x-padded copy.  _HALO columns of wrapped data on each side of the
# pad keep cyclic-EW shifts exact: every kernel output at a real
# column depends on inputs within ±4 columns (rec ±1, GA ±2, one
# more shift in the contraction), so a 4-wide wrap halo reproduces
# the unpadded cyclic values and the junk in the middle of the pad
# can never reach a real column.
_LANE = 128
_HALO = 4


def pad_nx(nx: int) -> int:
    """Lane-aligned padded x size for the kernel working set."""
    return -(-nx // _LANE) * _LANE


def _pad_x(a, nxp, ew):
    """Zero-pad trailing x to nxp; wrap-fill a _HALO-wide ring for
    cyclic EW so in-kernel rolls at the pad seams stay exact."""
    nx = a.shape[-1]
    pad = nxp - nx
    if pad == 0:
        return a
    if ew != "cyclic":
        widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        return jnp.pad(a, widths)
    if pad < 2 * _HALO:
        raise ValueError(
            f"cyclic x-pad {pad} too narrow for wrap halo {_HALO}")
    # concatenation instead of pad + two .at[].set ring fills: the
    # scatters materialized as two full-array dynamic-update-slices
    # (2 x ~120 us on the (6,9,ny,nxp) gx1 input stack); the concat
    # lowers to one fusion
    return jnp.concatenate(
        [a, a[..., :_HALO],
         jnp.zeros(a.shape[:-1] + (pad - 2 * _HALO,), a.dtype),
         a[..., nx - _HALO:]], axis=-1)


def remap_pallas_divergence(dx, dy, afac, mm_ext, tm_ext, hm, meta,
                            ew, ns, order=2, *, interpret=False):
    """(div_ext, divt_ext) for the extended category batch (row 0 =
    open water, mass only) via the fused kernel pipeline K0→K1→K2."""
    if jax.default_backend() != "tpu":
        interpret = True  # CPU tests run the kernels in interpret mode
    ncat1, T = tm_ext.shape[0], tm_ext.shape[1]
    ny, nx_real = hm.shape
    nx = pad_nx(nx_real)
    if nx != nx_real:
        dx, dy, afac, hm, mm_ext, tm_ext = (
            _pad_x(a, nx, ew) for a in
            (dx, dy, afac, hm, mm_ext, tm_ext))
    dtype = hm.dtype
    meta = tuple(meta)

    glob2 = pl.BlockSpec((ny, nx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    cat3 = pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    cat4 = pl.BlockSpec((1, T, ny, nx), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    ga_spec = pl.BlockSpec((9, 10, ny, nx), lambda i: (0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM)

    # K0: geometry -> GA moment planes
    ga = pl.pallas_call(
        partial(_ga_kernel, order, ew, ns, False),
        out_shape=jax.ShapeDtypeStruct((9, 10, ny, nx), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=params,
        interpret=interpret,
    )(dx, dy, afac)

    # K1: reconstruction per category -> mass (3) + per-tracer (T,3)
    mass3 = pl.BlockSpec((1, 3, ny, nx), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    trc5 = pl.BlockSpec((1, T, 3, ny, nx), lambda i: (i, 0, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    mass, trc = pl.pallas_call(
        partial(_construct_kernel, meta, ew, ns),
        grid=(ncat1,),
        in_specs=[glob2, cat3, cat4],
        out_specs=(mass3, trc5),
        out_shape=(jax.ShapeDtypeStruct((ncat1, 3, ny, nx), dtype),
                   jax.ShapeDtypeStruct((ncat1, T, 3, ny, nx), dtype)),
        compiler_params=params,
        interpret=interpret,
    )(hm, mm_ext, tm_ext)

    # parent reconstructions (type-2 rows reference type-1 rows by
    # index); a handful of rows (hi, hs), gathered once in XLA
    parset = tuple(sorted({m[2] for m in meta if m[1] == 2}))
    P = max(len(parset), 1)
    par = trc[:, jnp.asarray(parset, jnp.int32)] if parset \
        else jnp.zeros((ncat1, 1, 3, ny, nx), dtype)

    # tracer chunk size: bound K2's VMEM live set (GA stream double-
    # buffered + resident mass/parents + chunk-sized tracer block,
    # accumulators and product temporaries ~26 planes per chunk row).
    # CICE4_REMAP_CHUNK overrides for empirical tuning.
    import os as _os
    plane = ny * nx * jnp.dtype(dtype).itemsize
    chunk = T
    env_chunk = _os.environ.get("CICE4_REMAP_CHUNK")
    if env_chunk:
        chunk = max(1, min(T, int(env_chunk)))
    else:
        # measured on v5e gx1: chunk 5 (2 GA streams) edges chunk 3
        # (39.8 vs 40.9 ms); chunk 9 (single stream) RESOURCE_EXHAUSTs
        while chunk > 1 and (60 + 26 * chunk) * plane > 115 * 1024 * 1024:
            chunk -= 1
    nchunks = -(-T // chunk)
    Tp = nchunks * chunk
    if Tp != T:
        trc = jnp.concatenate(
            [trc, jnp.zeros((ncat1, Tp - T, 3, ny, nx), dtype)], axis=1)

    # K2: scatter-form divergence contraction; grid (category, tracer
    # chunk, offset) with the offset minor so the output block stays
    # resident for accumulation while the pipeline streams GA planes
    ga_o = pl.BlockSpec((1, 10, ny, nx), lambda i, t, o: (o, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    mass_o = pl.BlockSpec((1, 3, ny, nx), lambda i, t, o: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    trc_o = pl.BlockSpec((1, chunk, 3, ny, nx),
                         lambda i, t, o: (i, t, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    par_o = pl.BlockSpec((1, P, 3, ny, nx),
                         lambda i, t, o: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    div_s = pl.BlockSpec((1, ny, nx), lambda i, t, o: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    divt_s = pl.BlockSpec((1, chunk, ny, nx),
                          lambda i, t, o: (i, t, 0, 0),
                          memory_space=pltpu.VMEM)
    div, divt = pl.pallas_call(
        partial(_contract_kernel, meta, ew, ns, chunk, nchunks, parset),
        grid=(ncat1, nchunks, 9),
        in_specs=[ga_o, mass_o, trc_o, par_o],
        out_specs=(div_s, divt_s),
        out_shape=(jax.ShapeDtypeStruct((ncat1, ny, nx), dtype),
                   jax.ShapeDtypeStruct((ncat1, Tp, ny, nx), dtype)),
        compiler_params=params,
        interpret=interpret,
    )(ga, mass, trc, par)
    divt = divt[:, :T]
    if nx != nx_real:
        div, divt = div[..., :nx_real], divt[..., :nx_real]
    return div, divt
