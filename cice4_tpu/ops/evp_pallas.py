"""Fused Pallas TPU kernel for the EVP subcycle loop.

The reference runs ``ndte`` (120) subcycles of `stress` + `stepu` with
two MPI halo exchanges per subcycle (``ice_dyn_evp.F90:347-408``) — the
`Bound` timer showed 25% of its runtime was halo wait.  The plain-jnp
path here has no comm on one chip, but each of the 120 `fori_loop`
iterations streams the whole EVP working set (~35 (ny, nx) planes)
HBM -> VMEM -> HBM.  At gx1 (384x320 f32) that is ~120 x 2 x 17 MB
= 4 GB of HBM traffic per dynamics step for ~3 GFLOP of arithmetic —
two orders of magnitude from the VPU roofline.

This kernel instead keeps the *entire* working set resident in VMEM
for all ndte iterations: one `pallas_call`, inputs loaded once,
`lax.fori_loop` over the subcycles inside the kernel, outputs written
once.  Neighbor access is `pltpu.roll` (an in-register lane/sublane
rotate) plus a precomputed edge mask for non-cyclic boundaries — the
math itself is shared with the jnp path (`evp._stress_update` /
`evp._stepu`) so both paths are numerically identical by construction.

Eligibility (see `evp._use_pallas`): single TPU device, non-tripole NS
boundary.  Sharded/tripole runs use the jnp path, whose global rolls
GSPMD converts to ICI collective-permutes.
"""

from __future__ import annotations

from functools import partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class KernelNbr:
    """In-VMEM neighbor shifts (counterpart of `evp.JnpNbr`).

    Implements the same global-view shift semantics as
    `parallel/halo.py` for cyclic / open / closed boundaries using
    `pltpu.roll` plus multiplicative edge masks (built once per kernel
    invocation).  Tripole folds are not supported here by design.
    """

    def __init__(self, ew: str, ns: str, ny: int, nx: int, dtype):
        if ns in ("tripole", "tripoleT"):
            raise ValueError("tripole folds use the jnp path")
        self.ew, self.ns = ew, ns
        self.ny, self.nx = ny, nx
        shape = (ny, nx)
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        one = jnp.ones(shape, dtype)
        # mask_X zeroes the ghost values that wrapped around when
        # shifting from direction X (halo.py `_set_*` equivalents)
        self.mask_n = one if ns == "cyclic" else jnp.where(row == ny - 1, 0, one)
        self.mask_s = one if ns == "cyclic" else jnp.where(row == 0, 0, one)
        self.mask_e = one if ew == "cyclic" else jnp.where(col == nx - 1, 0, one)
        self.mask_w = one if ew == "cyclic" else jnp.where(col == 0, 0, one)

    # loc/ftype are accepted for interface parity with JnpNbr; they only
    # matter for tripole folds, which this kernel never handles.
    def e(self, f, loc=None, ftype=None):
        r = pltpu.roll(f, self.nx - 1, axis=f.ndim - 1)
        return r if self.ew == "cyclic" else r * self.mask_e

    def w(self, f, loc=None, ftype=None):
        r = pltpu.roll(f, 1, axis=f.ndim - 1)
        return r if self.ew == "cyclic" else r * self.mask_w

    def n(self, f, loc=None, ftype=None):
        r = pltpu.roll(f, self.ny - 1, axis=f.ndim - 2)
        return r if self.ns == "cyclic" else r * self.mask_n

    def s(self, f, loc=None, ftype=None):
        r = pltpu.roll(f, 1, axis=f.ndim - 2)
        return r if self.ns == "cyclic" else r * self.mask_s

    def ne(self, f, loc=None, ftype=None):
        return self.n(self.e(f))


def _kernel(p, ew, ns,
            # geometry refs
            cyp, cxp, cym, cxm, dxt, dyt, dxhy, dyhx, tinyarea, uarear,
            # per-step constant refs
            strength, icet, iceu, aiu, uocn, vocn, waterx, watery,
            forcex, forcey, umassdtei, fm,
            # state refs (aliased to the first 5 outputs)
            uvel_in, vvel_in, sp_in, sm_in, s12_in,
            # output refs
            uvel_o, vvel_o, sp_o, sm_o, s12_o,
            strintx_o, strinty_o, strocnx_o, strocny_o,
            div_o, delta_o, ten_o, shr_o, prs_o):
    from cice4_tpu.ops.evp import _stress_update, _stepu

    ny, nx = uvel_in.shape
    dtype = uvel_in.dtype
    geom = SimpleNamespace(
        cyp=cyp[:], cxp=cxp[:], cym=cym[:], cxm=cxm[:],
        dxt=dxt[:], dyt=dyt[:], dxhy=dxhy[:], dyhx=dyhx[:],
        tinyarea=tinyarea[:], uarear=uarear[:])
    nbr = KernelNbr(ew, ns, ny, nx, dtype)

    P = strength[:]
    tmask_ice = icet[:] != 0.0
    iceumask = iceu[:] != 0.0
    aiu_v, uocn_v, vocn_v = aiu[:], uocn[:], vocn[:]
    waterx_v, watery_v = waterx[:], watery[:]
    forcex_v, forcey_v = forcex[:], forcey[:]
    umassdtei_v, fm_v = umassdtei[:], fm[:]

    def one_subcycle(uvel, vvel, sp, sm, s12):
        sp, sm, s12, str8, d = _stress_update(
            p, geom, nbr, P, tmask_ice, uvel, vvel, sp, sm, s12)
        res = _stepu(
            p, geom, nbr, iceumask, aiu_v, str8, uocn_v, vocn_v,
            waterx_v, watery_v, forcex_v, forcey_v,
            umassdtei_v, fm_v, uvel, vvel)
        return res, (sp, sm, s12), d

    def body(_, carry):
        uvel, vvel, sp, sm, s12 = carry
        (uvel, vvel, *_r), (sp, sm, s12), _d = one_subcycle(
            uvel, vvel, sp, sm, s12)
        return uvel, vvel, sp, sm, s12

    carry0 = (uvel_in[:], vvel_in[:], sp_in[:], sm_in[:], s12_in[:])
    carry = jax.lax.fori_loop(0, p.ndte - 1, body, carry0)
    uvel, vvel, sp, sm, s12 = carry

    # final subcycle keeps the strain diagnostics (":1103-1115")
    res, (sp, sm, s12), d = one_subcycle(uvel, vvel, sp, sm, s12)
    uvel, vvel, strintx, strinty, strocnx, strocny = res

    uvel_o[:], vvel_o[:] = uvel, vvel
    sp_o[:], sm_o[:], s12_o[:] = sp, sm, s12
    strintx_o[:], strinty_o[:] = strintx, strinty
    strocnx_o[:], strocny_o[:] = strocnx, strocny
    div_o[:] = jnp.sum(d["div"], 0)
    delta_o[:] = jnp.sum(d["delta"], 0)
    ten_o[:] = jnp.sum(d["ten"], 0)
    shr_o[:] = jnp.sum(d["shr"], 0)
    prs_o[:] = d["prs_sig"]


# ---------------------------------------------------------------------------
# Activity-gated blocked kernel (TPU-native `icellu` analogue)
# ---------------------------------------------------------------------------
#
# The reference compacts the EVP loops to gather lists of ice points
# (`icellt/icellu`, ``ice_dyn_evp.F90:263-344``) — at any instant ice
# covers ~15-25% of the global ocean.  Dynamic gathers don't map to the
# TPU; the native equivalent is *row-block gating*: the padded (ny, nx)
# arrays are cut into NB row blocks of height BH, a per-block activity
# flag (any icetmask/iceumask in the block) is computed in XLA, and the
# kernel skips the stress+momentum update of inactive blocks with
# `pl.when`.  Skipping is EXACT: stresses and velocities are masked to
# zero outside icetmask/iceumask every subcycle, so an ice-free block's
# state is identically zero at every iteration regardless of its
# neighbors (str8 has a stress factor in every term, so even ghost
# geometry rows contribute exact zeros).
#
# Layout: G=8 zero ghost rows on both NS edges (zero ghosts ARE the
# closed/open boundary masks of `KernelNbr`), blocks processed north ->
# south so that `stepu`'s north str8 halo can be *recomputed pointwise*
# (`_str8_from_stress`) from already-updated stress rows of the block
# above — no str8 plane is ever carried.  Per block and subcycle:
#   slab A rows [r0-G, r1): strain rates (south halo) + stress relax,
#     interior rows written back in place;
#   slab B rows [r0, r1+G): str8 from the fresh stresses + momentum
#     solve, interior velocity rows written back.
# All slab reads/writes are sublane-aligned (BH and G are multiples
# of 8).

G = 8  # NS ghost rows; also the slab halo height (sublane-aligned)


class SlabNbr:
    """Neighbor shifts on a (rows, nx) slab: EW are lane rolls (+ edge
    masks for non-cyclic EW), NS are sublane rolls whose wrapped rows
    land only in halo/discarded rows — the zero ghost rows at the
    domain edges supply the closed/open BC values."""

    def __init__(self, ew: str, nx: int, dtype):
        self.ew, self.nx = ew, nx
        col = jax.lax.broadcasted_iota(jnp.int32, (1, nx), 1)
        one = jnp.ones((1, nx), dtype)
        self.mask_e = one if ew == "cyclic" else jnp.where(col == nx - 1, 0, one)
        self.mask_w = one if ew == "cyclic" else jnp.where(col == 0, 0, one)

    def e(self, f, loc=None, ftype=None):
        r = pltpu.roll(f, self.nx - 1, axis=f.ndim - 1)
        return r if self.ew == "cyclic" else r * self.mask_e

    def w(self, f, loc=None, ftype=None):
        r = pltpu.roll(f, 1, axis=f.ndim - 1)
        return r if self.ew == "cyclic" else r * self.mask_w

    def n(self, f, loc=None, ftype=None):
        return pltpu.roll(f, f.shape[f.ndim - 2] - 1, axis=f.ndim - 2)

    def s(self, f, loc=None, ftype=None):
        return pltpu.roll(f, 1, axis=f.ndim - 2)

    def ne(self, f, loc=None, ftype=None):
        return self.n(self.e(f))


def _kernel_blocked(p, ew, ns, nb, bh, ny,
                    active,
                    cyp, cxp, cym, cxm, dxt, dyt, dxhy, dyhx,
                    tinyarea, uarear,
                    strength, icet, iceu, aiu, uocn, vocn,
                    waterx, watery, forcex, forcey, umassdtei, fm,
                    uvel_in, vvel_in, sp_in, sm_in, s12_in,
                    uvel_o, vvel_o, sp_o, sm_o, s12_o,
                    strintx_o, strinty_o, strocnx_o, strocny_o,
                    div_o, delta_o, ten_o, shr_o, prs_o):
    from cice4_tpu.ops.evp import (_stepu, _str8_from_stress,
                                   _stress_relax, _stress_update)

    nyp, nx = uvel_in.shape
    nyi = nb * bh   # padded interior height (>= ny when ny % bh != 0;
    # the ragged ghost rows are zero and ice-free, so running the final
    # full-grid subcycle over them is exact under the closed-edge masks)
    dtype = uvel_in.dtype
    nbr = SlabNbr(ew, nx, dtype)

    def rows(ref, start, size):
        if ref.shape == (nyp, nx):
            return ref[pl.ds(start, size), :]
        return ref[:, pl.ds(start, size), :]

    def put_rows(ref, start, val):
        size = val.shape[-2]
        if ref.shape == (nyp, nx):
            ref[pl.ds(start, size), :] = val
        else:
            ref[:, pl.ds(start, size), :] = val

    # the in-kernel state lives in the OUTPUT refs (read-modify-write
    # per block).  input_output_aliases only aliases the HBM buffers;
    # the output VMEM blocks are fresh allocations, so they must be
    # seeded from the inputs explicitly (interpret mode hides this).
    uvel_o[...] = uvel_in[...]
    vvel_o[...] = vvel_in[...]
    sp_o[...] = sp_in[...]
    sm_o[...] = sm_in[...]
    s12_o[...] = s12_in[...]

    def block_body(i, _):
        b = nb - 1 - i
        r0 = G + b * bh        # padded row of the block interior start

        @pl.when(active[b] != 0)
        def _():
            # --- slab A: strain + stress relaxation (south halo) ----
            a0, asz = r0 - G, bh + G
            geomA = SimpleNamespace(
                cyp=rows(cyp, a0, asz), cxp=rows(cxp, a0, asz),
                cym=rows(cym, a0, asz), cxm=rows(cxm, a0, asz),
                dxt=rows(dxt, a0, asz), dyt=rows(dyt, a0, asz),
                tinyarea=rows(tinyarea, a0, asz))
            spA, smA, s12A, _diag = _stress_relax(
                p, geomA, nbr, rows(strength, a0, asz),
                rows(icet, a0, asz) != 0.0,
                rows(uvel_o, a0, asz), rows(vvel_o, a0, asz),
                rows(sp_o, a0, asz), rows(sm_o, a0, asz),
                rows(s12_o, a0, asz))
            put_rows(sp_o, r0, spA[:, G:, :])
            put_rows(sm_o, r0, smA[:, G:, :])
            put_rows(s12_o, r0, s12A[:, G:, :])

            # --- slab B: str8 (fresh stresses) + momentum (north halo)
            b0, bsz = r0, bh + G
            geomB = SimpleNamespace(
                dxt=rows(dxt, b0, bsz), dyt=rows(dyt, b0, bsz),
                dxhy=rows(dxhy, b0, bsz), dyhx=rows(dyhx, b0, bsz),
                uarear=rows(uarear, b0, bsz))
            str8 = _str8_from_stress(
                geomB, rows(icet, b0, bsz) != 0.0,
                rows(sp_o, b0, bsz), rows(sm_o, b0, bsz),
                rows(s12_o, b0, bsz))
            unew, vnew, *_r = _stepu(
                p, geomB, nbr, rows(iceu, b0, bsz) != 0.0,
                rows(aiu, b0, bsz), str8,
                rows(uocn, b0, bsz), rows(vocn, b0, bsz),
                rows(waterx, b0, bsz), rows(watery, b0, bsz),
                rows(forcex, b0, bsz), rows(forcey, b0, bsz),
                rows(umassdtei, b0, bsz), rows(fm, b0, bsz),
                rows(uvel_o, b0, bsz), rows(vvel_o, b0, bsz))
            put_rows(uvel_o, r0, unew[:bh, :])
            put_rows(vvel_o, r0, vnew[:bh, :])
        return 0

    def subcycle(_, carry):
        jax.lax.fori_loop(0, nb, block_body, 0)
        return carry

    jax.lax.fori_loop(0, p.ndte - 1, subcycle, 0)

    # final subcycle full-grid with strain diagnostics (":1103-1115")
    geom = SimpleNamespace(
        cyp=rows(cyp, G, nyi), cxp=rows(cxp, G, nyi),
        cym=rows(cym, G, nyi), cxm=rows(cxm, G, nyi),
        dxt=rows(dxt, G, nyi), dyt=rows(dyt, G, nyi),
        dxhy=rows(dxhy, G, nyi), dyhx=rows(dyhx, G, nyi),
        tinyarea=rows(tinyarea, G, nyi), uarear=rows(uarear, G, nyi))
    fnbr = KernelNbr(ew, ns, nyi, nx, dtype)
    tmask_ice = rows(icet, G, nyi) != 0.0
    sp, sm, s12, str8, d = _stress_update(
        p, geom, fnbr, rows(strength, G, nyi), tmask_ice,
        rows(uvel_o, G, nyi), rows(vvel_o, G, nyi),
        rows(sp_o, G, nyi), rows(sm_o, G, nyi), rows(s12_o, G, nyi))
    uvel, vvel, strintx, strinty, strocnx, strocny = _stepu(
        p, geom, fnbr, rows(iceu, G, nyi) != 0.0, rows(aiu, G, nyi),
        str8, rows(uocn, G, nyi), rows(vocn, G, nyi),
        rows(waterx, G, nyi), rows(watery, G, nyi),
        rows(forcex, G, nyi), rows(forcey, G, nyi),
        rows(umassdtei, G, nyi), rows(fm, G, nyi),
        rows(uvel_o, G, nyi), rows(vvel_o, G, nyi))
    put_rows(uvel_o, G, uvel)
    put_rows(vvel_o, G, vvel)
    put_rows(sp_o, G, sp)
    put_rows(sm_o, G, sm)
    put_rows(s12_o, G, s12)
    strintx_o[:], strinty_o[:] = strintx[:ny], strinty[:ny]
    strocnx_o[:], strocny_o[:] = strocnx[:ny], strocny[:ny]
    div_o[:] = jnp.sum(d["div"][:, :ny], 0)
    delta_o[:] = jnp.sum(d["delta"][:, :ny], 0)
    ten_o[:] = jnp.sum(d["ten"][:, :ny], 0)
    shr_o[:] = jnp.sum(d["shr"][:, :ny], 0)
    prs_o[:] = d["prs_sig"][:ny]


def _pad_ns(f, nyp):
    """Zero-pad the NS (second-to-last) axis to nyp rows with G ghost
    rows below (zero ghosts == the closed/open BC edge masks)."""
    ny = f.shape[-2]
    pad = [(0, 0)] * f.ndim
    pad[-2] = (G, nyp - ny - G)
    return jnp.pad(f, pad)


def evp_subcycle_pallas(p, grid, strength, icetmask, iceumask, aiu,
                        uocn, vocn, waterx, watery, forcex, forcey,
                        umassdtei, fm, uvel, vvel,
                        stressp, stressm, stress12, *, interpret=False,
                        block_rows=32):
    """Drop-in replacement for `evp._evp_subcycle_jnp` running all ndte
    subcycles in one VMEM-resident Pallas kernel.

    On closed/open NS boundaries the activity-gated blocked kernel is
    used (skips ice-free row blocks every subcycle — the TPU analogue
    of the reference's icellt/icellu gather lists); NS-cyclic grids use
    the whole-grid kernel.
    """
    import os
    if (grid.bc.ns in ("closed", "open")
            and not os.environ.get("CICE4_NO_EVP_BLOCKING")):
        block_rows = int(os.environ.get("CICE4_EVP_BH", block_rows))
        return _evp_pallas_blocked(
            p, grid, strength, icetmask, iceumask, aiu, uocn, vocn,
            waterx, watery, forcex, forcey, umassdtei, fm, uvel, vvel,
            stressp, stressm, stress12, interpret=interpret,
            bh=block_rows)
    return _evp_pallas_wholegrid(
        p, grid, strength, icetmask, iceumask, aiu, uocn, vocn,
        waterx, watery, forcex, forcey, umassdtei, fm, uvel, vvel,
        stressp, stressm, stress12, interpret=interpret)


def _evp_pallas_blocked(p, grid, strength, icetmask, iceumask, aiu,
                        uocn, vocn, waterx, watery, forcex, forcey,
                        umassdtei, fm, uvel, vvel,
                        stressp, stressm, stress12, *, interpret, bh):
    ny, nx = uvel.shape
    dtype = uvel.dtype
    nb = -(-ny // bh)
    nyp = 2 * G + nb * bh

    # the exactness of block skipping needs the masked-zero invariant
    # (evp_prep2 guarantees it; enforce it so the kernel is correct for
    # any caller — XLA fuses these selects into the padding)
    uvel = jnp.where(iceumask, uvel, 0.0)
    vvel = jnp.where(iceumask, vvel, 0.0)
    stressp = jnp.where(icetmask[None], stressp, 0.0)
    stressm = jnp.where(icetmask[None], stressm, 0.0)
    stress12 = jnp.where(icetmask[None], stress12, 0.0)

    # per-block activity: any ice T-cell or ice U-point in the block
    # (stress and velocity are exactly zero elsewhere, so inactive
    # blocks stay zero under skipping — see module comment)
    act = (icetmask | iceumask)
    act = jnp.pad(act, ((0, nb * bh - ny), (0, 0)))
    active = jnp.any(act.reshape(nb, bh * nx), axis=1).astype(jnp.int32)

    plane = jax.ShapeDtypeStruct((ny, nx), dtype)
    pplane = jax.ShapeDtypeStruct((nyp, nx), dtype)
    pquad = jax.ShapeDtypeStruct((4, nyp, nx), dtype)

    geom_arrays = tuple(_pad_ns(a, nyp) for a in (
        grid.cyp, grid.cxp, grid.cym, grid.cxm,
        grid.dxt, grid.dyt, grid.dxhy, grid.dyhx,
        grid.tinyarea, grid.uarear))
    const_arrays = tuple(_pad_ns(a, nyp) for a in (
        strength, icetmask.astype(dtype), iceumask.astype(dtype),
        aiu, uocn, vocn, waterx, watery, forcex, forcey, umassdtei, fm))
    state_arrays = tuple(_pad_ns(a, nyp) for a in (
        uvel, vvel, stressp, stressm, stress12))
    n_in = 1 + len(geom_arrays) + len(const_arrays) + len(state_arrays)

    out_shape = (pplane, pplane, pquad, pquad, pquad,     # state (padded)
                 plane, plane, plane, plane,              # strint/strocn
                 plane, plane, plane, plane, plane)       # diagnostics
    first_state = 1 + len(geom_arrays) + len(const_arrays)
    aliases = {first_state + k: k for k in range(5)}

    outs = pl.pallas_call(
        partial(_kernel_blocked, p, grid.bc.ew, grid.bc.ns, nb, bh, ny),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_in - 1),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shape),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(active, *geom_arrays, *const_arrays, *state_arrays)

    (uvel, vvel, stressp, stressm, stress12,
     strintx, strinty, strocnx, strocny,
     div_sum, delta_sum, ten_sum, shr_sum, prs_sig) = outs
    sl = lambda f: f[..., G:G + ny, :]
    diag = dict(div_sum=div_sum, delta_sum=delta_sum,
                ten_sum=ten_sum, shr_sum=shr_sum, prs_sig=prs_sig)
    return (sl(uvel), sl(vvel), sl(stressp), sl(stressm), sl(stress12),
            diag, strintx, strinty, strocnx, strocny)


def _evp_pallas_wholegrid(p, grid, strength, icetmask, iceumask, aiu,
                          uocn, vocn, waterx, watery, forcex, forcey,
                          umassdtei, fm, uvel, vvel,
                          stressp, stressm, stress12, *, interpret=False):
    ny, nx = uvel.shape
    dtype = uvel.dtype
    plane = jax.ShapeDtypeStruct((ny, nx), dtype)
    quad = jax.ShapeDtypeStruct((4, ny, nx), dtype)

    geom_arrays = (grid.cyp, grid.cxp, grid.cym, grid.cxm,
                   grid.dxt, grid.dyt, grid.dxhy, grid.dyhx,
                   grid.tinyarea, grid.uarear)
    const_arrays = (strength, icetmask.astype(dtype),
                    iceumask.astype(dtype), aiu, uocn, vocn,
                    waterx, watery, forcex, forcey, umassdtei, fm)
    state_arrays = (uvel, vvel, stressp, stressm, stress12)
    n_in = len(geom_arrays) + len(const_arrays) + len(state_arrays)

    out_shape = (plane, plane, quad, quad, quad,          # state
                 plane, plane, plane, plane,              # strint/strocn
                 plane, plane, plane, plane, plane)       # diagnostics
    # alias the 5 state inputs onto the 5 state outputs (in-place)
    first_state = len(geom_arrays) + len(const_arrays)
    aliases = {first_state + k: k for k in range(5)}

    outs = pl.pallas_call(
        partial(_kernel, p, grid.bc.ew, grid.bc.ns),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shape),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*geom_arrays, *const_arrays, *state_arrays)

    (uvel, vvel, stressp, stressm, stress12,
     strintx, strinty, strocnx, strocny,
     div_sum, delta_sum, ten_sum, shr_sum, prs_sig) = outs
    diag = dict(div_sum=div_sum, delta_sum=delta_sum,
                ten_sum=ten_sum, shr_sum=shr_sum, prs_sig=prs_sig)
    return (uvel, vvel, stressp, stressm, stress12, diag,
            strintx, strinty, strocnx, strocny)
