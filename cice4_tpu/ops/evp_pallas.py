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


def evp_subcycle_pallas(p, grid, strength, icetmask, iceumask, aiu,
                        uocn, vocn, waterx, watery, forcex, forcey,
                        umassdtei, fm, uvel, vvel,
                        stressp, stressm, stress12, *, interpret=False):
    """Drop-in replacement for `evp._evp_subcycle_jnp` running all ndte
    subcycles in one VMEM-resident Pallas kernel."""
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
