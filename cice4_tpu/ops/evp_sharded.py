"""Sharded EVP fast path: k-wide halos, one exchange per k subcycles.

The reference exchanges uvel/vvel halos after EVERY one of the ndte
(=120) subcycles (``ice_dyn_evp.F90:397-402``) — the `Bound` timer
showed ~25% of total runtime spent waiting on those exchanges even on
Infiniband (``ice.log.Linux.LANL.coyote:795``; SURVEY §7 hard-part 1).
Under GSPMD the jnp fallback reproduces exactly that pattern: every
`jnp.roll` in the subcycle body becomes a collective-permute, so a
120-subcycle loop issues ~240 tiny permutes per dynamics step.

This module instead runs the subcycle loop inside ``shard_map`` with a
k-wide ghost ring (nghost=1 in the reference, but the math permits
trading halo width for comm rounds): each exchange refreshes H ghost
cells, each subcycle's 3x3 stencil consumes one ring, so H-1 subcycles
run back-to-back with zero communication and the number of exchange
rounds drops from ndte to ceil(ndte/(H-1)) (120 -> 12 at the default
H=11).  The exchanged volume is similar (wider strips, fewer
messages); the LATENCY — the quantity that killed the reference — is
cut ~10x.  Physics per subcycle is bit-identical: the body calls the
SAME `_stress_update` / `_stepu` as the jnp path, just on locally
padded blocks with plain rolls instead of boundary-aware shifts.

Supported boundaries: cyclic/open/closed EW+NS (tripole folds use the
GSPMD fallback).  Requires block sizes divisible by the mesh.
"""

from __future__ import annotations

from functools import partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:                      # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

DEFAULT_H = 11          # ghost width -> H-1 subcycles per exchange


class PadNbr:
    """Neighbor shifts on a locally padded block: plain rolls, no
    boundary masks — ghosts supply correct neighbor values and the
    roll's wrap garbage only ever lands in the outermost ghost ring,
    which the shrinking-halo schedule never consumes."""

    def e(self, f, loc=None, ftype=None):
        return jnp.roll(f, -1, axis=-1)

    def w(self, f, loc=None, ftype=None):
        return jnp.roll(f, 1, axis=-1)

    def n(self, f, loc=None, ftype=None):
        return jnp.roll(f, -1, axis=-2)

    def s(self, f, loc=None, ftype=None):
        return jnp.roll(f, 1, axis=-2)

    def ne(self, f, loc=None, ftype=None):
        return self.n(self.e(f))


def _exchange(a, H, px, py, ew_cyclic, ns_cyclic, xi, yi):
    """Refresh all four H-wide ghost bands of the padded block `a`
    (trailing dims (byp, bxp)) from the neighboring shards.

    Standard two-phase exchange: x-strips first, then full-width
    y-strips (corners ride the second phase).  Non-cyclic global edges
    zero their ghosts (the halo module's open/closed semantics)."""
    if px > 1:
        east_strip = a[..., H:-H, -2 * H:-H]
        west_strip = a[..., H:-H, H:2 * H]
        fwd = [(i, (i + 1) % px) for i in range(px)]
        bwd = [(i, (i - 1) % px) for i in range(px)]
        from_w = jax.lax.ppermute(east_strip, "x", fwd)
        from_e = jax.lax.ppermute(west_strip, "x", bwd)
        a = a.at[..., H:-H, :H].set(from_w)
        a = a.at[..., H:-H, -H:].set(from_e)
    elif ew_cyclic:
        a = a.at[..., H:-H, :H].set(a[..., H:-H, -2 * H:-H])
        a = a.at[..., H:-H, -H:].set(a[..., H:-H, H:2 * H])
    if not ew_cyclic:
        a = a.at[..., :, :H].set(
            jnp.where(xi == 0, 0.0, a[..., :, :H]))
        a = a.at[..., :, -H:].set(
            jnp.where(xi == px - 1, 0.0, a[..., :, -H:]))
    if py > 1:
        north_strip = a[..., -2 * H:-H, :]
        south_strip = a[..., H:2 * H, :]
        fwd = [(j, (j + 1) % py) for j in range(py)]
        bwd = [(j, (j - 1) % py) for j in range(py)]
        from_s = jax.lax.ppermute(north_strip, "y", fwd)
        from_n = jax.lax.ppermute(south_strip, "y", bwd)
        a = a.at[..., :H, :].set(from_s)
        a = a.at[..., -H:, :].set(from_n)
    elif ns_cyclic:
        a = a.at[..., :H, :].set(a[..., -2 * H:-H, :])
        a = a.at[..., -H:, :].set(a[..., H:2 * H, :])
    if not ns_cyclic:
        a = a.at[..., :H, :].set(
            jnp.where(yi == 0, 0.0, a[..., :H, :]))
        a = a.at[..., -H:, :].set(
            jnp.where(yi == py - 1, 0.0, a[..., -H:, :]))
    return a


def evp_subcycle_sharded(p, grid, mesh, strength, icetmask, iceumask,
                         aiu, uocn, vocn, waterx, watery,
                         forcex, forcey, umassdtei, fm,
                         uvel, vvel, stressp, stressm, stress12,
                         H: int = DEFAULT_H):
    """ndte subcycles with k-halo exchanges under shard_map.

    Same signature/returns as `_evp_subcycle_jnp` (evp.py): returns
    (uvel, vvel, stressp, stressm, stress12, diag, strintx, strinty,
    strocnx, strocny)."""
    from cice4_tpu.ops.evp import _stepu, _stress_update

    py, px = mesh.devices.shape
    ew_cyclic = grid.bc.ew == "cyclic"
    ns_cyclic = grid.bc.ns == "cyclic"
    # the exchange copies H-wide strips of INTERIOR, so H can't exceed
    # the local block; small blocks just exchange more often
    H = min(H, grid.ny // py, grid.nx // px)
    ksub = H - 1
    ndte = p.ndte
    # rounds of ksub subcycles + remainder; final subcycle runs
    # separately for the ridging diagnostics
    nfull = (ndte - 1) // ksub
    rem = (ndte - 1) - nfull * ksub

    geom_names = ("cyp", "cxp", "cym", "cxm", "dxt", "dyt",
                  "dxhy", "dyhx", "tinyarea", "uarear")
    geom_vals = tuple(getattr(grid, n) for n in geom_names)

    spec2 = P("y", "x")
    spec3 = P(None, "y", "x")
    in_specs = ((spec2,) * len(geom_vals)        # geometry
                + (spec2,) * 12                  # per-step constants
                + (spec2, spec2)                 # uvel, vvel
                + (spec3, spec3, spec3))         # stresses

    dtype = uvel.dtype

    def run(*args):
        g = dict(zip(geom_names, args[:len(geom_names)]))
        (strength, icet, iceu, aiu, uocn, vocn, waterx, watery,
         forcex, forcey, umassdtei, fm, uvel, vvel,
         stressp, stressm, stress12) = args[len(geom_names):]
        xi = jax.lax.axis_index("x")
        yi = jax.lax.axis_index("y")
        ex = partial(_exchange, H=H, px=px, py=py, ew_cyclic=ew_cyclic,
                     ns_cyclic=ns_cyclic, xi=xi, yi=yi)

        def pad2(a):
            return jnp.pad(a.astype(dtype) if a.dtype == jnp.bool_
                           else a, ((H, H), (H, H)))

        def pad3(a):
            return jnp.pad(a, ((0, 0), (H, H), (H, H)))

        # constants: pad + fill ghosts once
        geom = SimpleNamespace(**{k: ex(pad2(v)) for k, v in g.items()})
        consts = [ex(pad2(v)) for v in
                  (strength, icet.astype(dtype), iceu.astype(dtype),
                   aiu, uocn, vocn, waterx, watery, forcex, forcey,
                   umassdtei, fm)]
        (strength, icetf, iceuf, aiu, uocn, vocn, waterx, watery,
         forcex, forcey, umassdtei, fm) = consts
        icet = icetf > 0.5
        iceu = iceuf > 0.5
        uvel, vvel = pad2(uvel), pad2(vvel)
        stressp, stressm, stress12 = (pad3(stressp), pad3(stressm),
                                      pad3(stress12))
        nbr = PadNbr()

        def subcycle(carry):
            uvel, vvel, sp, sm, s12 = carry
            sp, sm, s12, str8, _d = _stress_update(
                p, geom, nbr, strength, icet, uvel, vvel, sp, sm, s12)
            uvel, vvel, *_ = _stepu(
                p, geom, nbr, iceu, aiu, str8, uocn, vocn, waterx,
                watery, forcex, forcey, umassdtei, fm, uvel, vvel)
            return uvel, vvel, sp, sm, s12

        def round_k(k, carry):
            uvel, vvel, sp, sm, s12 = carry
            uvel, vvel = ex(uvel), ex(vvel)
            sp, sm, s12 = ex(sp), ex(sm), ex(s12)
            carry = (uvel, vvel, sp, sm, s12)
            return jax.lax.fori_loop(
                0, k, lambda _, c: subcycle(c), carry)

        carry = (uvel, vvel, stressp, stressm, stress12)
        carry = jax.lax.fori_loop(
            0, nfull, lambda _, c: round_k(ksub, c), carry)
        if rem:
            carry = round_k(rem, carry)
        uvel, vvel, sp, sm, s12 = carry

        # final subcycle with ridging diagnostics
        uvel, vvel = ex(uvel), ex(vvel)
        sp, sm, s12 = ex(sp), ex(sm), ex(s12)
        sp, sm, s12, str8, d = _stress_update(
            p, geom, nbr, strength, icet, uvel, vvel, sp, sm, s12)
        uvel, vvel, strintx, strinty, strocnx, strocny = _stepu(
            p, geom, nbr, iceu, aiu, str8, uocn, vocn, waterx, watery,
            forcex, forcey, umassdtei, fm, uvel, vvel)

        core2 = lambda a: a[..., H:-H, H:-H]  # noqa: E731
        diag = dict(div_sum=core2(jnp.sum(d["div"], 0)),
                    delta_sum=core2(jnp.sum(d["delta"], 0)),
                    ten_sum=core2(jnp.sum(d["ten"], 0)),
                    shr_sum=core2(jnp.sum(d["shr"], 0)),
                    prs_sig=core2(d["prs_sig"]))
        return (core2(uvel), core2(vvel), core2(sp), core2(sm),
                core2(s12), diag,
                core2(strintx), core2(strinty),
                core2(strocnx), core2(strocny))

    diag_spec = dict(div_sum=spec2, delta_sum=spec2, ten_sum=spec2,
                     shr_sum=spec2, prs_sig=spec2)
    out_specs = ((spec2, spec2, spec3, spec3, spec3, diag_spec)
                 + (spec2,) * 4)
    fn = shard_map(run, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs)
    return fn(*geom_vals, strength, icetmask, iceumask, aiu, uocn,
              vocn, waterx, watery, forcex, forcey, umassdtei, fm,
              uvel, vvel, stressp, stressm, stress12)


def sharded_eligible(grid, mesh) -> bool:
    """Fast-path eligibility: an active multi-device mesh, non-tripole
    boundaries, block sizes divisible by the mesh shape."""
    if mesh is None:
        return False
    py, px = mesh.devices.shape
    if py * px <= 1:
        return False
    if grid.bc.ns in ("tripole", "tripoleT"):
        return False
    return grid.ny % py == 0 and grid.nx % px == 0