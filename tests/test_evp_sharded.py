"""k-halo sharded EVP fast path vs the single-device jnp reference
(`ops/evp_sharded.py` vs `_evp_subcycle_jnp`).

The fast path reorganizes WHEN halos are exchanged (every H-1
subcycles instead of implicitly at every roll) but runs the identical
per-subcycle math, so on the 8-device CPU mesh it must match the
unsharded jnp path to roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice4_tpu.config import Config, DomainConfig, DynamicsConfig, \
    GridConfig, TransportConfig
from cice4_tpu.forcing import default_forcing
from cice4_tpu.grid import make_grid
from cice4_tpu.model import Model
from cice4_tpu.ops import evp as evp_mod
from cice4_tpu.ops import itd as itd_ops
from cice4_tpu.parallel.mesh import (get_active_mesh, make_mesh,
                                     set_active_mesh, shard_pytree)
from cice4_tpu.state import init_state


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        domain=DomainConfig(nx_global=32, ny_global=16,
                            ew_boundary_type="cyclic",
                            ns_boundary_type="open"),
        grid=GridConfig(grid_type="rectangular", lat_origin=66.0),
        dynamics=DynamicsConfig(ndte=24),
        transport=TransportConfig(advection="remap"),
    )
    grid = make_grid(cfg, dtype=jnp.float64)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float64)
    f = default_forcing(grid.ny, grid.nx, jnp.float64)
    x = jnp.arange(grid.nx, dtype=jnp.float64)[None, :]
    y = jnp.arange(grid.ny, dtype=jnp.float64)[:, None]
    uatm = 4.0 + 3.0 * jnp.sin(2 * jnp.pi * x / grid.nx) + 0.0 * y
    vatm = 1.0 + 2.0 * jnp.cos(2 * jnp.pi * y / grid.ny) + 0.0 * x
    f = f.replace(uatm=uatm, vatm=vatm,
                  wind=jnp.sqrt(uatm**2 + vatm**2))
    return cfg, grid, model, state, f


def _run_evp(cfg, grid, model, state, f, mesh=None):
    agg = itd_ops.aggregate(state, grid.tmask)
    strairxT = 0.0012 * 1.3 * f.wind * f.uatm * agg["aice"]
    strairyT = 0.0012 * 1.3 * f.wind * f.vatm * agg["aice"]
    set_active_mesh(mesh)
    try:
        args = (state, grid,
                agg["aice"], agg["vice"], agg["vsno"],
                state.aicen, state.vicen,
                jnp.maximum(1.0 - agg["aice"], 0.0),
                f.uocn, f.vocn, f.ss_tltx, f.ss_tlty,
                strairxT, strairyT)
        if mesh is not None:
            args = shard_pytree(args, mesh)
        dyn, dt = cfg.dynamics, cfg.run.dt
        fn = jax.jit(lambda s, g, *a: evp_mod.evp(s, g, dyn, dt, *a))
        out_state, diag = fn(*args)
        jax.block_until_ready(out_state.uvel)
    finally:
        set_active_mesh(None)
    return out_state, diag


def test_sharded_evp_matches_jnp(setup):
    cfg, grid, model, state, f = setup
    s_ref, d_ref = _run_evp(cfg, grid, model, state, f, mesh=None)
    mesh = make_mesh(8)
    from cice4_tpu.ops.evp_sharded import sharded_eligible
    assert sharded_eligible(grid, mesh)
    s_sh, d_sh = _run_evp(cfg, grid, model, state, f, mesh=mesh)

    # compiled-program reassociation noise through ndte subcycles
    # lands ~1e-11 absolute (scattered interior cells, not seams)
    for name in ("uvel", "vvel"):
        a = np.asarray(getattr(s_ref, name))
        b = np.asarray(getattr(s_sh, name))
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-9,
                                   err_msg=name)
    for name in ("strocnxT", "strocnyT"):
        np.testing.assert_allclose(np.asarray(getattr(s_sh, name)),
                                   np.asarray(getattr(s_ref, name)),
                                   rtol=1e-6, atol=1e-9, err_msg=name)
    for k in ("rdg_conv", "rdg_shear", "divu", "shear"):
        np.testing.assert_allclose(np.asarray(d_sh[k]),
                                   np.asarray(d_ref[k]),
                                   rtol=1e-6, atol=1e-10, err_msg=k)
    # stresses: relative to field scale (replacement-pressure noise
    # amplification near zero strain, see test_sharding docstring)
    for name in ("stressp", "stressm", "stress12"):
        a = np.asarray(getattr(s_ref, name))
        b = np.asarray(getattr(s_sh, name))
        scale = np.abs(a).max() + 1.0
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-9,
                                   err_msg=name)


def test_sharded_evp_open_ew(setup):
    """Non-cyclic EW: global-edge ghosts zero-fill like the halo
    module."""
    cfg, grid, model, state, f = setup
    import dataclasses
    dom = dataclasses.replace(cfg.domain, ew_boundary_type="open")
    cfg2 = dataclasses.replace(cfg, domain=dom)
    grid2 = make_grid(cfg2, dtype=jnp.float64)
    s_ref, _ = _run_evp(cfg2, grid2, model, state, f, mesh=None)
    s_sh, _ = _run_evp(cfg2, grid2, model, state, f, mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(s_sh.uvel),
                               np.asarray(s_ref.uvel),
                               rtol=1e-6, atol=1e-9)


def test_eligibility_gates():
    from cice4_tpu.ops.evp_sharded import sharded_eligible

    class G:
        ny, nx = 30, 32

        class bc:
            ns = "open"
            ew = "cyclic"

    mesh = make_mesh(8)
    py, px = mesh.devices.shape
    assert sharded_eligible(G, mesh) == (30 % py == 0 and 32 % px == 0)
    assert not sharded_eligible(G, None)
    # round 5: the production U-fold engages the fast path (given
    # blocks tall enough for the fold slab); the T-fold still gates
    G.bc.ns = "tripole"
    assert sharded_eligible(G, mesh) == (
        30 % py == 0 and 32 % px == 0 and 30 // py >= 3)
    G.bc.ns = "tripoleT"
    assert not sharded_eligible(G, mesh)
    G.bc.ns = "open"


def _count_ppermutes(jaxpr, mult=1):
    """Dynamic ppermute executions in a jaxpr: recurse through nested
    jaxprs, multiplying through `scan` trip counts (static fori_loops
    lower to scan, so the k-halo round loop is countable exactly)."""
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "ppermute":
            total += mult
            continue
        m = mult
        if name == "scan":
            m = mult * eqn.params["length"]
        for v in eqn.params.values():
            vs = v if isinstance(v, (list, tuple)) else (v,)
            for w in vs:
                if hasattr(w, "jaxpr"):      # ClosedJaxpr
                    total += _count_ppermutes(w.jaxpr, m)
                elif hasattr(w, "eqns"):     # raw Jaxpr
                    total += _count_ppermutes(w, m)
    return total


def _hlo_while_body_permute_rate(txt):
    """Static collective-permute count inside while bodies of compiled
    HLO (= permutes executed on EVERY loop iteration)."""
    import re
    bodies = set(re.findall(r"body=%?([\w.\-]+)", txt))
    comp = None
    counts = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ENTRY\s+)?%([\w.\-]+)\s*\(", line)
        if m:
            comp = m.group(1)
        if ("collective-permute" in line
                and "collective-permute-done" not in line):
            counts[comp] = counts.get(comp, 0) + 1
    return sum(counts.get(b, 0) for b in bodies)


def test_collective_structure(setup):
    """The round-5 regression test for PERF.md's central multi-chip
    claim: the k-halo fast path executes an order of magnitude fewer
    collective-permutes per dynamics step than the GSPMD per-roll
    pattern (`ice.log.Linux.LANL.coyote:795` is the cost being
    designed away).

    Fast path: counted EXACTLY from the jaxpr (explicit `ppermute`
    calls x scan trip counts).  GSPMD fallback: lower-bounded from the
    compiled HLO (permutes inside the subcycle while body x ndte)."""
    cfg, grid, model, state, f = setup
    mesh = make_mesh(8)
    py, px = mesh.devices.shape
    from cice4_tpu.ops.evp_sharded import (DEFAULT_H,
                                           evp_subcycle_sharded)

    agg = itd_ops.aggregate(state, grid.tmask)
    ny, nx = grid.ny, grid.nx
    z2 = jnp.zeros((ny, nx))
    z3 = jnp.zeros((4, ny, nx))
    from cice4_tpu.ops.evp import _evp_subcycle_jnp, make_evp_params
    p = make_evp_params(cfg.dynamics, cfg.run.dt)
    args = (agg["aice"] + 0.1, grid.tmask, grid.umask,
            agg["aice"], f.uocn, f.vocn, z2, z2, z2, z2,
            z2 + 1.0, z2, z2, z2, z3, z3, z3)

    # ---- fast path: exact dynamic count from the jaxpr -------------
    set_active_mesh(mesh)
    try:
        jx = jax.make_jaxpr(
            lambda *a: evp_subcycle_sharded(p, grid, mesh, *a))(*args)
    finally:
        set_active_mesh(None)
    fast = _count_ppermutes(jx.jaxpr)

    H = min(DEFAULT_H, ny // py, nx // px)
    ksub = H - 1
    nfull = (p.ndte - 1) // ksub
    rem = (p.ndte - 1) - nfull * ksub
    rounds = nfull + (1 if rem else 0) + 1
    # 4 permutes per batched round + 4 for the one-time constants
    expected = 4 * rounds + 4
    assert fast == expected, (fast, expected)

    # ---- GSPMD fallback: per-iteration permutes from the HLO -------
    from cice4_tpu.parallel.mesh import pytree_shardings
    shardings = pytree_shardings(args, mesh)
    txt = jax.jit(
        lambda *a: _evp_subcycle_jnp(p, grid, *a),
        in_shardings=shardings,
    ).lower(*args).compile().as_text()
    per_iter = _hlo_while_body_permute_rate(txt)
    assert per_iter >= 2, f"expected rolls in the subcycle body: {per_iter}"
    gspmd = per_iter * p.ndte

    # the headline claim: >= an order of magnitude fewer collectives
    assert fast * 8 <= gspmd, (fast, gspmd)
