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
