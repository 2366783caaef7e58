"""Decomposition invariance: 1 device vs 8-device mesh allclose.

The TPU-world analogue of the reference's serial/mpi twin backends
(SURVEY §4.1/§4.5): the same jitted step run on a sharded 8-device CPU
mesh must reproduce the unsharded result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice4_tpu.config import Config, DomainConfig, DynamicsConfig, \
    GridConfig, TransportConfig
from cice4_tpu.forcing import default_forcing
from cice4_tpu.grid import make_grid
from cice4_tpu.model import Model, ice_step
from cice4_tpu.parallel.mesh import make_mesh, shard_pytree
from cice4_tpu.state import init_state


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        domain=DomainConfig(nx_global=32, ny_global=16),
        grid=GridConfig(grid_type="rectangular", lat_origin=66.0),
        dynamics=DynamicsConfig(ndte=20),
        transport=TransportConfig(advection="remap"),
    )
    grid = make_grid(cfg, dtype=jnp.float64)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float64)
    f = default_forcing(grid.ny, grid.nx, jnp.float64)
    f = f.replace(uatm=f.uatm + 4.0, vatm=f.vatm + 1.0,
                  wind=f.wind + 4.2, swvdr=f.swvdr + 40.0,
                  swvdf=f.swvdf + 40.0)
    return cfg, grid, model, state, f


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_step_matches_single(setup):
    cfg, grid, model, state, f = setup

    def step(state, grid, forcing):
        return ice_step(model, state, grid, forcing, 80.0, 0.0)

    # single device reference
    s1, flux1 = jax.jit(step)(state, grid, f)

    # 8-device mesh
    mesh = make_mesh(8)
    state_s = shard_pytree(state, mesh)
    grid_s = shard_pytree(grid, mesh)
    f_s = shard_pytree(f, mesh)
    s8, flux8 = jax.jit(step)(state_s, grid_s, f_s)

    l1, t1 = jax.tree_util.tree_flatten(s1)
    l8, t8 = jax.tree_util.tree_flatten(s8)
    assert t1 == t8
    for a, b, path in zip(l1, l8, range(len(l1))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"leaf {path}")
    for k in ("fresh", "fhocn", "congel", "divu"):
        np.testing.assert_allclose(np.asarray(flux1[k]),
                                   np.asarray(flux8[k]),
                                   rtol=1e-8, atol=1e-9, err_msg=k)


def test_sharded_multi_step_stable(setup):
    cfg, grid, model, state, f = setup
    mesh = make_mesh(8)
    state_s = shard_pytree(state, mesh)
    grid_s = shard_pytree(grid, mesh)
    f_s = shard_pytree(f, mesh)

    @jax.jit
    def step(state, grid, forcing):
        return ice_step(model, state, grid, forcing, 80.0, 0.0)

    s = state_s
    for _ in range(3):
        s, _fluxes = step(s, grid_s, f_s)
    a = np.asarray(jnp.sum(s.aicen, 0))
    assert np.isfinite(a).all()
    assert a.max() <= 1.0 + 1e-9
