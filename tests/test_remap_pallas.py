"""Fused Pallas remap kernel vs the XLA path (interpret mode on CPU).

Both paths evaluate the same triangle-quadrature sums (the kernel
reassociates them through the geometric accumulators, see
`remap._geom_accumulators`), so on the f64 CPU backend they must agree
to tight roundoff.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice4_tpu.config import Config, DomainConfig, DynamicsConfig, \
    GridConfig, TransportConfig
from cice4_tpu.grid import make_grid
from cice4_tpu.model import Model
from cice4_tpu.ops.remap import transport_remap
from cice4_tpu.state import init_state


def _setup(ny=24, nx=32, tracers=True):
    cfg = Config(
        domain=DomainConfig(nx_global=nx, ny_global=ny,
                            ew_boundary_type="cyclic",
                            ns_boundary_type="closed"),
        grid=GridConfig(grid_type="rectangular", lat_origin=62.0),
        dynamics=DynamicsConfig(ndte=10),
        transport=TransportConfig(advection="remap"),
    )
    grid = make_grid(cfg, dtype=jnp.float64)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float64)
    x = jnp.arange(nx)[None, :] / nx
    y = jnp.arange(ny)[:, None] / ny
    state = state.replace(
        uvel=0.3 * jnp.sin(6.28 * x) * jnp.cos(3.14 * y) * grid.umask,
        vvel=0.2 * jnp.cos(6.28 * x) * jnp.sin(3.14 * y) * grid.umask)
    return cfg, grid, state


@pytest.mark.parametrize("order", [1, 2, 3])
def test_pallas_matches_jnp(order):
    cfg, grid, state = _setup()
    dt = 3600.0
    s_ref, a0_ref = transport_remap(state, grid, dt, order,
                                    use_pallas=False)
    s_pal, a0_pal = transport_remap(state, grid, dt, order,
                                    use_pallas=True)
    np.testing.assert_allclose(np.asarray(a0_pal), np.asarray(a0_ref),
                               rtol=1e-9, atol=1e-12)
    for name in ("aicen", "vicen", "vsnon", "tsfcn", "eicen", "esnon"):
        a = np.asarray(getattr(s_ref, name))
        b = np.asarray(getattr(s_pal, name))
        np.testing.assert_allclose(b, a, rtol=1e-8, atol=1e-10,
                                   err_msg=name)
    for name in s_ref.trcrn:
        np.testing.assert_allclose(np.asarray(s_pal.trcrn[name]),
                                   np.asarray(s_ref.trcrn[name]),
                                   rtol=1e-8, atol=1e-10, err_msg=name)


def test_pallas_conserves_mass():
    cfg, grid, state = _setup()
    dt = 3600.0
    s_pal, _ = transport_remap(state, grid, dt, 2, use_pallas=True)
    for f in ("aicen", "vicen", "vsnon"):
        before = np.sum(np.asarray(getattr(state, f)) *
                        np.asarray(grid.tarea))
        after = np.sum(np.asarray(getattr(s_pal, f)) *
                       np.asarray(grid.tarea))
        assert abs(after - before) <= 1e-9 * max(abs(before), 1.0), f


@pytest.mark.tpu
@pytest.mark.parametrize("config", ["gx3", "gx1"])
def test_remap_kernel_compiles_on_tpu(config):
    """Round-3 regression: the remap kernel MUST compile and match the
    jnp path on the real chip at the shipped global-grid shapes (it
    had only ever been validated in interpret mode, and Mosaic
    rejected nx=100/320).  Runs tools/check_remap_tpu.py in a fresh
    process (the suite's process is pinned to CPU).  Opt in with
    `-m tpu` on a TPU host; first compile is minutes."""
    import subprocess
    import sys

    root = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "check_remap_tpu.py"),
         config],
        capture_output=True, text=True, timeout=2400,
        env={k: v for k, v in os.environ.items()
             if k not in ("JAX_PLATFORMS",)})
    tail = "\n".join(proc.stdout.splitlines()[-12:])
    if "TPU" not in tail and proc.returncode != 0 \
            and "backend" in (proc.stdout + proc.stderr):
        pytest.skip("no TPU available")
    assert proc.returncode == 0, tail
    assert "OK" in tail, tail
