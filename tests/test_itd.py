"""ITD machinery tests: conservation + bound enforcement properties.

Mirrors the reference's built-in invariant checks
(``ice_itd.F90 column_conservation_check:1409-1473``) as pytest
properties on random states (SURVEY §4.3/§4e).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice4_tpu import constants as cn
from cice4_tpu.config import gx3_config
from cice4_tpu.grid import make_rect_grid
from cice4_tpu.ops import itd as itd_ops
from cice4_tpu.parallel.halo import BoundaryConditions
from cice4_tpu.state import make_itd_params, zeros_state


@pytest.fixture(scope="module")
def setup():
    cfg = gx3_config()
    bc = BoundaryConditions(ew="cyclic", ns="open")
    grid = make_rect_grid(32, 24, bc, land_edges=False, dtype=jnp.float64)
    itd = make_itd_params(cfg)
    return cfg, grid, itd


def random_state(cfg, grid, itd, seed=0, messy=False):
    """Random physically-plausible category state."""
    rng = np.random.default_rng(seed)
    ncat, nilyr, nslyr = itd.ncat, itd.nilyr, itd.nslyr
    ny, nx = grid.ny, grid.nx
    s = zeros_state(cfg, grid, dtype=jnp.float64)
    aicen = rng.uniform(0, 0.18, (ncat, ny, nx))
    # thickness within (or out of, if messy) category bounds
    h = np.empty((ncat, ny, nx))
    for n in range(ncat):
        lo = itd.hin_max[n] + 0.05
        hi = min(itd.hin_max[n + 1], lo + 4.0) - 0.02
        h[n] = rng.uniform(lo, hi, (ny, nx))
    if messy:
        h *= rng.uniform(0.3, 3.0, h.shape)  # violate bounds
    vicen = aicen * h
    vsnon = aicen * rng.uniform(0, 0.3, aicen.shape)
    qin = -rng.uniform(1.0e8, 3.0e8, (ncat, nilyr, ny, nx))
    eicen = qin * (vicen / nilyr)[:, None]
    qsn = -rng.uniform(0.5e8, 1.1e8, (ncat, nslyr, ny, nx))
    esnon = qsn * (vsnon / nslyr)[:, None]
    tsfcn = rng.uniform(-30.0, -1.0, aicen.shape)
    trcrn = {"iage": rng.uniform(0, 1e8, aicen.shape) * jnp.ones(1)}
    return s.replace(
        aicen=jnp.asarray(aicen), vicen=jnp.asarray(vicen),
        vsnon=jnp.asarray(vsnon), eicen=jnp.asarray(eicen),
        esnon=jnp.asarray(esnon), tsfcn=jnp.asarray(tsfcn), trcrn=trcrn)


def totals(s):
    return {
        "area": np.asarray(jnp.sum(s.aicen, 0)),
        "vice": np.asarray(jnp.sum(s.vicen, 0)),
        "vsno": np.asarray(jnp.sum(s.vsnon, 0)),
        "eice": np.asarray(jnp.sum(s.eicen, (0, 1))),
        "esno": np.asarray(jnp.sum(s.esnon, (0, 1))),
        "viage": np.asarray(jnp.sum(s.vicen * s.trcrn["iage"], 0)),
    }


def test_aggregate(setup):
    cfg, grid, itd = setup
    s = random_state(cfg, grid, itd)
    agg = itd_ops.aggregate(s, grid.tmask)
    assert np.allclose(np.asarray(agg["aice"]),
                       np.asarray(jnp.sum(s.aicen, 0)))
    assert np.allclose(np.asarray(agg["aice"] + agg["aice0"]), 1.0)
    # volume-weighted age mean
    viage = np.asarray(jnp.sum(s.vicen * s.trcrn["iage"], 0))
    vice = np.asarray(agg["vice"])
    assert np.allclose(np.asarray(agg["trcr"]["iage"]) * vice, viage)


def test_rebin_conserves_and_bounds(setup):
    cfg, grid, itd = setup
    s = random_state(cfg, grid, itd, seed=3, messy=True)
    before = totals(s)
    out = jax.jit(lambda st: itd_ops.rebin(st, itd))(s)
    after = totals(out)
    for k in before:
        assert np.allclose(before[k], after[k], rtol=1e-10, atol=1e-8), k
    # thickness within bounds where area > puny
    a = np.asarray(out.aicen)
    h = np.where(a > cn.puny, np.asarray(out.vicen) / np.maximum(a, 1e-30), 0)
    for n in range(itd.ncat):
        sel = a[n] > cn.puny
        if n < itd.ncat - 1:  # top category is unbounded above
            assert np.all(h[n][sel] <= itd.hin_max[n + 1] * (1 + 1e-9)), n
        if n > 0:
            assert np.all(h[n][sel] > itd.hin_max[n] * (1 - 1e-9)), n


def test_rebin_identity_when_in_bounds(setup):
    cfg, grid, itd = setup
    s = random_state(cfg, grid, itd, seed=5, messy=False)
    out = jax.jit(lambda st: itd_ops.rebin(st, itd))(s)
    assert np.allclose(np.asarray(out.aicen), np.asarray(s.aicen))
    assert np.allclose(np.asarray(out.vicen), np.asarray(s.vicen))
    assert np.allclose(np.asarray(out.tsfcn), np.asarray(s.tsfcn))
    assert np.allclose(np.asarray(out.trcrn["iage"]),
                       np.asarray(s.trcrn["iage"]))


def test_zap_small_conserves_with_ocean(setup):
    cfg, grid, itd = setup
    s = random_state(cfg, grid, itd, seed=7)
    # make some categories tiny
    a = np.array(s.aicen)
    a[2, ::3, ::2] = 0.5 * cn.puny
    s = s.replace(aicen=jnp.asarray(a))
    dt = 3600.0
    before = totals(s)
    out, flux = jax.jit(
        lambda st: itd_ops.zap_small_areas(st, grid.tmask, dt))(s)
    after = totals(out)
    # mass: rhoi*dvice + rhos*dvsno == dfresh*dt
    dmass = (cn.rhoi * (before["vice"] - after["vice"])
             + cn.rhos * (before["vsno"] - after["vsno"]))
    assert np.allclose(dmass, np.asarray(flux["dfresh"]) * dt, rtol=1e-9,
                       atol=1e-10)
    denergy = (before["eice"] - after["eice"]) + (before["esno"] - after["esno"])
    assert np.allclose(denergy, np.asarray(flux["dfhocn"]) * dt, rtol=1e-9,
                       atol=1e-6)
    # zapped categories actually gone
    assert np.all((np.asarray(out.aicen) == 0)
                  | (np.asarray(out.aicen) > cn.puny * 0.99))
