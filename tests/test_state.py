"""State initialization tests (vs set_state_var / init_itd semantics)."""

import jax.numpy as jnp
import numpy as np

from cice4_tpu import constants as cn
from cice4_tpu.config import gx3_config
from cice4_tpu.state import init_state, make_itd_params, zeros_state


def test_itd_bounds_kcatbound0():
    itd = make_itd_params(gx3_config())
    # CICE 4.1 standard 5-category bounds (Lipscomb 2001 formula)
    expect = [0.0, 0.6445072, 1.3914334, 2.4701793, 4.5672879]
    assert np.allclose(itd.hin_max[:5], expect, atol=1e-5)
    assert itd.hin_max[5] > 9.0
    assert np.all(np.diff(itd.hin_max) > 0)


def test_salinity_profile():
    itd = make_itd_params(gx3_config())
    # monotone increasing toward the base, max at saltmax
    assert np.all(np.diff(itd.salin) >= 0)
    assert np.isclose(itd.salin[-1], 3.2)
    assert np.all(itd.tmlt <= 0)


def test_init_state_default(gx3_grid, gx3_cfg):
    itd = make_itd_params(gx3_cfg)
    s = init_state(gx3_cfg, gx3_grid, itd, dtype=jnp.float64)
    aice = np.asarray(jnp.sum(s.aicen, 0))
    # total concentration in [0, 1]
    assert aice.max() <= 1.0 + 1e-12
    assert aice.min() >= 0.0
    # ice exists in both hemispheres poleward of the init edges
    ulat = np.asarray(gx3_grid.ulat)
    assert aice[(ulat > np.deg2rad(75)) & np.asarray(gx3_grid.tmask)].max() > 0.5
    # no ice equatorward of both edges
    mid = (ulat > np.deg2rad(-55)) & (ulat < np.deg2rad(65))
    assert aice[mid].max() == 0.0
    # enthalpy negative where ice present
    has_ice = np.asarray(s.vicen) > 0
    assert np.all(np.asarray(s.eicen)[:, 0][has_ice] < 0)
    # snow bounded by 0.2 * vicen
    assert np.all(np.asarray(s.vsnon) <= 0.2 * np.asarray(s.vicen) + 1e-12)


def test_zeros_state_shapes(gx3_grid, gx3_cfg):
    s = zeros_state(gx3_cfg, gx3_grid)
    assert s.aicen.shape == (5, 116, 100)
    assert s.eicen.shape == (5, 4, 116, 100)
    assert s.esnon.shape == (5, 1, 116, 100)
    assert s.stressp.shape == (4, 116, 100)
    assert "iage" in s.trcrn


def test_state_is_pytree(gx3_grid, gx3_cfg):
    import jax

    s = zeros_state(gx3_cfg, gx3_grid)
    leaves = jax.tree_util.tree_leaves(s)
    assert len(leaves) >= 15
    s2 = jax.tree_util.tree_map(lambda a: a + 1, s)
    assert float(s2.sst[0, 0]) == 1.0
