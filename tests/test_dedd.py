"""Delta-Eddington shortwave tests: energy closure + physical albedos."""

import jax.numpy as jnp
import numpy as np
import pytest

from cice4_tpu.config import RadiationConfig
from cice4_tpu.ops.meltpond import compute_ponds
from cice4_tpu.ops.shortwave_dedd import set_pond, set_snow, shortwave_dEdd


def _run(hice=1.8, hsno=0.2, tsf=-2.0, coszen=0.5, aice=0.9, R_snw=0.0):
    ny = nx = 4
    f = lambda v: jnp.full((ny, nx), v, jnp.float64)
    rad = RadiationConfig(R_snw=R_snw)
    out = shortwave_dEdd(rad, 4, 1, f(aice), f(aice * hice), f(aice * hsno),
                         f(tsf), f(coszen), f(100.0), f(100.0), f(60.0),
                         f(60.0))
    return {k: float(np.asarray(v).reshape(-1)[0]) if np.asarray(v).ndim == 2
            else np.asarray(v)[..., 0, 0] for k, v in out.items()}


def test_energy_closure():
    o = _run()
    absorbed = o["fswsfc"] + o["fswint"] + o["fswthru"]
    reflected = (o["alvdrn"] * 100 + o["alvdfn"] * 100
                 + o["alidrn"] * 60 + o["alidfn"] * 60)
    assert abs(absorbed + reflected - 320.0) < 1e-9


def test_snow_albedo_physical():
    o = _run(hsno=0.3, tsf=-10.0)
    assert 0.9 < o["alvdfn"] < 1.0      # cold snow visible albedo
    assert 0.4 < o["alidfn"] < 0.8      # near-IR lower
    assert o["albsn"] > 0.75


def test_bare_ice_darker_than_snow():
    snow = _run(hsno=0.3)
    bare = _run(hsno=0.0)
    assert bare["alvdfn"] < snow["alvdfn"] - 0.1
    # bare ice transmits much more to the ocean
    assert bare["fswthru"] > snow["fswthru"]


def test_melting_surface_darker():
    cold = _run(tsf=-10.0)
    warm = _run(tsf=-0.05)   # ponded/melting: lower albedo
    assert warm["albin"] <= cold["albin"] + 1e-12
    assert warm["alvdfn"] < cold["alvdfn"]


def test_r_snw_tuning_brightens():
    base = _run(tsf=-10.0, hsno=0.3)
    tuned = _run(tsf=-10.0, hsno=0.3, R_snw=1.5)
    assert tuned["alvdfn"] >= base["alvdfn"]


def test_night_is_zero():
    o = _run(coszen=0.0)
    for k in ("fswsfc", "fswint", "fswthru", "alvdfn"):
        assert o[k] == 0.0


def test_layer_absorption_sums():
    ny = nx = 4
    f = lambda v: jnp.full((ny, nx), v, jnp.float64)
    rad = RadiationConfig()
    out = shortwave_dEdd(rad, 4, 1, f(1.0), f(2.0), f(0.2), f(-5.0),
                         f(0.6), f(100.0), f(100.0), f(60.0), f(60.0))
    # interior absorption >= snow + ice layer sums (surface layers in fswsfc)
    tot_layers = float(jnp.sum(out["Sswabs"][:, 2, 2])
                       + jnp.sum(out["Iswabs"][:, 2, 2]))
    fint = float(out["fswint"][2, 2])
    assert tot_layers <= fint + 1e-6
    assert tot_layers >= 0.0


def test_compute_ponds_grow_and_drain():
    f = lambda v: jnp.full((3, 3), v, jnp.float64)
    dt = 3600.0
    # melting: ponds grow
    vol, ap, hp = compute_ponds(dt, f(0.02), f(0.01), f(0.0), f(0.9),
                                f(1.8), f(0.0), f(-0.1), f(0.0))
    assert float(vol[0, 0]) > 0.0
    assert float(ap[0, 0]) > 0.0
    # freezing: ponds shrink from an existing volume
    vol2, ap2, hp2 = compute_ponds(dt, f(0.0), f(0.0), f(0.0), f(0.9),
                                   f(1.8), f(0.0), f(-20.0),
                                   jnp.full((3, 3), 0.05, jnp.float64))
    assert float(vol2[0, 0]) < 0.05
    # thin ice: no ponds
    vol3, ap3, _ = compute_ponds(dt, f(0.02), f(0.0), f(0.0), f(0.9),
                                 f(0.05), f(0.0), f(-0.1), f(0.01))
    assert float(ap3[0, 0]) == 0.0
