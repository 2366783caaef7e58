"""Reference-parity harness: the canonical 744-step gx3 January month.

The reference's shipped test problem is gx3 with 744 hourly steps and
diagnostics every 24 steps (`ice.log.Linux.LANL.coyote:193-775`).  Its
restart dump and 1997 NCAR forcing files do NOT ship with the source,
so this run starts from the default initial state (`ice_init.F90
set_state_var:921-1195`) under the idealized seasonal forcing and
asserts:

* budget closure — the heat / fresh-water / salt conservation errors
  of `runtime_diags:370-560` stay below the reference's tolerance
  every diagnostic interval, for the whole month (this must hold for
  ANY forcing — it is the reference's own runtime abort criterion);
* hemispheric sanity bands — area/extent/volume/speeds stay within
  wide physical bands transcribed from the reference log's January
  trajectory (same season, same grid, different IC/forcing — see
  PARITY.md for the side-by-side magnitudes);
* no guard violations (conservation/ridging/ITD in-graph checks).

Set CICE4_MONTH_STEPS to shorten locally (e.g. 48 for smoke).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

NPT = int(os.environ.get("CICE4_MONTH_STEPS", "744"))

# reference January gx3 trajectory magnitudes
# (ice.log.Linux.LANL.coyote:193-775, istep 24..744)
REF = dict(
    area_n=(1.70e7, 1.74e7),      # km^2
    extent_n=(1.74e7, 1.78e7),
    volume_n=(2.28e13, 2.32e13),  # m^3
    area_s=(5.9e6, 7.1e6),
    volume_s=(1.08e13, 1.17e13),
    rms_speed=(0.05, 0.14),       # m/s
    max_strength=(30.0, 170.0),   # kN/m
)

# sanity bands for THIS run (default IC + idealized forcing): one
# order-of-magnitude envelope around the reference's January state
BANDS = dict(
    area_n=(4.0e6, 3.0e7),
    extent_n=(4.0e6, 4.0e7),
    volume_n=(4.0e12, 8.0e13),
    area_s=(1.0e6, 3.0e7),
    volume_s=(1.0e12, 8.0e13),
)


@pytest.mark.slow
def test_gx3_month_budget_and_trajectory():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from run_gx3_month import run_month

    rows = run_month(npt=NPT, dtype=jnp.float64, log=lambda *_: None)
    assert rows, "no diagnostic intervals collected"

    # budget closure every diag interval (reference aborts above
    # ferrmax = 1e-3 W/m^2-equivalent; the normalized errors printed
    # in the log are O(1e-13) in f64 — require the reference's
    # runtime_diags tolerance)
    for d in rows:
        for hem in ("n", "s"):
            assert abs(d[f"werr_{hem}"]) < 1e-7, (d["istep"], hem, d)
            assert abs(d[f"herr_{hem}"]) < 1e-7, (d["istep"], hem, d)
            assert abs(d[f"serr_{hem}"]) < 1e-7, (d["istep"], hem, d)

    # trajectory bands: every interval after spinup (first 2 days)
    for d in rows[2:]:
        assert BANDS["area_n"][0] < d["area_n"] < BANDS["area_n"][1], d
        assert BANDS["volume_n"][0] < d["volume_n"] < BANDS["volume_n"][1], d
        assert BANDS["area_s"][0] < d["area_s"] < BANDS["area_s"][1], d
        assert BANDS["volume_s"][0] < d["volume_s"] < BANDS["volume_s"][1], d
        assert d["extent_n"] >= d["area_n"] * 0.9
        # speeds/strength physically bounded
        assert 0.0 <= d["rms_speed_n"] < 1.0, d
        assert 0.0 <= d["rms_speed_s"] < 1.0, d
        assert 0.0 <= d["max_strength_n"] < 500.0, d

    # all fields finite at the end
    last = rows[-1]
    for k, v in last.items():
        assert np.isfinite(v), (k, v)
