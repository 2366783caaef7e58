"""Reference-parity harness: the canonical 744-step gx3 January month.

The reference's shipped test problem is gx3 with 744 hourly steps and
diagnostics every 24 steps (`ice.log.Linux.LANL.coyote:193-775`).  Its
restart dump and 1997 NCAR forcing files do NOT ship with the source,
so this run starts from the default initial state (`ice_init.F90
set_state_var:921-1195`) under the idealized seasonal forcing and
asserts:

* budget closure — the heat / fresh-water / salt conservation errors
  of `runtime_diags:370-560` close to f64 roundoff every diagnostic
  interval for the whole month (measured |herr| <= 5e-10,
  |werr|,|serr| <= 4e-13 — this must hold for ANY forcing);
* Northern-hemisphere trajectory vs the reference log at istep
  24/360/744: area and extent within the IC/forcing-explained band
  (measured -11%..+4% of the reference; see PARITY.md for the full
  side-by-side table), volume within the documented default-IC
  thickness bias (x1.4-1.55), speeds/strength in the reference's
  dynamic range;
* Southern hemisphere: bounded sanity only — January is SH summer and
  the default IC covers far more of the Southern Ocean than the
  reference's spun-up restart, so SH magnitudes are IC-dominated
  (documented in PARITY.md);
* no guard violations (thermo/transport/ridging/ITD in-graph checks
  abort the run via ConservationError if they fire).

Set CICE4_MONTH_STEPS to shorten locally (e.g. 48 for smoke).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

NPT = int(os.environ.get("CICE4_MONTH_STEPS", "744"))

# reference gx3 January trajectory (ice.log.Linux.LANL.coyote at
# istep1 = 24 / 360 / 744; NH = "Arctic" column)
REF = {
    24: dict(area_n=1.52244e7, extent_n=1.54435e7, volume_n=1.90387e13,
             rms_speed_n=0.05533, max_strength_n=113.18),
    360: dict(area_n=1.64236e7, extent_n=1.67283e7, volume_n=2.10656e13,
              rms_speed_n=0.08548, max_strength_n=133.91),
    744: dict(area_n=1.73606e7, extent_n=1.76915e7, volume_n=2.31726e13,
              rms_speed_n=0.05083, max_strength_n=163.12),
}

# allowed ratio vs the reference value (different IC + idealized
# forcing; measured ratios in PARITY.md).  Round-5: bands narrowed to
# the measured envelope (area 0.889-0.970, extent 0.966-1.036, volume
# 1.427-1.552 over the three checkpoints) + ~5% head-room, so a
# regression hiding inside the old 0.80-1.10 / 1.20-1.75 bands now
# fails.
RATIO = dict(area_n=(0.85, 1.02), extent_n=(0.92, 1.08),
             volume_n=(1.35, 1.62))


@pytest.mark.slow
def test_gx3_month_budget_and_trajectory():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from run_gx3_month import run_month

    rows = run_month(npt=NPT, dtype=jnp.float64, log=lambda *_: None)
    assert rows, "no diagnostic intervals collected"
    by_step = {r["istep"]: r for r in rows}

    # budget closure every diag interval: heat/water/salt errors at
    # f64 roundoff (the reference prints these only in coupled builds;
    # our diag closes exactly — see diagnostics.py fhatm notes)
    for d in rows:
        for hem in ("n", "s"):
            assert abs(d[f"werr_{hem}"]) < 1e-10, (d["istep"], hem)
            assert abs(d[f"herr_{hem}"]) < 1e-7, (d["istep"], hem)
            assert abs(d[f"serr_{hem}"]) < 1e-10, (d["istep"], hem)

    # NH trajectory vs the reference log at the three checkpoints
    for istep, ref in REF.items():
        if istep > NPT:
            continue
        d = by_step.get(istep)
        assert d is not None, f"no diag row at istep {istep}"
        for k, (lo, hi) in RATIO.items():
            r = d[k] / ref[k]
            assert lo < r < hi, (istep, k, d[k], ref[k], r)
        # speeds/strength within the reference's dynamic range
        assert 0.3 * ref["rms_speed_n"] < d["rms_speed_n"] \
            < 2.0 * ref["rms_speed_n"], (istep, d["rms_speed_n"])
        assert 0.25 * ref["max_strength_n"] < d["max_strength_n"] \
            < 2.0 * ref["max_strength_n"], (istep, d["max_strength_n"])

    # every interval: hemispheric envelopes (round 5: tightened to the
    # measured trajectory +- ~10% — SH ran 1.77-1.79e7 km^2 and
    # 4.47-4.58e13 m^3 over the month)
    for d in rows[2:]:
        assert 1.35e7 < d["area_n"] < 1.75e7, d["istep"]
        assert d["extent_n"] >= d["area_n"]
        assert 1.60e7 < d["area_s"] < 1.95e7, d["istep"]  # IC-dominated
        assert 4.0e13 < d["volume_s"] < 5.1e13, d["istep"]
        assert 0.0 <= d["rms_speed_n"] < 0.5
        assert 0.0 <= d["rms_speed_s"] < 0.5

    # all fields finite at the end
    last = rows[-1]
    for k, v in last.items():
        assert np.isfinite(v), (k, v)
