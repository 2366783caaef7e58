"""Reference-parity run: the canonical 744-step gx3 January month.

Mirrors the reference's shipped test problem (`comp_ice:37-41`, log
`ice.log.Linux.LANL.coyote`): gx3 100x116 displaced-pole POP grid,
dt=3600 s, ndte=120, 744 hourly steps (January), remap advection,
ridging, ocean mixed layer, diagnostics every 24 steps.

Differences vs the reference run (documented in PARITY.md): the
reference starts from a January restart dump (`iced_gx3_v4.0_
kcatbound0`) and reads 1997 NCAR-bulk forcing — neither file ships
with the source, so this run starts from the default initial state
(`ice_init.F90 set_state_var:921-1195`) under the idealized seasonal
forcing and compares hemispheric *magnitudes* (sanity bands) plus
budget-closure errors, which must hold regardless of forcing.

Usage: python tools/run_gx3_month.py [npt] [--f32] [--json out.json]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/cice4_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp


def run_month(npt=744, dtype=None, log=print, diagfreq=24):
    """Run the gx3 month; returns the list of diagnostics dicts
    (one per diag interval, each with 'istep')."""
    if dtype is None:
        if jax.default_backend() == "cpu":
            jax.config.update("jax_enable_x64", True)
            dtype = jnp.float64
        else:
            dtype = jnp.float32
    from cice4_tpu.config import gx3_config
    from cice4_tpu.driver import IceModelRun

    cfg = gx3_config().with_values(**{
        "dynamics.ndte": 120,
        "run.diagfreq": diagfreq,
        "run.npt": npt,
        "run.histfreq": ("x",) * 5,
        "run.dumpfreq": "x",
        # January start as the reference month run
        "run.year_init": 1997,
    })
    rows = []

    def capture(msg):
        log(msg)

    run = IceModelRun(cfg, dtype=dtype, log=capture)
    run.initialize()

    # re-wire diag capture: step manually to collect structured rows
    cal = run.calendar
    for _ in range(npt):
        diag_step = (cal.istep + 1) % diagfreq == 0
        f = run.forcing_provider(cal.yday, cal.sec, cal=cal,
                                 state=run.state)
        if diag_step:
            init_diag = run._initdiag(run.state)
        run.state, fluxes = run._step(run.state, f,
                                      jnp.asarray(cal.yday, dtype),
                                      jnp.asarray(cal.sec, dtype))
        if run._pending_guards:
            from cice4_tpu.guards import raise_on_violation
            raise_on_violation(run._pending_guards)
        run._pending_guards = fluxes.pop("_guards", None)
        cal.advance()
        if diag_step:
            from cice4_tpu.diagnostics import format_diags
            d = run._diag(run.state, fluxes, f, init_diag)
            d = {k: float(v) for k, v in d.items()}
            d["istep"] = cal.istep
            rows.append(d)
            log(format_diags(cal.istep, d))
    return rows


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    npt = int(args[0]) if args else 744
    dtype = jnp.float32 if "--f32" in sys.argv else None
    import time
    t0 = time.time()
    rows = run_month(npt=npt, dtype=dtype)
    wall = time.time() - t0
    print(f"# {npt} gx3 steps in {wall:.1f} s", file=sys.stderr)
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        with open(out, "w") as fh:
            json.dump(rows, fh)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
