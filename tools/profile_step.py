"""Per-phase wall-clock profile of one model step on the real device.

Mirrors the reference's timer table (`ice_timers.F90` names): Dynamics,
Advection, Thermo, Shortwave, Ridging, CatConv.  Each phase is jitted
separately and timed with block_until_ready over N repeats.

Usage:  python tools/profile_step.py [gx3|gx1]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/cice4_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from cice4_tpu.config import gx1_config, gx3_config
from cice4_tpu.grid import make_grid
from cice4_tpu.io.forcing_data import AnalyticForcing
from cice4_tpu import model as M
from cice4_tpu.model import Model
from cice4_tpu.state import init_state, freezing_temperature


def timeit(fn, *args, n=20, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dtm = (time.time() - t0) / n * 1e3
    print(f"{label:30s} {dtm:9.3f} ms")
    return dtm


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "gx1"
    cfg = gx1_config() if which == "gx1" else gx3_config()
    grid = make_grid(cfg, dtype=jnp.float32)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float32)
    provider = AnalyticForcing(cfg, grid, jnp.float32)
    f = provider(1.0, 0.0)
    dt = cfg.run.dt
    yday, sec = jnp.float32(80.0), jnp.float32(0.0)
    print(f"config={which} grid={grid.ny}x{grid.nx} "
          f"ndte={cfg.dynamics.ndte} device={jax.devices()[0]}")

    Tf = freezing_temperature(cfg, f.sss)

    # spin up to a representative (steady-state-ish) state first:
    # the data-dependent while_loops (thermo Newton, ridging) are
    # cheapest on the smooth initial profile.
    nspin = int(os.environ.get("SPINUP", "24"))
    if nspin:
        @jax.jit
        def _full(state):
            s, _ = M.ice_step(model, state, grid, f, yday, sec)
            return s
        t0 = time.time()
        for _ in range(nspin):
            state = _full(state)
        jax.block_until_ready(state.aicen)
        print(f"# spinup {nspin} steps: {time.time()-t0:.1f} s")

    # phase jits -----------------------------------------------------------
    @jax.jit
    def ph_radiation(state):
        return M._step_radiation(model, state, grid, f, yday, sec, dt)

    sw = ph_radiation(state)

    @jax.jit
    def ph_therm1(state):
        return M._step_therm1(model, state, grid, f, sw, Tf, yday, dt)

    st1, fluxes, init = ph_therm1(state)

    @jax.jit
    def ph_therm2(state, fluxes):
        return M._step_therm2(model, state, grid, dict(fluxes), init, Tf, dt)

    st2, fluxes2 = ph_therm2(st1, fluxes)

    from cice4_tpu.ops import itd as itd_ops
    from cice4_tpu.ops.evp import evp
    from cice4_tpu.ops import mechred

    @jax.jit
    def ph_evp(state, fluxes):
        agg = itd_ops.aggregate(state, grid.tmask)
        return evp(state, grid, cfg.dynamics, dt,
                   agg["aice"], agg["vice"], agg["vsno"],
                   state.aicen, state.vicen, agg["aice0"],
                   f.uocn, f.vocn, f.ss_tltx, f.ss_tlty,
                   fluxes["strairxT"], fluxes["strairyT"])

    st3, dyn_diag = ph_evp(st2, fluxes2)

    @jax.jit
    def ph_remap(state):
        from cice4_tpu.ops.remap import transport_remap
        return transport_remap(state, grid, dt,
                               cfg.transport.integral_order,
                               cfg.transport.l_dp_midpt)

    st4, aice0_adv = ph_remap(st3)

    @jax.jit
    def ph_ridge(state):
        st, rdg = mechred.ridge_ice(state, model.itd, cfg.dynamics, dt,
                                    dyn_diag["rdg_conv"],
                                    dyn_diag["rdg_shear"], grid.tmask,
                                    aice0=aice0_adv)
        return st

    st5 = ph_ridge(st4)

    @jax.jit
    def ph_cleanup(state):
        return itd_ops.cleanup_itd(state, model.itd, grid.tmask, dt)

    @jax.jit
    def ph_coupling(state, fluxes):
        return M._coupling_prep(model, state, grid, f, sw,
                                dict(fluxes), Tf, dt)

    @jax.jit
    def full(state):
        return M.ice_step(model, state, grid, f, yday, sec)

    total = 0.0
    total += timeit(ph_radiation, state, label="Shortwave (radiation)")
    total += timeit(ph_therm1, state, label="Thermo (therm1 vertical)")
    total += timeit(ph_therm2, st1, fluxes, label="CatConv (therm2 itd)")
    total += timeit(ph_evp, st2, fluxes2, label="Dynamics (EVP)")
    total += timeit(ph_remap, st3, label="Advection (remap)")
    total += timeit(ph_ridge, st4, label="Ridging")
    total += timeit(ph_cleanup, st5, label="cleanup_itd")
    total += timeit(ph_coupling, st5, fluxes2, label="Coupling prep")
    print(f"{'sum of phases':30s} {total:9.3f} ms")
    timeit(full, state, label="FULL STEP (one jit)")


if __name__ == "__main__":
    main()
