"""Report Newton iteration counts (thermo while_loop) at an evolved state."""
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
from cice4_tpu.ops import itd as itd_ops
from cice4_tpu.ops.therm_vertical import (frzmlt_bottom_lateral,
                                          thermo_vertical_category)


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
    Tf = freezing_temperature(cfg, f.sss)

    @jax.jit
    def _full(state):
        s, _ = M.ice_step(model, state, grid, f, yday, sec)
        return s

    nspin = int(os.environ.get("SPINUP", "24"))
    for _ in range(nspin):
        state = _full(state)
    jax.block_until_ready(state.aicen)

    sw = M._step_radiation(model, state, grid, f, yday, sec, dt)
    agg = itd_ops.aggregate(state, grid.tmask)
    Tbot, fbot, rside = frzmlt_bottom_lateral(
        model.thermo, dt, agg["aice"], state.frzmlt, state.eicen,
        state.esnon, state.sst, Tf, state.strocnxT, state.strocnyT)

    from cice4_tpu.ops.atmo import atmo_boundary_layer

    @jax.jit
    def run_cat(aicen, vicen, vsnon, tsfcn, eicen, esnon,
                fswsfc, fswint, fswthru, Sswabs, Iswabs):
        bl = atmo_boundary_layer("ice", tsfcn, f.potT, f.uatm, f.vatm,
                                 f.wind, f.zlvl, f.Qa, f.rhoa, True)
        st, fx = thermo_vertical_category(
            model.thermo, dt, aicen, vicen, vsnon, tsfcn, eicen, esnon,
            f.flw, f.potT, f.Qa, f.rhoa, f.fsnow, fbot, Tbot, Tf,
            bl["lhcoef"], bl["shcoef"], fswsfc, fswint, fswthru,
            Sswabs, Iswabs)
        return fx

    for n in range(model.itd.ncat):
        fx = run_cat(state.aicen[n], state.vicen[n], state.vsnon[n],
                     state.tsfcn[n], state.eicen[n], state.esnon[n],
                     sw["fswsfc"][n], sw["fswint"][n], sw["fswthru"][n],
                     sw["Sswabs"][n], sw["Iswabs"][n])
        print(f"cat {n}: niter={int(fx['niter'])}")


if __name__ == "__main__":
    main()
