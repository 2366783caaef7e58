"""Compare the fused Pallas EVP subcycle kernel against the jnp path.

Runs one full EVP call on an evolved state with both implementations on
the real device and reports max abs differences plus timings.

Usage:  python tools/check_pallas.py [gx3|gx1]
"""

import dataclasses
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
from cice4_tpu.ops import itd as itd_ops
from cice4_tpu.ops.evp import evp
from cice4_tpu.state import init_state, freezing_temperature


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "gx3"
    cfg = gx1_config() if which == "gx1" else gx3_config()
    grid = make_grid(cfg, dtype=jnp.float32)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float32)
    provider = AnalyticForcing(cfg, grid, jnp.float32)
    f = provider(1.0, 0.0)
    dt = cfg.run.dt
    yday, sec = jnp.float32(80.0), jnp.float32(0.0)
    print(f"config={which} grid={grid.ny}x{grid.nx} ndte={cfg.dynamics.ndte} "
          f"bc=({grid.bc.ew},{grid.bc.ns}) device={jax.devices()[0]}")

    nspin = int(os.environ.get("SPINUP", "8"))
    dyn_jnp = dataclasses.replace(cfg.dynamics, use_pallas=False)

    @jax.jit
    def _full(state):
        s, _ = M.ice_step(model, state, grid, f, yday, sec)
        return s

    for _ in range(nspin):
        state = _full(state)
    jax.block_until_ready(state.aicen)

    def make_evp(dyn):
        @jax.jit
        def run(state, strairxT, strairyT):
            agg = itd_ops.aggregate(state, grid.tmask)
            return evp(state, grid, dyn, dt,
                       agg["aice"], agg["vice"], agg["vsno"],
                       state.aicen, state.vicen, agg["aice0"],
                       f.uocn, f.vocn, f.ss_tltx, f.ss_tlty,
                       strairxT, strairyT)
        return run

    strairxT = 0.1 * jnp.ones((grid.ny, grid.nx), jnp.float32)
    strairyT = -0.05 * jnp.ones((grid.ny, grid.nx), jnp.float32)

    run_jnp = make_evp(dyn_jnp)
    run_pal = make_evp(cfg.dynamics)

    sj, dj = run_jnp(state, strairxT, strairyT)
    jax.block_until_ready(sj.uvel)
    sp_, dp_ = run_pal(state, strairxT, strairyT)
    jax.block_until_ready(sp_.uvel)

    for name in ("uvel", "vvel", "stressp", "stressm", "stress12",
                 "strocnxT", "strocnyT"):
        a, b = getattr(sj, name), getattr(sp_, name)
        scale = jnp.max(jnp.abs(a)) + 1e-30
        print(f"{name:10s} maxabs={float(jnp.max(jnp.abs(a)))  :12.5e} "
              f"maxdiff={float(jnp.max(jnp.abs(a - b))):12.5e} "
              f"rel={float(jnp.max(jnp.abs(a - b)) / scale):9.2e}")
    for name in ("divu", "shear", "rdg_conv", "rdg_shear", "prs_sig"):
        a, b = dj[name], dp_[name]
        scale = jnp.max(jnp.abs(a)) + 1e-30
        print(f"{name:10s} maxabs={float(jnp.max(jnp.abs(a))):12.5e} "
              f"maxdiff={float(jnp.max(jnp.abs(a - b))):12.5e} "
              f"rel={float(jnp.max(jnp.abs(a - b)) / scale):9.2e}")

    for label, fn in (("jnp", run_jnp), ("pallas", run_pal)):
        s, d = fn(state, strairxT, strairyT)
        jax.block_until_ready(s.uvel)
        t0 = time.time()
        n = 20
        for _ in range(n):
            s, d = fn(state, strairxT, strairyT)
        jax.block_until_ready(s.uvel)
        print(f"EVP {label:7s} {(time.time() - t0) / n * 1e3:9.3f} ms")


if __name__ == "__main__":
    main()
