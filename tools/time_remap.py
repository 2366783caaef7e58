"""Quick wall-clock of the remap phase alone on the real device."""

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
from cice4_tpu.ops.remap import transport_remap
from cice4_tpu.state import init_state


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "gx1"
    cfg = gx1_config() if which == "gx1" else gx3_config()
    grid = make_grid(cfg, dtype=jnp.float32)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float32)
    provider = AnalyticForcing(cfg, grid, jnp.float32)
    f = provider(80.0, 0.0)
    yday, sec = jnp.float32(80.0), jnp.float32(0.0)
    print(f"config={which} device={jax.devices()[0]}")

    nspin = int(os.environ.get("SPINUP", "8"))

    @jax.jit
    def _full(state):
        s, _ = M.ice_step(model, state, grid, f, yday, sec)
        return s
    t0 = time.time()
    for _ in range(nspin):
        state = _full(state)
    jax.block_until_ready(state.aicen)
    print(f"# spinup {nspin} steps: {time.time()-t0:.1f} s")

    @jax.jit
    def ph_remap(state):
        return transport_remap(state, grid, cfg.run.dt,
                               cfg.transport.integral_order,
                               cfg.transport.l_dp_midpt)

    t0 = time.time()
    out = ph_remap(state)
    jax.block_until_ready(out[0].aicen)
    print(f"# remap compile+run: {time.time()-t0:.1f} s")
    n = 30
    t0 = time.time()
    for _ in range(n):
        out = ph_remap(state)
    jax.block_until_ready(out[0].aicen)
    print(f"remap: {(time.time()-t0)/n*1e3:.3f} ms")

    # full step timing too
    t0 = time.time()
    for _ in range(n):
        state = _full(state)
    jax.block_until_ready(state.aicen)
    print(f"full step: {(time.time()-t0)/n*1e3:.3f} ms")


if __name__ == "__main__":
    main()
