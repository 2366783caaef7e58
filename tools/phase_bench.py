"""Phase cost breakdown by config differencing on the real device.

Times the full gx1 step under config variants that disable one phase
at a time; the difference to the base step isolates that phase's cost
(the cheap alternative to per-phase jits, which take minutes to
compile).  Feeds PERF.md.
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

from cice4_tpu.config import gx1_config
from cice4_tpu.grid import make_grid
from cice4_tpu.io.forcing_data import AnalyticForcing
from cice4_tpu.model import Model, ice_step
from cice4_tpu.state import init_state


def time_cfg(label, n=30, **overrides):
    cfg = gx1_config()
    if overrides:
        cfg = cfg.with_values(**overrides)
    grid = make_grid(cfg, dtype=jnp.float32)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float32)
    provider = AnalyticForcing(cfg, grid, jnp.float32)
    forcing = provider(1.0, 0.0)

    @jax.jit
    def step(state, forcing, yday, sec):
        return ice_step(model, state, grid, forcing, yday, sec)

    t0 = time.time()
    s, _ = step(state, forcing, jnp.float32(1.0), jnp.float32(0.0))
    jax.block_until_ready(s.aicen)
    compile_s = time.time() - t0
    t0 = time.time()
    for k in range(n):
        s, _ = step(s, forcing, jnp.float32(1.0 + k / 24.0),
                    jnp.float32(0.0))
    jax.block_until_ready(s.aicen)
    ms = (time.time() - t0) / n * 1e3
    print(f"{label:44s} {ms:8.3f} ms/step   (compile {compile_s:.0f} s)",
          flush=True)
    return ms


def main():
    base = time_cfg("base (EVP pallas + remap + full column)")
    no_adv = time_cfg("advection=none", **{"transport.advection": "none"})
    no_dyn = time_cfg("kdyn=0 + advection=none",
                      **{"dynamics.kdyn": 0, "transport.advection": "none"})
    upwind = time_cfg("advection=upwind", **{"transport.advection": "upwind"})
    ndte10 = time_cfg("ndte=10", **{"dynamics.ndte": 10})
    no_guards = time_cfg("guards off", **{"run.guards": False})
    print()
    print(f"remap cost        = {base - no_adv:7.3f} ms")
    print(f"EVP cost          = {no_adv - no_dyn:7.3f} ms")
    print(f"EVP subcycle part = {(base - ndte10) * 120 / 110:7.3f} ms")
    print(f"upwind cost       = {upwind - no_adv:7.3f} ms")
    print(f"guard cost        = {base - no_guards:7.3f} ms")
    print(f"column+coupling   = {no_dyn:7.3f} ms")


if __name__ == "__main__":
    main()
