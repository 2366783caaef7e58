"""In-situ phase attribution by ablation: time the FULL jitted step
with each phase stubbed out, at an evolved state.  More trustworthy
than standalone phase timings because XLA overlaps phases inside the
single step program.

Usage: python tools/ablate_step.py [gx3|gx1]
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
from cice4_tpu.state import init_state


def bench_step(cfg, grid, state, f, yday, sec, label, n=30):
    model = Model.create(cfg)

    @jax.jit
    def step(s):
        s2, _ = M.ice_step(model, s, grid, f, yday, sec)
        return s2

    s = step(state)
    jax.block_until_ready(s.aicen)
    t0 = time.time()
    for _ in range(n):
        s = step(state)
    jax.block_until_ready(s.aicen)
    dtm = (time.time() - t0) / n * 1e3
    print(f"{label:42s} {dtm:8.3f} ms")
    return dtm


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

    @jax.jit
    def step(s):
        s2, _ = M.ice_step(model, s, grid, f, yday, sec)
        return s2

    nspin = int(os.environ.get("SPINUP", "24"))
    for _ in range(nspin):
        state = step(state)
    jax.block_until_ready(state.aicen)

    base = bench_step(cfg, grid, state, f, yday, sec, "FULL baseline")
    for label, patch in [
        ("no EVP (kdyn=0)", dict(dynamics=dataclasses.replace(
            cfg.dynamics, kdyn=0))),
        ("EVP jnp path", dict(dynamics=dataclasses.replace(
            cfg.dynamics, use_pallas=False))),
        ("upwind advection", dict(transport=dataclasses.replace(
            cfg.transport, advection="upwind"))),
        ("no advection", dict(transport=dataclasses.replace(
            cfg.transport, advection="none"))),
        ("ccsm3 shortwave", dict(radiation=dataclasses.replace(
            cfg.radiation, shortwave="default"))),
    ]:
        try:
            cfg2 = dataclasses.replace(cfg, **patch)
            d = bench_step(cfg2, grid, state, f, yday, sec, label)
            print(f"{'':42s} -> delta {base - d:+8.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{label}: failed: {e}")


if __name__ == "__main__":
    main()
