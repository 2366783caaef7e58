"""Compile + correctness check of the fused Pallas remap kernel on the
real TPU, at the shipped global-grid shapes (the round-3 kernel failed
Mosaic compile at exactly these: gx3 nx=100, gx1 nx=320 — neither
lane-aligned).

Runs transport_remap twice (jnp path vs Pallas path) on an evolved
state and reports max abs differences + timings.

Usage:  python tools/check_remap_tpu.py [gx3|gx1]
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
import numpy as np

from cice4_tpu.config import gx1_config, gx3_config
from cice4_tpu.grid import make_grid
from cice4_tpu.model import Model
from cice4_tpu.ops.remap import transport_remap
from cice4_tpu.state import init_state


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "gx3"
    cfg = {"gx3": gx3_config, "gx1": gx1_config}[name]()
    dtype = jnp.float32
    grid = make_grid(cfg, dtype=dtype)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=dtype)
    # idealized velocity field so real transport happens
    ny, nx = grid.ny, grid.nx
    x = jnp.arange(nx, dtype=dtype)[None, :] / nx
    y = jnp.arange(ny, dtype=dtype)[:, None] / ny
    state = state.replace(
        uvel=0.3 * jnp.sin(6.28 * x) * jnp.cos(3.14 * y) * grid.umask,
        vvel=0.2 * jnp.cos(6.28 * x) * jnp.sin(3.14 * y) * grid.umask)
    dt = cfg.run.dt

    def run(use_pallas):
        fn = jax.jit(lambda s: transport_remap(s, grid, dt,
                                               use_pallas=use_pallas))
        t0 = time.time()
        out = jax.block_until_ready(fn(state))
        compile_t = time.time() - t0
        t0 = time.time()
        n = 10
        for _ in range(n):
            out = jax.block_until_ready(fn(state))
        return out, compile_t, (time.time() - t0) / n

    (s_ref, a0_ref), ct_ref, t_ref = run(False)
    (s_pal, a0_pal), ct_pal, t_pal = run(True)

    worst = 0.0
    for nm in ("aicen", "vicen", "vsnon", "eicen", "esnon"):
        d = float(np.abs(np.asarray(getattr(s_pal, nm))
                         - np.asarray(getattr(s_ref, nm))).max())
        scale = float(np.abs(np.asarray(getattr(s_ref, nm))).max()) or 1.0
        print(f"{nm:6s} max abs diff {d:.3e}  (rel {d/scale:.3e})")
        worst = max(worst, d / scale)
    d0 = float(np.abs(np.asarray(a0_pal) - np.asarray(a0_ref)).max())
    print(f"aice0  max abs diff {d0:.3e}")
    print(f"jnp    compile {ct_ref:6.1f}s  step {t_ref*1e3:7.2f} ms")
    print(f"pallas compile {ct_pal:6.1f}s  step {t_pal*1e3:7.2f} ms")
    ok = worst < 2e-4 and d0 < 1e-4
    print("OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
