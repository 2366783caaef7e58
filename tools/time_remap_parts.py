"""Sub-stage timing of the remap pipeline on the real device."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/cice4_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from cice4_tpu import constants as cn
from cice4_tpu.config import gx1_config
from cice4_tpu.grid import make_grid
from cice4_tpu.io.forcing_data import AnalyticForcing
from cice4_tpu.model import Model
from cice4_tpu.ops import remap as R
from cice4_tpu.state import init_state


def timeit(fn, *args, n=30, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dtm = (time.time() - t0) / n * 1e3
    print(f"{label:34s} {dtm:9.3f} ms")
    return out


def main():
    cfg = gx1_config()
    grid = make_grid(cfg, dtype=jnp.float32)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float32)
    dt = cfg.run.dt
    bc = grid.bc
    print(f"grid={grid.ny}x{grid.nx} device={jax.devices()[0]}")

    ncat = state.ncat
    nilyr = state.eicen.shape[1]
    nslyr = state.esnon.shape[1]
    tracer_names = list(state.trcrn.keys())
    meta = R._tracer_meta(tracer_names, nilyr, nslyr)
    print(f"T = {len(meta)} tracers, ncat = {ncat}")

    # representative velocity field
    ny, nx = grid.ny, grid.nx
    x = jnp.arange(nx)[None, :] / nx
    y = jnp.arange(ny)[:, None] / ny
    state = state.replace(
        uvel=0.2 * jnp.sin(6.28 * x) * jnp.cos(3.14 * y),
        vvel=0.1 * jnp.cos(6.28 * x) * jnp.sin(3.14 * y))

    dx = -dt * state.uvel / grid.dxu
    dy = -dt * state.vvel / grid.dyu

    sh = R.JnpShift(bc)
    afac = grid.dxu * grid.dyu

    @jax.jit
    def geom(dx, dy):
        return (R._geom_moments("east", afac, dx, dy, 2, sh),
                R._geom_moments("north", afac, dx, dy, 2, sh))

    G_e, G_n = timeit(geom, dx, dy, label="geometry+moments (both edges)")

    # build tracer stack as transport_remap does
    has = state.aicen > cn.puny
    a_s = jnp.maximum(state.aicen, cn.puny)
    v_s = jnp.maximum(state.vicen, cn.puny)
    vs_s = jnp.maximum(state.vsnon, cn.puny)
    hi = jnp.where(has, state.vicen / a_s, 0.0)
    hs = jnp.where(has, state.vsnon / a_s, 0.0)
    rows = [hi, hs, jnp.where(has, state.tsfcn, 0.0)]
    for name in tracer_names:
        rows.append(jnp.where(has, state.trcrn[name], 0.0))
    for k in range(nilyr):
        rows.append(jnp.where(has, state.eicen[:, k] / v_s, 0.0))
    for k in range(nslyr):
        qs = state.esnon[:, k] / vs_s + cn.rhos * cn.Lfresh
        rows.append(jnp.where(has & (hs > cn.puny), qs, 0.0))
    tm = jnp.stack(rows, axis=1)

    @jax.jit
    def construct(aicen, tm):
        return jax.vmap(lambda mmn, tmn: R._construct(
            mmn, grid.hm, tmn, meta, sh))(aicen, tm)

    C = timeit(construct, state.aicen, tm, label="construct (5 cat)")

    @jax.jit
    def fluxdiv(C):
        return jax.vmap(lambda mc, mx, my, tc, tx, ty: R._flux_divergence(
            G_e, G_n, mc, mx, my, tc, tx, ty, meta, sh))(*C)

    timeit(fluxdiv, C, label="flux divergence (5 cat)")

    @jax.jit
    def full(state):
        return R.transport_remap(state, grid, dt, use_pallas=False)

    timeit(full, state, label="FULL transport_remap (jnp)")

    @jax.jit
    def fullp(state):
        return R.transport_remap(state, grid, dt, use_pallas=True)

    if jax.default_backend() == "tpu":
        timeit(fullp, state, label="FULL transport_remap (pallas)")


if __name__ == "__main__":
    main()
