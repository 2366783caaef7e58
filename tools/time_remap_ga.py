"""Sub-stage timing of the GA-factored remap path on the real device.

Stages (matching `transport_remap`'s default path):
  A. geometry -> GA accumulators + GSH back-shifts (category-indep.)
  B. streamed van-Leer reconstruction (6 "categories": aice0 + 5)
  C. GA contraction `_flux_divergence_ga` (6 categories)
  D. full transport_remap for reference
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

from cice4_tpu import constants as cn
from cice4_tpu.config import gx1_config, gx3_config
from cice4_tpu.grid import make_grid
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
    print(f"{label:40s} {dtm:9.3f} ms")
    return out


def main():
    which = os.environ.get("BENCH_CONFIG", "gx1")
    cfg = gx1_config() if which == "gx1" else gx3_config()
    grid = make_grid(cfg, dtype=jnp.float32)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float32)
    dt = cfg.run.dt
    bc = grid.bc
    print(f"grid={grid.ny}x{grid.nx} device={jax.devices()[0]}")

    nilyr = state.eicen.shape[1]
    nslyr = state.esnon.shape[1]
    tracer_names = list(state.trcrn.keys())
    meta = R._tracer_meta(tracer_names, nilyr, nslyr)
    print(f"T = {len(meta)} tracers, ncat = {state.ncat}")

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
    def ga(dx, dy):
        GA = R._geom_accumulators(afac, dx, dy, 2, sh)
        zero = jnp.zeros_like(afac)
        return {off: [R._shift_by_jnp(sh, GA[off][k] + zero,
                                      (-off[0], -off[1]))
                      for k in range(10)]
                for off in R.ALL_OFFSETS}

    GSH = timeit(ga, dx, dy, label="A. geometry -> GA + GSH")

    # tracer stack as transport_remap builds it
    has = state.aicen > cn.puny
    a_s = jnp.maximum(state.aicen, cn.puny)
    v_s = jnp.maximum(state.vicen, cn.puny)
    vs_s = jnp.maximum(state.vsnon, cn.puny)
    hi = jnp.where(has, state.vicen / a_s, 0.0)
    hs = jnp.where(has, state.vsnon / a_s, 0.0)
    src = {"hi": hi, "hs": hs, "Tsfc": jnp.where(has, state.tsfcn, 0.0)}
    for name in tracer_names:
        src[name] = jnp.where(has, state.trcrn[name], 0.0)
    for k in range(nilyr):
        src[f"qi{k}"] = jnp.where(has, state.eicen[:, k] / v_s, 0.0)
    for k in range(nslyr):
        qs = state.esnon[:, k] / vs_s + cn.rhos * cn.Lfresh
        src[f"qs{k}"] = jnp.where(has & (hs > cn.puny), qs, 0.0)
    tm = jnp.stack([src[name] for (name, _t, _p) in meta], axis=1)

    from cice4_tpu.ops.remap_pallas import _construct_vmem

    @jax.jit
    def construct(aicen, tm):
        return jax.vmap(lambda mmn, tmn: _construct_vmem(
            mmn, grid.hm, tmn, list(meta), sh))(aicen, tm)

    C = timeit(construct, state.aicen, tm, label="B. reconstruction (5 cat)")

    @jax.jit
    def contract(GSH, C):
        return jax.vmap(
            lambda mc, mx, my, tc, tx, ty: R._flux_divergence_ga(
                GSH, mc, mx, my, tc, tx, ty, meta, sh))(*C)

    timeit(contract, GSH, C, label="C. GA contraction (5 cat)")

    @jax.jit
    def construct_contract(GSH, aicen, tm):
        def one(mmn, tmn):
            mc, mx, my, tc, tx, ty = _construct_vmem(
                mmn, grid.hm, tmn, list(meta), sh)
            return R._flux_divergence_ga(GSH, mc, mx, my, tc, tx, ty,
                                         meta, sh)
        return jax.vmap(one)(aicen, tm)

    timeit(construct_contract, GSH, state.aicen, tm,
           label="B+C fused (5 cat)")

    @jax.jit
    def full(state):
        return R.transport_remap(state, grid, dt, use_pallas=False)

    timeit(full, state, label="D. FULL transport_remap (jnp GA)")


if __name__ == "__main__":
    main()
