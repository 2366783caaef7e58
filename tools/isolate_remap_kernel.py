"""Run the three remap Pallas kernels individually on the real TPU at
gx3-padded shape to isolate a runtime fault."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cice4_tpu.ops import remap_pallas as rp
from cice4_tpu.ops.remap import _tracer_meta

ny, nx = 116, 128
ncat1, T = 6, 11
dtype = jnp.float32
ew, ns = "cyclic", "open"
order = 2
meta = tuple(_tracer_meta(["iage"], 4, 1))
T = len(meta)

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
dx = 0.01 * jax.random.normal(ks[0], (ny, nx), dtype)
dy = 0.01 * jax.random.normal(ks[1], (ny, nx), dtype)
afac = 1.0 + 0.1 * jax.random.uniform(ks[2], (ny, nx), dtype)
hm = (jax.random.uniform(ks[3], (ny, nx)) > 0.3).astype(dtype)
mm_ext = jax.random.uniform(ks[4], (ncat1, ny, nx), dtype)
tm_ext = jax.random.uniform(ks[5], (ncat1, T, ny, nx), dtype)

glob2 = pl.BlockSpec((ny, nx), lambda i: (0, 0), memory_space=pltpu.VMEM)
cat3 = pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM)
cat4 = pl.BlockSpec((1, T, ny, nx), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM)
rec4 = pl.BlockSpec((1, 3 + 3 * T, ny, nx), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM)
params = pltpu.CompilerParams(vmem_limit_bytes=rp._VMEM)

which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("k0", "all"):
    ga = pl.pallas_call(
        partial(rp._ga_kernel, order, ew, ns),
        out_shape=jax.ShapeDtypeStruct((9, 10, ny, nx), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=params,
    )(dx, dy, afac)
    print("K0 ok:", np.asarray(ga).sum())

if which in ("k1", "all"):
    rec = pl.pallas_call(
        partial(rp._construct_kernel, meta, ew, ns),
        grid=(ncat1,),
        in_specs=[glob2, cat3, cat4],
        out_specs=rec4,
        out_shape=jax.ShapeDtypeStruct((ncat1, 3 + 3 * T, ny, nx), dtype),
        compiler_params=params,
    )(hm, mm_ext, tm_ext)
    print("K1 ok:", np.asarray(rec).sum())

if which in ("k2", "all"):
    ga = jax.random.normal(ks[6], (9, 10, ny, nx), dtype)
    rec = jax.random.uniform(ks[7], (ncat1, 3 + 3 * T, ny, nx), dtype)
    ga_o = pl.BlockSpec((1, 10, ny, nx), lambda i, o: (o, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    rec4_o = pl.BlockSpec((1, 3 + 3 * T, ny, nx),
                          lambda i, o: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    cat3_o = pl.BlockSpec((1, ny, nx), lambda i, o: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    cat4_o = pl.BlockSpec((1, T, ny, nx), lambda i, o: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(rp._contract_kernel, meta, ew, ns),
        grid=(ncat1, 9),
        in_specs=[ga_o, rec4_o],
        out_specs=(cat3_o, cat4_o),
        out_shape=(jax.ShapeDtypeStruct((ncat1, ny, nx), dtype),
                   jax.ShapeDtypeStruct((ncat1, T, ny, nx), dtype)),
        compiler_params=params,
    )(ga, rec)
    print("K2 ok:", np.asarray(out[0]).sum(), np.asarray(out[1]).sum())
