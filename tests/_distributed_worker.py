"""Worker for the 2-process localhost test (`test_multiprocess.py`).

Each process owns 4 virtual CPU devices of an 8-device global mesh.
Exercises, across REAL process boundaries for the first time:
  * `init_distributed` (the `init_communicate` analogue,
    ``mpi/ice_communicate.F90:74-141``)
  * a sharded model step on the global mesh (GSPMD collectives over
    the process boundary), checksummed against the single-process run
  * `dump_restart_sharded` / `load_restart_sharded` with
    process_count()==2 — the per-process manifest path.

Launched with env: CICE4_DISTRIBUTED=1 CICE4_COORDINATOR=host:port
CICE4_NUM_PROCESSES=2 CICE4_PROCESS_ID=<i>
XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from cice4_tpu.parallel.mesh import init_distributed

assert init_distributed(), "init_distributed did not engage"
assert jax.process_count() == 2, jax.process_count()

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cice4_tpu.config import (Config, DomainConfig, DynamicsConfig,
                              GridConfig, TransportConfig)
from cice4_tpu.forcing import default_forcing
from cice4_tpu.grid import make_grid
from cice4_tpu.model import Model, ice_step
from cice4_tpu.parallel.mesh import make_mesh, spatial_spec
from cice4_tpu.state import init_state

out_dir = sys.argv[1]
proc = jax.process_index()

cfg = Config(
    domain=DomainConfig(nx_global=32, ny_global=16,
                        ew_boundary_type="cyclic",
                        ns_boundary_type="open"),
    grid=GridConfig(grid_type="rectangular", lat_origin=66.0),
    dynamics=DynamicsConfig(ndte=8),
    transport=TransportConfig(advection="remap"),
)
grid = make_grid(cfg, dtype=jnp.float64)
model = Model.create(cfg)
state = init_state(cfg, grid, model.itd, dtype=jnp.float64)
f = default_forcing(grid.ny, grid.nx, jnp.float64)
x = jnp.arange(grid.nx, dtype=jnp.float64)[None, :]
y = jnp.arange(grid.ny, dtype=jnp.float64)[:, None]
uatm = 4.0 + 3.0 * jnp.sin(2 * jnp.pi * x / grid.nx) + 0.0 * y
vatm = 1.0 + 2.0 * jnp.cos(2 * jnp.pi * y / grid.ny) + 0.0 * x
f = f.replace(uatm=uatm, vatm=vatm, wind=jnp.sqrt(uatm**2 + vatm**2))

mesh = make_mesh(jax.device_count())


def to_global(tree):
    """Host-local full copies -> global sharded arrays (every process
    holds the same full-domain values, deterministically computed)."""
    def place(leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim < 2:
            return leaf
        sharding = NamedSharding(mesh, spatial_spec(leaf.ndim))
        host = np.asarray(leaf)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx])
    return jax.tree_util.tree_map(place, tree)


gstate = to_global(state)
ggrid = to_global(grid)
gf = to_global(f)


@jax.jit
def step(s, g, fo):
    return ice_step(model, s, g, fo, 80.0, 0.0)


out, _flux = step(gstate, ggrid, gf)


def checksums(s):
    return dict(
        aice=jnp.sum(s.aicen), vice=jnp.sum(s.vicen),
        u2=jnp.sum(s.uvel**2), e=jnp.sum(s.eicen))


# reductions of a multi-process array must come back REPLICATED to be
# fetchable on every process
csums_rep = jax.jit(
    checksums,
    out_shardings=NamedSharding(mesh, P()))
cs = {k: float(v) for k, v in csums_rep(out).items()}
print(f"CHECKSUM {proc} " + " ".join(f"{k}={v:.17e}"
                                     for k, v in sorted(cs.items())),
      flush=True)

# ---- sharded restart round trip across the 2 processes ----------------
from jax.experimental import multihost_utils

from cice4_tpu.io.restart import (dump_restart_sharded,
                                  load_restart_sharded)

dump_dir = os.path.join(out_dir, "shard_dump")
dump_restart_sharded(out, dump_dir, istep=1, time=3600.0)
multihost_utils.sync_global_devices("dump_done")

if proc == 0:
    loaded, manifest = load_restart_sharded(dump_dir, state)
    assert manifest["nprocs"] == 2, manifest["nprocs"]
    # value check: the checksums of the reassembled full state must
    # match the distributed run's (every shard was placed correctly)
    cs2 = {k: float(v) for k, v in checksums(loaded).items()}
    for k in cs:
        assert abs(cs2[k] - cs[k]) <= 1e-9 * max(abs(cs[k]), 1.0), \
            (k, cs[k], cs2[k])
    print("RESTART_OK", flush=True)

multihost_utils.sync_global_devices("load_done")
print(f"DONE {proc}", flush=True)
