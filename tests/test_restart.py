"""Exact-restart round trip (SURVEY §4.4: the de-facto regression test)."""

import numpy as np
import jax.numpy as jnp

from cice4_tpu.config import gx3_config
from cice4_tpu.grid import make_rect_grid
from cice4_tpu.io.restart import dump_restart, load_restart, read_pointer
from cice4_tpu.parallel.halo import BoundaryConditions
from cice4_tpu.state import init_state, make_itd_params


def test_restart_roundtrip_bitexact(tmp_path):
    cfg = gx3_config()
    bc = BoundaryConditions(ew="cyclic", ns="open")
    grid = make_rect_grid(16, 12, bc, dtype=jnp.float64)
    itd = make_itd_params(cfg)
    s = init_state(cfg, grid, itd, dtype=jnp.float64)
    # put nonzero values into the dynamics fields too
    s = s.replace(uvel=s.uvel + 0.1, vvel=s.vvel - 0.05,
                  stressp=s.stressp + 123.0,
                  stress12=s.stress12 - 7.0,
                  iceumask=s.iceumask | (grid.umask & True),
                  scale_factor=s.scale_factor + 0.5)

    path = str(tmp_path / "restart" / "iced.npz")
    ptr = str(tmp_path / "ice.restart_file")
    dump_restart(s, path, istep=42, time=42 * 3600.0, pointer_file=ptr)

    assert read_pointer(ptr).endswith("iced.npz")
    template = init_state(cfg, grid, itd, dtype=jnp.float64)
    s2, header = load_restart(read_pointer(ptr), template)
    assert header["istep"] == 42
    assert header["time"] == 42 * 3600.0

    import jax
    leaves1, tree1 = jax.tree_util.tree_flatten(s)
    leaves2, tree2 = jax.tree_util.tree_flatten(s2)
    assert tree1 == tree2
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_restart_roundtrip(tmp_path):
    """Parallel-I/O dump: per-process shard files + manifest
    reassemble bit-exactly (the multi-host analogue of the reference's
    gather-to-master records — here there is no gather at all)."""
    import jax

    from cice4_tpu.config import (Config, DomainConfig,
                                  DynamicsConfig, GridConfig)
    from cice4_tpu.grid import make_grid
    from cice4_tpu.io.restart import (dump_restart_sharded,
                                      load_restart_sharded)
    from cice4_tpu.model import Model
    from cice4_tpu.parallel.mesh import make_mesh, shard_pytree
    from cice4_tpu.state import init_state

    cfg = Config(
        domain=DomainConfig(nx_global=32, ny_global=16),
        grid=GridConfig(grid_type="rectangular", lat_origin=66.0),
        dynamics=DynamicsConfig(ndte=5),
    )
    grid = make_grid(cfg, dtype=jnp.float64)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float64)
    mesh = make_mesh(8)
    state_s = shard_pytree(state, mesh)

    d = str(tmp_path / "ckpt")
    ptr = str(tmp_path / "ice.restart_file")
    dump_restart_sharded(state_s, d, istep=7, time=7 * 3600.0,
                         pointer_file=ptr)
    import os
    assert os.path.exists(os.path.join(d, "manifest.json"))
    assert open(ptr).read().strip() == d

    loaded, manifest = load_restart_sharded(d, state)
    assert manifest["istep"] == 7
    import dataclasses as dc
    for f in dc.fields(state):
        a = getattr(state, f.name)
        b = getattr(loaded, f.name)
        if isinstance(a, dict):
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]),
                                              np.asarray(b[k]), err_msg=k)
        elif a is not None:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f.name)
