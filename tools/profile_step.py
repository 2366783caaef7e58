"""Per-op device profile of the full gx1 step (TPU).

Captures a jax.profiler trace of N steps and prints the top fusions /
ops by total device self-time, using the tensorboard profiler plugin's
xplane parser.  Feeds the column-fusion work in PERF.md.
"""

import glob
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


def main():
    cfg = gx1_config()
    grid = make_grid(cfg, dtype=jnp.float32)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float32)
    forcing = AnalyticForcing(cfg, grid, jnp.float32)(1.0, 0.0)

    @jax.jit
    def step(state, forcing, yday, sec):
        return ice_step(model, state, grid, forcing, yday, sec)

    s, _ = step(state, forcing, jnp.float32(1.0), jnp.float32(0.0))
    jax.block_until_ready(s.aicen)

    logdir = "/tmp/cice4_profile"
    os.system(f"rm -rf {logdir}")
    n = 12
    with jax.profiler.trace(logdir):
        for k in range(n):
            s, _ = step(s, forcing, jnp.float32(1.0 + k / 24.0),
                        jnp.float32(0.0))
        jax.block_until_ready(s.aicen)

    # parse the xplane with xprof's hlo_stats converter
    pb = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))[-1]
    import json as _json

    from xprof.convert import raw_to_tool_data as rtd
    data, _ctype = rtd.xspace_to_tool_data([pb], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = _json.loads(data)
    # gviz table: first element describes columns
    cols = [c["label"] for c in rows[0]["cols"]] if isinstance(rows, list) \
        else [c["label"] for c in rows["cols"]]
    table = rows[0]["rows"] if isinstance(rows, list) else rows["rows"]
    i_name = cols.index("HLO op name")
    i_fw = cols.index("Framework op name") if "Framework op name" in cols \
        else None
    i_cat = cols.index("HLO op category") if "HLO op category" in cols else None
    i_time = cols.index("Total self time (us)")
    i_occ = cols.index("#Occurrences") if "#Occurrences" in cols else None
    i_bw = cols.index("Measured memory BW (GiB/s)") \
        if "Measured memory BW (GiB/s)" in cols else None
    items = []
    for r in table:
        c = r["c"]
        items.append((c[i_name]["v"],
                      c[i_cat]["v"] if i_cat is not None else "",
                      float(c[i_time]["v"]),
                      int(c[i_occ]["v"]) if i_occ is not None else 0,
                      c[i_fw]["v"] if i_fw is not None else "",
                      float(c[i_bw]["v"]) if i_bw is not None else 0.0))
    items.sort(key=lambda t: -t[2])
    tsum = sum(t[2] for t in items)
    print(f"total device self-time/step: {tsum/n/1e3:.3f} ms "
          f"({len(items)} ops)")
    for name, cat, t, occ, fw, bw in items[:60]:
        print(f"{t/n:9.1f}us {t/tsum*100:5.1f}% x{occ:4d} bw={bw:6.0f} "
              f"[{cat:14s}] {name[:40]:40s} {fw[:110]}")


if __name__ == "__main__":
    main()
