"""Trace the Newton iteration on the saved bad cell, f32 CPU, printing
per-iteration Tsf / Tin / ferr / kh to see the limit cycle."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

from cice4_tpu.config import gx1_config
from cice4_tpu.model import Model
from cice4_tpu.ops import therm_vertical as tv

d = np.load("/tmp/badcell.npz")
cfg = gx1_config()
model = Model.create(cfg)
p = model.thermo
dt = cfg.run.dt

def arr(x, extra_dims=0):
    a = jnp.asarray(np.array(x), jnp.float32)
    return a.reshape(a.shape + (1, 1)) if a.ndim or extra_dims else a.reshape(1, 1)

one = lambda k: jnp.full((1, 1), float(d[k]), jnp.float32)
lyr = lambda k: jnp.asarray(np.array(d[k]), jnp.float32).reshape(-1, 1, 1)

has_ice = jnp.ones((1, 1), bool)

# monkeypatch nitermax smaller and add prints by re-running body manually
out = tv.temperature_changes(
    p, dt, has_ice, one("rhoa"), one("flw"), one("potT"), one("Qa"),
    one("shcoef"), one("lhcoef"), one("fswsfc"), one("fswint"),
    one("fswthru"), lyr("Sswabs"), lyr("Iswabs"), one("hilyr"),
    one("hslyr"), lyr("qin"), lyr("Tin"), lyr("qsn"), lyr("Tsn"),
    one("Tsf"), one("Tbot"), one("einit"))
print("f32: niter", int(out["niter"]), "converged", bool(out["converged"][0, 0]),
      "why", format(int(out["why"][0, 0]), "05b"))
print("Tsf", float(out["Tsf"][0, 0]), "Tin", np.array(out["Tin"][:, 0, 0]))

# now in f64
jax.config.update("jax_enable_x64", True)
one64 = lambda k: jnp.full((1, 1), float(d[k]), jnp.float64)
lyr64 = lambda k: jnp.asarray(np.array(d[k]), jnp.float64).reshape(-1, 1, 1)
out = tv.temperature_changes(
    p, dt, has_ice, one64("rhoa"), one64("flw"), one64("potT"), one64("Qa"),
    one64("shcoef"), one64("lhcoef"), one64("fswsfc"), one64("fswint"),
    one64("fswthru"), lyr64("Sswabs"), lyr64("Iswabs"), one64("hilyr"),
    one64("hslyr"), lyr64("qin"), lyr64("Tin"), lyr64("qsn"), lyr64("Tsn"),
    one64("Tsf"), one64("Tbot"), one64("einit"))
print("f64: niter", int(out["niter"]), "converged", bool(out["converged"][0, 0]),
      "why", format(int(out["why"][0, 0]), "05b"))
print("Tsf", float(out["Tsf"][0, 0]), "Tin", np.array(out["Tin"][:, 0, 0]))
