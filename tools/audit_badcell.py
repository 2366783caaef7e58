"""Stage-by-stage energy audit of thermo_vertical at the saved bad
cell (/tmp/vthermo_bad.npz from debug_vthermo.py), category 0.

Budget identities checked:
  temperature solve:  e_tc - einit =? (fcondtop - fcondbot + fswint)*dt
  thickness changes:  efinal - e_tc =?
      -flatn*dt + (fsurf-fcondtop)*dt + (fcondbot-fbot)*dt
      - (fhocnn-fbot)*dt - fsnow*Lfresh*dt
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from cice4_tpu import constants as cn
from cice4_tpu.config import gx3_config
from cice4_tpu.model import Model
from cice4_tpu.ops import therm_vertical as tv

d = np.load("/tmp/vthermo_bad.npz")
j, i = int(d["bad_j"]), int(d["bad_i"])
cat = int(sys.argv[1]) if len(sys.argv) > 1 else 0

cfg = gx3_config()
model = Model.create(cfg)
p = model.thermo
dt = cfg.run.dt
nilyr, nslyr = p.nilyr, p.nslyr

one = lambda k: jnp.full((1, 1), float(np.asarray(d[k])[j, i]), jnp.float64)
catf = lambda k: jnp.full((1, 1), float(np.asarray(d[k])[cat, j, i]),
                          jnp.float64)
catl = lambda k: jnp.asarray(np.asarray(d[k])[cat, :, j, i],
                             jnp.float64).reshape(-1, 1, 1)

# rebuild the step's pre-thermo inputs exactly as _step_therm1 does
from cice4_tpu.driver import IceModelRun

run = IceModelRun(cfg, dtype=jnp.float64, log=lambda *_: None)
run.initialize()
state = run.state
import dataclasses
patch = {}
for fld in dataclasses.fields(state):
    if fld.name in d:
        patch[fld.name] = jnp.asarray(d[fld.name])
patch["trcrn"] = {k[len("trcrn_"):]: jnp.asarray(v) for k, v in d.items()
                  if k.startswith("trcrn_")}
state = state.replace(**patch)

from cice4_tpu.io.forcing_data import Forcing

fkw = {k[len("forcing_"):]: jnp.asarray(v) for k, v in d.items()
       if k.startswith("forcing_")}
f = Forcing(**{k: v for k, v in fkw.items()
               if k in Forcing.__dataclass_fields__})

from cice4_tpu import model as M
from cice4_tpu.ops import itd as itd_ops
from cice4_tpu.ops.atmo import atmo_boundary_layer
from cice4_tpu.ops.therm_vertical import frzmlt_bottom_lateral
from cice4_tpu.state import freezing_temperature

grid = run.grid
Tf = freezing_temperature(cfg, f.sss)
if cfg.radiation.prep_radiation:
    sw = M._prep_radiation(model, state, f)
else:
    sw = M._step_radiation(model, state, grid, f, jnp.asarray(d["yday"]),
                           jnp.zeros(()), dt)
agg = itd_ops.aggregate(state, grid.tmask)
Tbot2, fbot2, rside = frzmlt_bottom_lateral(
    model.thermo, dt, agg["aice"], state.frzmlt, state.eicen,
    state.esnon, state.sst, Tf, state.strocnxT, state.strocnyT)

cell = lambda a: jnp.asarray(a)[..., j:j + 1, i:i + 1]

aicen = cell(state.aicen[cat]); vicen = cell(state.vicen[cat])
vsnon = cell(state.vsnon[cat]); tsfcn = cell(state.tsfcn[cat])
eicen = cell(state.eicen[cat]); esnon = cell(state.esnon[cat])
fswsfc = cell(sw["fswsfc"][cat]); fswint = cell(sw["fswint"][cat])
fswthru = cell(sw["fswthru"][cat])
Sswabs = cell(sw["Sswabs"][cat]); Iswabs = cell(sw["Iswabs"][cat])
fbot = cell(fbot2); Tbot = cell(Tbot2); Tfc = cell(Tf)

bl = atmo_boundary_layer("ice", tsfcn, cell(f.potT), cell(f.uatm),
                         cell(f.vatm), cell(f.wind), cell(f.zlvl),
                         cell(f.Qa), cell(f.rhoa), cfg.thermo.calc_strair)

has_ice = aicen > cn.a_negligible(aicen.dtype)
a_safe = jnp.maximum(aicen, cn.puny)
tmlt = jnp.asarray(p.tmlt)[:nilyr, None, None]
Tsf = tsfcn
hin = jnp.where(has_ice, vicen / a_safe, 0.0)
hsn = jnp.where(has_ice, vsnon / a_safe, 0.0)
hilyr = jnp.where(has_ice, hin / nilyr, 1.0)
hslyr = hsn / nslyr
v_safe = jnp.maximum(vsnon, cn.puny)
snow_ok = (hslyr > tv.hs_min / nslyr) & has_ice
qsn = jnp.where(snow_ok[None], esnon * nslyr / v_safe[None],
                -cn.rhos * cn.Lfresh)
Tsn = (cn.Lfresh + qsn / cn.rhos) / cn.cp_ice
Tsn = jnp.minimum(Tsn, 0.0)
qsn = jnp.where(Tsn >= 0.0, -cn.rhos * cn.Lfresh, qsn)
vi_safe = jnp.maximum(vicen, cn.puny)
qin = jnp.where(has_ice[None], eicen * nilyr / vi_safe[None],
                -cn.rhoi * cn.Lfresh)
Tin = tv.tin_from_qin(p, qin, tmlt)
fix = Tin > 0.0
Tin = jnp.where(fix, 0.0, Tin)
qin = jnp.where(fix, -cn.rhoi * cn.Lfresh, qin)
einit = jnp.sum(hslyr[None] * qsn, 0) + jnp.sum(hilyr[None] * qin, 0)

s = lambda x: float(np.asarray(x).reshape(-1)[0])
print(f"cell ({j},{i}) cat {cat}: hin={s(hin):.6f} hsn={s(hsn):.6f} "
      f"einit={s(einit):.8e}")
print("qin", np.asarray(qin).reshape(-1))
print("qsn", np.asarray(qsn).reshape(-1), "snow_ok", bool(snow_ok[0, 0]))

tc = tv.temperature_changes(p, dt, has_ice, cell(f.rhoa), cell(f.flw),
                            cell(f.potT), cell(f.Qa), bl["shcoef"],
                            bl["lhcoef"], fswsfc, fswint, fswthru,
                            Sswabs, Iswabs, hilyr, hslyr, qin, Tin,
                            qsn, Tsn, Tsf, Tbot, einit)

e_tc = jnp.sum(hslyr[None] * tc["qsn"], 0) + jnp.sum(hilyr[None] * tc["qin"], 0)
lhs1 = s(e_tc) - s(einit)
rhs1 = (s(tc["fcondtopn"]) - s(tc["fcondbot"]) + s(fswint)) * dt
print(f"\n[temperature solve] de={lhs1:.6e} expected={rhs1:.6e} "
      f"err={(lhs1-rhs1)/dt:+.6e} W/m2  niter={int(np.asarray(tc['niter']).max())} "
      f"converged={bool(np.asarray(tc['converged']).all())}")
print(f"  Tsf {s(Tsf):.4f} -> {s(tc['Tsf']):.4f}; fsurfn={s(tc['fsurfn']):.6e} "
      f"fcondtop={s(tc['fcondtopn']):.6e} fcondbot={s(tc['fcondbot']):.6e} "
      f"flatn={s(tc['flatn']):.6e}")
print("  Tin", np.asarray(tc["Tin"]).reshape(-1))
print("  qin", np.asarray(tc["qin"]).reshape(-1))
print("  qsn", np.asarray(tc["qsn"]).reshape(-1))

th = tv.thickness_changes(p, dt, has_ice, hilyr, hslyr, tc["qin"],
                          tc["qsn"], fbot, Tbot, tc["flatn"],
                          tc["fsurfn"], tc["fcondtopn"], tc["fcondbot"],
                          cell(f.fsnow))

lhs2 = s(th["efinal"]) - s(e_tc)
rhs2 = (-s(tc["flatn"]) + (s(tc["fsurfn"]) - s(tc["fcondtopn"]))
        + (s(tc["fcondbot"]) - s(fbot)) - (s(th["fhocnn"]) - s(fbot))
        - s(cell(f.fsnow)) * cn.Lfresh) * dt
print(f"\n[thickness changes] de={lhs2:.6e} expected={rhs2:.6e} "
      f"err={(lhs2-rhs2)/dt:+.6e} W/m2")
print(f"  meltt={s(th['meltt']):.3e} melts={s(th['melts']):.3e} "
      f"meltb={s(th['meltb']):.3e} congel={s(th['congel']):.3e} "
      f"snoice={s(th['snoice']):.3e} evapn={s(th['evapn']):.3e} "
      f"fhocnn={s(th['fhocnn']):.6e}")
print(f"  hin {s(hin):.6f} -> {s(th['hin']):.6f}; hsn {s(hsn):.6f} -> "
      f"{s(th['hsn']):.6f}")

tot_lhs = s(th["efinal"]) - s(einit)
tot_rhs = (s(tc["fsurfn"]) - s(tc["flatn"]) + s(fswint)
           - s(th["fhocnn"]) - s(cell(f.fsnow)) * cn.Lfresh) * dt
print(f"\n[total] de={tot_lhs:.6e} einp={tot_rhs:.6e} "
      f"ferr={(tot_lhs-tot_rhs)/dt:+.6e} W/m2")
