"""History output: accumulation, multi-dim field classes, netCDF
round-trip (``ice_history.F90`` registry/accumulate/icecdf analogue)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cice4_tpu import constants as cn
from cice4_tpu.config import Config, DomainConfig, DynamicsConfig, \
    GridConfig, TransportConfig
from cice4_tpu.forcing import default_forcing
from cice4_tpu.grid import make_grid
from cice4_tpu.io.history import History, default_fields
from cice4_tpu.model import Model, ice_step
from cice4_tpu.state import init_state


@pytest.fixture(scope="module")
def run_two_steps():
    cfg = Config(
        domain=DomainConfig(nx_global=16, ny_global=16),
        grid=GridConfig(grid_type="rectangular", lat_origin=66.0),
        dynamics=DynamicsConfig(ndte=10),
        transport=TransportConfig(advection="upwind"),
    )
    grid = make_grid(cfg, dtype=jnp.float64)
    model = Model.create(cfg)
    state = init_state(cfg, grid, model.itd, dtype=jnp.float64)
    f = default_forcing(grid.ny, grid.nx, jnp.float64)
    step = jax.jit(lambda s: ice_step(model, s, grid, f, 80.0, 0.0))
    outs = []
    for _ in range(2):
        state, fluxes = step(state)
        outs.append((state, fluxes))
    return cfg, grid, model, outs


def test_multidim_fields_shapes(run_two_steps):
    cfg, grid, model, outs = run_two_steps
    fields = default_fields(model.itd)
    s, fx = outs[-1]
    from cice4_tpu.ops.itd import aggregate
    agg = aggregate(s, grid.tmask)
    ncat, nilyr = model.itd.ncat, model.itd.nilyr
    assert fields["aicen"].extract(s, fx, agg).shape == \
        (ncat, grid.ny, grid.nx)
    assert fields["fsurfn_ai"].extract(s, fx, agg).shape == \
        (ncat, grid.ny, grid.nx)
    tinz = fields["Tinz"].extract(s, fx, agg)
    assert tinz.shape == (nilyr, ncat, grid.ny, grid.nx)
    # where there is ice, internal temps are physical (< 0, > -60)
    has = np.asarray(s.vicen > cn.puny)
    t = np.asarray(tinz)
    sel = np.broadcast_to(has[None], t.shape)
    assert (t[sel] < 1e-6).all() and (t[sel] > -60.0).all()


def test_netcdf_roundtrip(run_two_steps, tmp_path_factory):
    cfg, grid, model, outs = run_two_steps
    d = str(tmp_path_factory.mktemp("hist"))
    hist = History(grid, histfreq=("d",), histfreq_n=(1,),
                   directory=d, itd=model.itd)
    for s, fx in outs:
        hist.accumulate(s, fx)
    stream = hist.streams[0]
    assert stream.count == 2
    path = stream.write(19970101, 1.0)
    assert path and os.path.exists(path)

    from scipy.io import netcdf_file
    with netcdf_file(path, "r") as nc:
        aice = nc.variables["aice"][:]
        aicen = nc.variables["aicen"][:]
        tinz = nc.variables["Tinz"][:]
        assert aice.shape == (1, grid.ny, grid.nx)
        assert aicen.shape == (1, model.itd.ncat, grid.ny, grid.nx)
        assert tinz.shape == (1, model.itd.nilyr, model.itd.ncat,
                              grid.ny, grid.nx)
        # time-average of the 2 steps on ocean points
        ocean = np.asarray(grid.tmask)
        expect = 0.5 * (np.asarray(jnp.sum(outs[0][0].aicen, 0))
                        + np.asarray(jnp.sum(outs[1][0].aicen, 0)))
        np.testing.assert_allclose(aice[0][ocean], expect[ocean],
                                   rtol=1e-6, atol=1e-6)
    # accumulators reset after write
    assert stream.count == 0 and not stream.sums


def test_field_registry_complete(run_two_steps):
    """The registry covers the reference's ~103 `init_hist` fields
    (`ice_history.F90:417-1367`)."""
    cfg, grid, model, outs = run_two_steps
    fields = default_fields(model.itd)
    assert len(fields) >= 100
    for must in ("sig1", "sig2", "trsig", "strintx", "strcorx",
                 "strtltx", "daidtt", "daidtd", "dvidtt", "dvidtd",
                 "fswdn", "flwdn", "rain", "snow", "hisnap", "aisnap",
                 "mlt_onset", "frz_onset", "fresh_ai", "fhocn_ai",
                 "fmeltt_ai", "fmelttn_ai", "iage", "ardg", "vrdg"):
        assert must in fields, must


def test_forcing_echo_and_snapshots(run_two_steps, tmp_path_factory):
    """Forcing-echo fields and snapshot (non-averaged) fields flow
    through History.accumulate; snapshots keep the last value."""
    cfg, grid, model, outs = run_two_steps
    f = default_forcing(grid.ny, grid.nx, jnp.float64)
    d = str(tmp_path_factory.mktemp("hist2"))
    hist = History(grid, histfreq=("d",), histfreq_n=(1,),
                   directory=d, itd=model.itd)
    for k, (s, fx) in enumerate(outs):
        hist.accumulate(s, fx, forcing=f, yday=80.0 + k, dt=3600.0)
    stream = hist.streams[0]
    assert "fswdn" in stream.sums
    assert "Tair" in stream.sums
    assert "sig1" in stream.sums
    assert "daidtt" in stream.sums
    # snapshot: aisnap equals the LAST step's aice, not the sum
    last_aice = np.asarray(jnp.sum(outs[-1][0].aicen, 0))
    np.testing.assert_allclose(np.asarray(stream.sums["aisnap"]),
                               last_aice, rtol=1e-12)
    path = stream.write(19970102, 2.0)
    from scipy.io import netcdf_file
    with netcdf_file(path, "r") as nc:
        assert "fswdn" in nc.variables
        assert "aisnap" in nc.variables
        ocean = np.asarray(grid.tmask)
        np.testing.assert_allclose(
            nc.variables["aisnap"][0][ocean], last_aice[ocean],
            rtol=1e-5, atol=1e-7)


def test_binary_stream_roundtrip(run_two_steps, tmp_path_factory):
    """icebin analogue (``ice_history.F90:3244-3474``): flat big-endian
    f64 records + ASCII header; records parse back to the netCDF
    values."""
    cfg, grid, model, outs = run_two_steps
    d = str(tmp_path_factory.mktemp("histbin"))
    hist = History(grid, histfreq=("d",), histfreq_n=(1,), avg=True,
                   directory=d, itd=model.itd, fmt="bin")
    for state, fluxes in outs:
        hist.accumulate(state, fluxes)
    path = hist.streams[0].write(19970101, 1.0)
    assert path.endswith(".da") and os.path.exists(path)
    hdr = path[:-3] + ".hdr"
    assert os.path.exists(hdr)
    lines = [ln for ln in open(hdr) if not ln.startswith("#")][1:]
    raw = np.fromfile(path, dtype=">f8")
    nrec = int(lines[-1].split()[0])
    assert raw.size == nrec * grid.ny * grid.nx
    # find aice record and check values against a fresh nc stream
    recs = {}
    for ln in lines:
        parts = ln.split()
        recs[parts[2]] = (int(parts[0]), int(parts[1]))
    end, nlev = recs["aice"]
    block = raw[(end - nlev) * grid.ny * grid.nx:
                end * grid.ny * grid.nx].reshape(nlev, grid.ny, grid.nx)
    hist2 = History(grid, histfreq=("d",), histfreq_n=(1,), avg=True,
                    directory=d, prefix="icehnc", itd=model.itd)
    for state, fluxes in outs:
        hist2.accumulate(state, fluxes)
    p2 = hist2.streams[0].write(19970101, 1.0)
    from scipy.io import netcdf_file
    with netcdf_file(p2, "r") as nc:
        ref = np.array(nc.variables["aice"][0])
    np.testing.assert_allclose(block[0], ref, rtol=1e-6, atol=1e-7)


def test_gridbox_corner_metadata(run_two_steps, tmp_path_factory):
    """gridbox corners land in the netCDF file and the NE T-corner
    equals ULAT/ULON (``ice_grid.F90 gridbox_corners:1948-2122``)."""
    cfg, grid, model, outs = run_two_steps
    d = str(tmp_path_factory.mktemp("histcnr"))
    hist = History(grid, histfreq=("d",), histfreq_n=(1,), avg=True,
                   directory=d, itd=model.itd)
    hist.accumulate(*outs[0])
    path = hist.streams[0].write(19970102, 2.0)
    from scipy.io import netcdf_file
    with netcdf_file(path, "r") as nc:
        latt = np.array(nc.variables["latt_bounds"][:])
        lont = np.array(nc.variables["lont_bounds"][:])
        assert latt.shape == (4, grid.ny, grid.nx)
        np.testing.assert_allclose(
            latt[2], np.rad2deg(np.asarray(grid.ulat)), atol=1e-4)
        assert (lont >= 0.0).all() and (lont <= 360.0).all()
