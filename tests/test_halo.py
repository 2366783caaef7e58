"""Boundary-condition shift semantics (vs ice_boundary halo behavior)."""

import jax.numpy as jnp
import numpy as np

from cice4_tpu.constants import FieldLoc, FieldType
from cice4_tpu.parallel import halo as h
from cice4_tpu.parallel.halo import BoundaryConditions


def _field(ny=6, nx=8):
    return jnp.arange(ny * nx, dtype=jnp.float64).reshape(ny, nx)


def test_cyclic_ew():
    bc = BoundaryConditions(ew="cyclic", ns="closed")
    f = _field()
    e = np.asarray(h.nbr_e(f, bc))
    assert np.array_equal(e[:, :-1], np.asarray(f)[:, 1:])
    assert np.array_equal(e[:, -1], np.asarray(f)[:, 0])
    w = np.asarray(h.nbr_w(f, bc))
    assert np.array_equal(w[:, 1:], np.asarray(f)[:, :-1])
    assert np.array_equal(w[:, 0], np.asarray(f)[:, -1])


def test_closed_ns_zero_ghost():
    bc = BoundaryConditions(ew="cyclic", ns="closed")
    f = _field()
    n = np.asarray(h.nbr_n(f, bc))
    assert np.array_equal(n[:-1], np.asarray(f)[1:])
    assert np.all(n[-1] == 0)
    s = np.asarray(h.nbr_s(f, bc))
    assert np.array_equal(s[1:], np.asarray(f)[:-1])
    assert np.all(s[0] == 0)


def test_open_ns_matches_closed():
    # reference runtime halos fill unreachable ghosts with 0 for open too
    f = _field()
    n_open = np.asarray(h.nbr_n(f, BoundaryConditions(ew="cyclic", ns="open")))
    n_closed = np.asarray(h.nbr_n(f, BoundaryConditions(ew="cyclic", ns="closed")))
    assert np.array_equal(n_open, n_closed)


def test_tripole_center_scalar_fold():
    """Ghost north of the top row is the top row reversed in x (U-fold)."""
    bc = BoundaryConditions(ew="cyclic", ns="tripole")
    f = _field()
    n = np.asarray(h.nbr_n(f, bc, FieldLoc.CENTER, FieldType.SCALAR))
    top = np.asarray(f)[-1]
    assert np.array_equal(n[-1], top[::-1])


def test_tripole_vector_sign_flip():
    bc = BoundaryConditions(ew="cyclic", ns="tripole")
    f = _field()
    n = np.asarray(h.nbr_n(f, bc, FieldLoc.CENTER, FieldType.VECTOR))
    top = np.asarray(f)[-1]
    assert np.array_equal(n[-1], -top[::-1])


def test_tripole_ne_corner_shared_point():
    """U-fold: the physical point north of U(ny-2, i) is U(ny-2, nx-2-i)."""
    bc = BoundaryConditions(ew="cyclic", ns="tripole")
    f = _field()
    n = np.asarray(h.nbr_n(f, bc, FieldLoc.NE_CORNER, FieldType.SCALAR))
    row = np.asarray(f)[-2]
    nx = f.shape[-1]
    expect = row[(np.arange(nx - 2, -2, -1)) % nx]
    assert np.array_equal(n[-1], expect)


def test_batched_leading_axes():
    bc = BoundaryConditions(ew="cyclic", ns="closed")
    f = jnp.stack([_field(), 2 * _field()])
    n = np.asarray(h.nbr_n(f, bc))
    assert n.shape == f.shape
    assert np.array_equal(n[1], 2 * n[0])
