"""Exact-restart checkpointing.

Equivalent of ``source/ice_restart.F90`` (`dumpfile:74-256`,
`restartfile:265-578`): the full prognostic state — category state,
velocity, ALL 12 EVP stress fields, `iceumask`, SST/frzmlt and the
radiation scale factor — is written so a dump/resume run bit-matches a
continuous run; a pointer file chains restarts for
`runtype = 'continue'`.

Storage is a single compressed ``.npz`` of the state pytree plus a JSON
header (step index, model time, config fingerprint) — the TPU-native
replacement for the reference's sequence of big-endian Fortran records.
Every leaf is gathered to host (`jax.device_get`); under sharding this
is the analogue of the reference's `gather_global` per record.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from cice4_tpu.state import State

FORMAT_VERSION = 1


def _flatten(state: State):
    flat = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if isinstance(v, dict):
            for k, arr in v.items():
                flat[f"{f.name}.{k}"] = np.asarray(jax.device_get(arr))
        else:
            flat[f.name] = np.asarray(jax.device_get(v))
    return flat


def dump_restart(state: State, path: str, istep: int, time: float,
                 pointer_file: str | None = None, extra: dict | None = None):
    """Write a restart file (+ pointer file, ``ice_restart.F90:127-131``)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(state)
    header = dict(format=FORMAT_VERSION, istep=istep, time=time,
                  tracers=sorted(state.trcrn.keys()),
                  **(extra or {}))
    np.savez_compressed(path, __header__=json.dumps(header), **flat)
    if pointer_file:
        os.makedirs(os.path.dirname(os.path.abspath(pointer_file)),
                    exist_ok=True)
        with open(pointer_file, "w") as f:
            f.write(os.path.abspath(path) + "\n")
    return path


def read_pointer(pointer_file: str) -> str:
    with open(pointer_file) as f:
        return f.read().strip()


def load_restart(path: str, template: State, dtype=None):
    """Read a restart into a State shaped like `template`.

    Returns (state, header).  Mirrors `restartfile:265-578`; aggregates
    are recomputed by the caller's first step.
    """
    with np.load(path, allow_pickle=False) as z:
        header = json.loads(str(z["__header__"]))
        flat = {k: z[k] for k in z.files if k != "__header__"}

    kwargs = {}
    for f in dataclasses.fields(template):
        v = getattr(template, f.name)
        if isinstance(v, dict):
            d = {}
            for k, arr in v.items():
                src = flat[f"{f.name}.{k}"]
                d[k] = jnp.asarray(src.astype(np.asarray(arr).dtype)
                                   if dtype is None else src)
            kwargs[f.name] = d
        else:
            src = flat[f.name]
            tgt_dtype = np.asarray(v).dtype
            kwargs[f.name] = jnp.asarray(src.astype(tgt_dtype))
    return State(**kwargs), header
