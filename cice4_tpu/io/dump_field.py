"""Per-field time-series debug dumps (COSIMA's ``source/dump_field.F90``
and the `-DUNIT_TESTING` golden-field instrumentation of
``bld/build.sh:27-31`` / ``cpl_interface.F90:468-472``).

Appends named 2D fields to npz shards with min/max/mean metadata, for
offline golden-file comparison of coupler boundary fields (the
reference's closest thing to a unit-test harness, SURVEY §4.7).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


class FieldDumper:
    def __init__(self, directory: str = "./dumps", enabled: bool = True):
        self.dir = directory
        self.enabled = enabled
        self._count: dict[str, int] = {}

    def dump(self, name: str, field, istep: int | None = None):
        """Write one snapshot of `field` with summary stats."""
        if not self.enabled:
            return None
        os.makedirs(self.dir, exist_ok=True)
        arr = np.asarray(jax.device_get(field))
        k = self._count.get(name, 0)
        self._count[name] = k + 1
        tag = istep if istep is not None else k
        path = os.path.join(self.dir, f"{name}.{tag:06d}.npz")
        stats = dict(min=float(arr.min()), max=float(arr.max()),
                     mean=float(arr.mean()))
        np.savez_compressed(path, field=arr,
                            __meta__=json.dumps(dict(name=name, step=tag,
                                                     **stats)))
        return path

    @staticmethod
    def compare(path_a: str, path_b: str, rtol=1e-6, atol=1e-9):
        """Golden-file comparison of two dumps."""
        with np.load(path_a) as za, np.load(path_b) as zb:
            a, b = za["field"], zb["field"]
        ok = np.allclose(a, b, rtol=rtol, atol=atol)
        maxdiff = float(np.abs(a - b).max()) if a.shape == b.shape else None
        return ok, maxdiff
