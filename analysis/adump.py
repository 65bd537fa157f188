"""Reader for artemis_tpu field dumps (.npz), in the spirit of the
reference's ``analysis/ahdf.py`` phdf wrapper: load a dump, get mesh
coordinates and named primitive fields.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np


class adump:
    def __init__(self, filename: str):
        self.filename = filename
        with np.load(filename, allow_pickle=False) as f:
            self.meta = json.loads(str(f["__meta__"]))
            self.data = {k: f[k] for k in f.files if k != "__meta__"}
        self.time = self.meta["time"]
        self.coords = self.meta["coords"]
        self.nx = self.meta["nx"]

    # coordinate accessors -------------------------------------------------
    @property
    def x1f(self):
        return self.data["x1f"]

    @property
    def x2f(self):
        return self.data["x2f"]

    @property
    def x3f(self):
        return self.data["x3f"]

    @property
    def x1v(self):
        return self.data["x1v"]

    @property
    def x2v(self):
        return self.data["x2v"]

    @property
    def x3v(self):
        return self.data["x3v"]

    def Get(self, name: str, report_available: bool = True):
        """Field by name; species-suffixed components (``name_0``,
        ``name_x1_0``...) are stacked over species (cf. ahdf.Get)."""
        if name in self.data:
            return self.data[name]
        sp = [k for k in self.data
              if k.startswith(name + "_") and k[len(name) + 1:].isdigit()]
        if sp:
            return np.stack([self.data[k]
                             for k in sorted(sp, key=lambda k: int(k.rsplit("_", 1)[1]))])
        if report_available:
            print(f"{name!r} not in dump; available: {sorted(self.keys())}")
        return None

    def keys(self):
        return [k for k in self.data if "." in k]


def load_series(basename: str):
    """All numbered dumps for an output, sorted (e.g. 'data/disk.out1')."""
    files = sorted(glob.glob(basename + ".[0-9]*.npz"))
    return [adump(f) for f in files]


def load_final(basename: str) -> adump:
    return adump(basename + ".final.npz")


def _cart_nodes(coords, X1, X2, X3):
    """Cartesian node coordinates (cf. ahdf.__init__, analysis/ahdf.py:64-83)."""
    if coords == "cartesian":
        return X1, X2, X3
    if coords in ("cylindrical",):
        return X1 * np.cos(X2), X1 * np.sin(X2), X3
    if coords == "axisymmetric":
        return X1 * np.cos(X3), X1 * np.sin(X3), X2
    if coords.startswith("spherical"):
        return (X1 * np.sin(X2) * np.cos(X3),
                X1 * np.sin(X2) * np.sin(X3),
                X1 * np.cos(X2))
    raise ValueError(f"Coordinate system {coords!r} is unsupported!")


def _add_cart(dump: "adump"):
    X3, X2, X1 = np.meshgrid(dump.x3f, dump.x2f, dump.x1f, indexing="ij")
    dump.x, dump.y, dump.z = _cart_nodes(dump.coords, X1, X2, X3)
    return dump


# node-mesh accessors mirroring ahdf's plotting helpers
def cart_nodes(dump: "adump"):
    """(x, y, z) cartesian node meshes [nz+1, ny+1, nx+1] for pcolormesh."""
    if not hasattr(dump, "x"):
        _add_cart(dump)
    return dump.x, dump.y, dump.z
