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

    def Get(self, name: str):
        return self.data.get(name)

    def keys(self):
        return [k for k in self.data if "." in k]


def load_series(basename: str):
    """All numbered dumps for an output, sorted (e.g. 'data/disk.out1')."""
    files = sorted(glob.glob(basename + ".[0-9]*.npz"))
    return [adump(f) for f in files]


def load_final(basename: str) -> adump:
    return adump(basename + ".final.npz")
