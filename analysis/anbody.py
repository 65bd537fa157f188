"""Readers for the N-body ASCII outputs — the analysis-side counterpart of
the reference's ``analysis/anbody.py``.

``.reb`` format (nbody_outputs.cpp:75-93): header ``# NBody data N = <n>``
then a ``# [i]=name`` column line, then one row per particle per output:
time hash active mass x y z vx vy vz dm dmx_g dmy_g dmz_g dmx_a dmy_a dmz_a.

``.orb`` format (nbody_outputs.cpp:120-266): one file per bound pair
(``<base>.<i>_<j>.orb``) with orbital elements + force columns.
"""

from __future__ import annotations

import numpy as np


def _read_header(filename):
    with open(filename) as f:
        first = f.readline()
        second = f.readline()
    n = None
    if "=" in first:
        n = int(first.split("=")[1].strip())
    cols = [tok.split("=")[1] for tok in second[1:].strip().split()]
    return n, cols


class areb:
    """<problem_id>.reb reader.  ``data`` is the raw (rows, ncols) table;
    ``rdata`` is reshaped to (nout, N, ncols) like the reference tests."""

    def __init__(self, filename: str):
        self.N, self.cols = _read_header(filename)
        self.data = np.loadtxt(filename, ndmin=2)
        self.rdata = self.data.reshape(self.data.shape[0] // self.N, self.N,
                                       self.data.shape[1])

    def col(self, name: str):
        return self.rdata[:, :, self.cols.index(name)]

    def particle(self, pid: int):
        rows = self.data[self.data[:, 1] == pid]
        return {c: rows[:, i] for i, c in enumerate(self.cols)}

    def ids(self):
        return sorted(set(int(i) for i in self.data[:, 1]))


class aorb:
    """<problem_id>.<i>_<j>.orb reader (one bound pair per file)."""

    def __init__(self, filename: str):
        _, self.cols = _read_header(filename)
        self.data = np.loadtxt(filename, ndmin=2)

    def __getitem__(self, name: str):
        return self.data[:, self.cols.index(name)]
