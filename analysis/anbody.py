"""Readers for the N-body ASCII outputs (.reb per-particle state, .orb
orbital elements) — the analysis-side counterpart of the reference's
``analysis/anbody.py``."""

from __future__ import annotations

import numpy as np


class areb:
    """<problem_id>.reb: time id m x y z vx vy vz dm dmx1 dmx2 dmx3."""

    COLS = ("time", "id", "m", "x", "y", "z", "vx", "vy", "vz",
            "dm", "dmx1", "dmx2", "dmx3")

    def __init__(self, filename: str):
        self.data = np.loadtxt(filename, ndmin=2)

    def particle(self, pid: int):
        rows = self.data[self.data[:, 1] == pid]
        return {c: rows[:, i] for i, c in enumerate(self.COLS)}

    def ids(self):
        return sorted(set(int(i) for i in self.data[:, 1]))


class aorb:
    """<problem_id>.orb: time id1 id2 a e i o O f."""

    COLS = ("time", "id1", "id2", "a", "e", "i", "o", "O", "f")

    def __init__(self, filename: str):
        self.data = np.loadtxt(filename, ndmin=2)

    def pair(self, id1: int, id2: int):
        sel = (self.data[:, 1] == id1) & (self.data[:, 2] == id2)
        rows = self.data[sel]
        return {c: rows[:, i] for i, c in enumerate(self.COLS)}
