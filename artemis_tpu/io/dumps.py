"""Field dumps and restart files.

Replaces the reference's Parthenon HDF5 outputs (``file_type = hdf5`` data
dumps and ``rst`` restarts, doc/src/running.rst:60-76) with self-describing
``.npz`` archives: primitive fields + grid coordinates + time metadata.
``analysis/adump.py`` reads them with the same access patterns the
reference's ``ahdf`` reader offers.

Restart archives additionally hold the conserved state and the SimTime so a
run resumes bit-for-bit (``-r file.rst.npz``); package-specific restart
payloads (e.g. the N-body system state) register extra arrays.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


class FieldOutput:
    """Writes ``{problem_id}.out{n}.{NNNNN}.npz`` every ``dt_out``."""

    def __init__(self, sim, dt_out: float, basename: str, variables=None):
        self.sim = sim
        self.dt_out = dt_out
        self.basename = basename  # e.g. data_dir/problem.out1
        self.next_time = 0.0
        self.count = 0
        self.variables = variables

    def _arrays(self, state):
        out = {}
        drv = self.sim.driver
        names = {"gas": ["density", "velocity_x1", "velocity_x2", "velocity_x3",
                         "pressure", "sie"],
                 "dust": ["density", "velocity_x1", "velocity_x2", "velocity_x3"]}
        for fluid in ("gas", "dust"):
            if fluid not in state:
                continue
            w = np.asarray(state[fluid]["w"])
            for n in range(w.shape[0]):
                for c, nm in enumerate(names[fluid]):
                    out[f"{fluid}.prim.{nm}_{n}"] = w[n, c]
        return out

    def _write(self, state, tm, tag=None):
        grid = self.sim.grid
        g = grid.geom
        s3, s2, s1 = grid.int_slices
        fname = f"{self.basename}.{self.count:05d}.npz" if tag is None else \
            f"{self.basename}.{tag}.npz"
        meta = dict(time=tm.time, dt=tm.dt, ncycle=tm.ncycle,
                    coords=grid.coords, nx=list(grid.nx))
        np.savez(
            fname,
            __meta__=json.dumps(meta),
            x1f=g.xf1[s1.start:s1.stop + 1],
            x2f=g.xf2[s2.start:s2.stop + 1],
            x3f=g.xf3[s3.start:s3.stop + 1],
            x1v=g.xv1[s1], x2v=g.xv2[s2], x3v=g.xv3[s3],
            **self._arrays(state),
        )
        self.count += 1
        return fname

    def start(self, state, tm):
        self._write(state, tm)
        self.next_time = self.dt_out

    def __call__(self, state, tm):
        while tm.time >= self.next_time * (1.0 - 1e-12):
            self._write(state, tm)
            self.next_time += self.dt_out

    def finish(self, state, tm):
        self._write(state, tm, tag="final")


class RestartOutput:
    """Writes ``{problem_id}.out{n}.{NNNNN|final}.rst.npz`` checkpoints."""

    def __init__(self, sim, dt_out: float, basename: str):
        self.sim = sim
        self.dt_out = dt_out
        self.basename = basename
        self.next_time = 0.0
        self.count = 0

    def _write(self, state, tm, tag=None):
        arrays = {}
        for fluid in state:
            for kind, val in state[fluid].items():
                arrays[f"{fluid}.{kind}"] = np.asarray(val)
        # package restart payloads (e.g. nbody system snapshot)
        for name, payload in getattr(self.sim, "restart_payloads", {}).items():
            arrays[f"payload.{name}"] = payload()
        meta = dict(time=tm.time, dt=tm.dt, ncycle=tm.ncycle)
        fname = f"{self.basename}.{self.count:05d}.rst.npz" if tag is None else \
            f"{self.basename}.{tag}.rst.npz"
        np.savez(fname, __meta__=json.dumps(meta), **arrays)
        self.count += 1
        return fname

    def start(self, state, tm):
        self.next_time = self.dt_out

    def __call__(self, state, tm):
        while tm.time >= self.next_time * (1.0 - 1e-12):
            self._write(state, tm)
            self.next_time += self.dt_out

    def finish(self, state, tm):
        self._write(state, tm, tag="final")


def load_restart(path: str):
    """Returns (state_arrays, meta, payloads)."""
    with np.load(path, allow_pickle=False) as f:
        meta = json.loads(str(f["__meta__"]))
        state = {}
        payloads = {}
        for key in f.files:
            if key == "__meta__":
                continue
            if key.startswith("payload."):
                payloads[key.removeprefix("payload.")] = f[key]
                continue
            fluid, kind = key.split(".")
            state.setdefault(fluid, {})[kind] = f[key]
    return state, meta, payloads
