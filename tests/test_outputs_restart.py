"""Restarted runs must continue outputs, not reset them (reference: Parthenon
resumes dump numbering and appends to .hst on restart), and must reuse the
checkpointed dt as-is for the first resumed cycle (the stored dt already has
the 2x growth clamp applied; re-growing would diverge from the uninterrupted
run whenever dt is growth-limited)."""

import glob
import os

import numpy as np

from artemis_tpu.driver import SimTime, evolve

from artemis_tpu.simulation import Simulation

DECK = os.path.join(os.path.dirname(__file__), "..", "inputs", "linwave.in")

ARGS = [
    "parthenon/mesh/nghost=4",
    "parthenon/mesh/nx1=16",
    "parthenon/mesh/nx2=8",
    "parthenon/mesh/nx3=8",
    "problem/amp=1.0e-6",
    "parthenon/output1/file_type=hst",
    "parthenon/output1/dt=0.25",
    "parthenon/output2/file_type=hdf5",
    "parthenon/output2/dt=0.25",
    "parthenon/output9/file_type=rst",
    "parthenon/output9/dt=0.25",
]


def _hst_times(path):
    rows = np.loadtxt(path, ndmin=2)
    return rows[:, 0]


def test_outputs_resume_across_restart(tmp_path):
    # uninterrupted run: the reference output record
    d1 = str(tmp_path / "straight")
    s1 = Simulation(DECK, overrides=ARGS, data_dir=d1)
    s1.run()
    t_straight = _hst_times(os.path.join(d1, "linear_wave.out1.hst"))
    dumps_straight = sorted(os.path.basename(f) for f in
                            glob.glob(os.path.join(d1, "*.out2.*.npz")))

    # interrupted at mid-run, then restarted in the same data dir
    d2 = str(tmp_path / "resumed")
    s2 = Simulation(DECK, overrides=ARGS + ["parthenon/time/nlim=9"],
                    data_dir=d2)
    s2.run()
    rst = os.path.join(d2, "linear_wave.out9.final.rst.npz")
    s3 = Simulation(DECK, overrides=ARGS, data_dir=d2, restart=rst)
    s3.run()

    # history: appended (pre-restart rows intact), strictly increasing times,
    # no duplicates
    t_resumed = _hst_times(os.path.join(d2, "linear_wave.out1.hst"))
    assert np.all(np.diff(t_resumed) > 0), "duplicate/out-of-order .hst rows"
    # every epoch of the uninterrupted record is present (the resumed record
    # additionally contains the interrupted run's final-state row)
    for t in t_straight:
        assert np.isclose(t_resumed, t, rtol=1e-12, atol=1e-12).any(), \
            f"missing .hst epoch {t}"
    assert len(t_resumed) <= len(t_straight) + 1

    # field dumps: numbering continues (no 00000 overwrite), same set of
    # output epochs as the uninterrupted run
    dumps_resumed = sorted(os.path.basename(f) for f in
                           glob.glob(os.path.join(d2, "*.out2.*.npz")))
    assert dumps_resumed == dumps_straight


class _FakeDriver:
    """Minimal driver for pinning evolve()'s dt semantics."""

    host_coupled = True
    sources = ()

    class grid:
        nx = (4, 4, 4)

    def __init__(self, est):
        self.est = est
        self.dts = []

    def step(self, state, dt, time):
        self.dts.append(float(dt))
        return state

    def estimate_dt(self, state):
        return self.est


def test_restored_dt_not_regrown():
    # growth-limited regime: CFL estimate (1.0) far above the stored dt
    drv = _FakeDriver(est=1.0)
    tm = SimTime(time=0.0, dt=0.1, tlim=0.5, nlim=3, restored=True)
    evolve(drv, {}, tm)
    # first resumed cycle uses the checkpointed dt as-is; growth resumes after
    assert drv.dts[0] == 0.1
    assert drv.dts[1] == 0.2

    drv2 = _FakeDriver(est=1.0)
    tm2 = SimTime(time=0.0, dt=0.1, tlim=0.5, nlim=3, restored=False)
    evolve(drv2, {}, tm2)
    assert drv2.dts[0] == 0.2  # fresh runs grow immediately
