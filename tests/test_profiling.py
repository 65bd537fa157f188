"""Per-phase timers (profiling.phase_table): the Kokkos-Tools
named-kernel attribution analogue (SURVEY.md §5 tracing/profiling).
Checks that every driver phase appears with nonzero walltime on both the
single-level and the SMR/AMR driver, and that the instrumented cycles
advance physics identically in kind (finite state)."""

import io
import os

import numpy as np

from artemis_tpu.profiling import phase_table
from artemis_tpu.simulation import Simulation

INP = os.path.join(os.path.dirname(__file__), "..", "inputs")


def test_phase_table_driver(tmp_path):
    sim = Simulation(os.path.join(INP, "linwave.in"), overrides=[
        "parthenon/mesh/nx1=32", "parthenon/mesh/nx2=8",
        "parthenon/mesh/nx3=8", "parthenon/mesh/nghost=2",
    ], data_dir=str(tmp_path))
    buf = io.StringIO()
    totals = phase_table(sim, ncycles=3, out=buf)
    assert set(totals) == {"stage1", "stage2", "dt_estimate"}
    assert all(v > 0.0 for v in totals.values())
    text = buf.getvalue()
    assert "stage1" in text and "%" in text


def test_phase_table_smr_radiation(tmp_path):
    sim = Simulation(os.path.join(INP, "disk_rhd_amr.in"), overrides=[
        "parthenon/mesh/nx1=32", "parthenon/mesh/nx2=32",
        "parthenon/mesh/nx3=8",
    ], data_dir=str(tmp_path))
    buf = io.StringIO()
    totals = phase_table(sim, ncycles=2, out=buf)
    assert set(totals) == {"stage1", "stage2", "radiation", "dt_estimate"}
    assert all(v > 0.0 for v in totals.values())
    # the caller's state is untouched (profiling evolves a copy)
    w = np.asarray(sim.state["gas"]["w"])
    assert np.isfinite(w).all()
