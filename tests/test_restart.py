"""Checkpoint/restart round-trip (reference: restart coverage via
artemis.run(..., restart=...) in tst/scripts/utils/artemis.py:122-140 and the
disk test's restart leg).

A run interrupted at mid-time and restarted from its checkpoint must land on
the same final state as the uninterrupted run (bitwise for identical step
sequences)."""

import os

import numpy as np

from artemis_tpu.simulation import Simulation

DECK = os.path.join(os.path.dirname(__file__), "..", "inputs", "linwave.in")

ARGS = [
    "parthenon/mesh/nghost=4",
    "parthenon/mesh/nx1=16",
    "parthenon/mesh/nx2=8",
    "parthenon/mesh/nx3=8",
    "problem/amp=1.0e-6",
]


def test_restart_roundtrip(tmp_path):
    # straight run to tlim
    d1 = str(tmp_path / "straight")
    sim1 = Simulation(DECK, overrides=ARGS, data_dir=d1)
    sim1.run()

    # interrupted run: dump a checkpoint every 0.25
    d2 = str(tmp_path / "chunked")
    sim2 = Simulation(
        DECK,
        overrides=ARGS + ["parthenon/output9/file_type=rst",
                          "parthenon/output9/dt=0.25",
                          "parthenon/time/nlim=9"],
        data_dir=d2,
    )
    sim2.run()
    assert sim2.tm.ncycle == 9
    rst = os.path.join(d2, "linear_wave.out9.final.rst.npz")
    assert os.path.exists(rst)

    sim3 = Simulation(DECK, overrides=ARGS, data_dir=d2, restart=rst)
    assert sim3.tm.ncycle == 9
    sim3.run()

    assert sim3.tm.ncycle == sim1.tm.ncycle
    assert np.allclose(sim3.tm.time, sim1.tm.time)
    u1 = np.asarray(sim1.state["gas"]["u"])
    u3 = np.asarray(sim3.state["gas"]["u"])
    assert np.array_equal(u1, u3), \
        f"restart mismatch: max diff {np.abs(u1 - u3).max():g}"
