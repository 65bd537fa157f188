"""In-process equivalents of the reference test harness helpers
(tst/scripts/utils/artemis.py): run a deck with overrides, collect outputs."""

from __future__ import annotations

import os

import numpy as np

from artemis_tpu.simulation import Simulation

INPUTS_DIR = os.path.join(os.path.dirname(__file__), "..", "inputs")


def run_deck(deck_path: str, overrides, data_dir: str):
    """Run one simulation to completion; returns the Simulation."""
    sim = Simulation(deck_path, overrides=list(overrides), data_dir=data_dir)
    sim.run()
    return sim


def load_errs(data_dir: str, problem_id: str) -> np.ndarray:
    return np.loadtxt(
        os.path.join(data_dir, problem_id + "-errs.dat"), dtype=np.float64, ndmin=2
    )
