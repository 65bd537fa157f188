"""Stratified shearing box (pgen reference: src/pgen/strat.hpp).

The 3-D box starts in vertical hydrostatic equilibrium
rho = rho0 exp(-z^2/2h^2) with background shear vy = -q Omega x.  With the
strat custom boundaries (extrap x1, geometric-density extrap x3,
strat.hpp:154-260,477-639) the equilibrium must hold: after t=1/Omega the
density stays within a few percent of the initial profile and no vertical
flow develops.  Plain copy ghosts fail this (max |vz| ~ 0.9 vs ~0.02 with
the stratified extrapolation), so the test pins the x3 BC behavior.
"""

import os

import numpy as np
import pytest

from .utils import run_deck

DECK = os.path.join(os.path.dirname(__file__), "..", "inputs", "strat.in")


def test_strat_equilibrium(tmp_path):
    sim = run_deck(DECK, [], str(tmp_path))
    w = np.asarray(sim.state["gas"]["w"][0])
    d, vz = w[0], w[3]
    _, _, x3v = sim.grid.cell_centers()
    h = 0.25
    rho_eq = np.broadcast_to(np.maximum(1e-5, np.exp(-(x3v**2) / (2 * h * h))),
                             d.shape)
    rel = np.abs(d - rho_eq) / rho_eq
    body = rho_eq > 1e-2  # inside ~3 scale heights
    assert rel[body].max() <= 0.03, f"density drift {rel[body].max():g}"
    assert np.abs(vz).max() <= 0.1, f"vertical flow {np.abs(vz).max():g}"
    assert not np.isnan(w).any()


def test_strat_dust_smoke(tmp_path):
    """Dust branch of the strat IC and custom BCs (strat.hpp:141-149,209-224):
    dust loads at dust_to_gas and stays finite through the boundaries."""
    sim = run_deck(
        DECK,
        ["parthenon/time/tlim=0.1", "physics/dust=true",
         "dust/nspecies=1", "problem/dust_to_gas=0.01"],
        str(tmp_path),
    )
    wd = np.asarray(sim.state["dust"]["w"])
    assert wd.shape[0] == 1 and not np.isnan(wd).any()
    assert wd[0, 0].max() <= 0.02  # ~d2g * rho0, no blow-up
