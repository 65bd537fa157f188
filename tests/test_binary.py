"""Circumbinary/planet disk with the analytic binary-orbit potential
(reference: tst/scripts/binary/binary.py — wake position rel err <= 0.03)."""

import math
import os

import numpy as np
import pytest

from .test_nbody import spiral_pos
from .utils import run_deck

DECK = os.path.join(os.path.dirname(__file__), "..", "inputs", "binary_cyl.in")


@pytest.mark.slow
def test_binary_planet_disk(tmp_path):
    sim = run_deck(DECK, [f"parthenon/time/tlim={2 * math.pi:.16f}"], str(tmp_path))
    w = np.asarray(sim.state["gas"]["w"][0])
    d = w[0][0]
    x1v, x2v, _ = sim.grid.cell_centers()
    rc = x1v[0, 0]
    pc = x2v[0, :, 0]
    sig = d - d.mean(axis=0)
    ii = np.argwhere(rc >= 1 - 0.1)[0][0]
    io = np.argwhere(rc >= 1 + 0.1)[0][0]
    pi_ = pc[np.argmax(sig[:, ii])]
    po_ = pc[np.argmax(sig[:, io])]
    p0i, p0o = spiral_pos(float(rc[ii])), spiral_pos(float(rc[io]))
    assert abs(pi_ - p0i) / p0i <= 0.03, f"inner wake {pi_:g} vs {p0i:g}"
    assert abs(po_ - p0o) / p0o <= 0.03, f"outer wake {po_:g} vs {p0o:g}"
    assert not np.isnan(w).any()


@pytest.mark.slow
@pytest.mark.parametrize("rsolver,de_switch", [
    ("llf", 1.0), ("hlle", 0.2), ("hllc", 0.2)])
def test_binary_adiabatic(tmp_path, rsolver, de_switch):
    """Adiabatic (gamma=1.4, no cooling) binary wake across Riemann solvers
    and dual-energy switches (reference: tst/scripts/binary_adi/
    binary_adi.py — same spiral-position check, flux x de_switch sweep)."""
    sim = run_deck(DECK, [
        f"parthenon/time/tlim={2 * math.pi:.16f}",
        "gas/gamma=1.4",
        f"gas/riemann={rsolver}",
        f"gas/de_switch={de_switch:.1e}",
        "physics/cooling=false",
    ], str(tmp_path))
    w = np.asarray(sim.state["gas"]["w"][0])
    d = w[0][0]
    x1v, x2v, _ = sim.grid.cell_centers()
    rc = x1v[0, 0]
    pc = x2v[0, :, 0]
    sig = d - d.mean(axis=0)
    ii = np.argwhere(rc >= 1 - 0.1)[0][0]
    io = np.argwhere(rc >= 1 + 0.1)[0][0]
    pi_ = pc[np.argmax(sig[:, ii])]
    po_ = pc[np.argmax(sig[:, io])]
    p0i, p0o = spiral_pos(float(rc[ii])), spiral_pos(float(rc[io]))
    assert abs(pi_ - p0i) / p0i <= 0.05, f"inner wake {pi_:g} vs {p0i:g}"
    assert abs(po_ - p0o) / p0o <= 0.05, f"outer wake {po_:g} vs {p0o:g}"
    assert not np.isnan(w).any()


def test_binary_smoke(tmp_path):
    """30-cycle smoke of the circumbinary disk in the DEFAULT suite: the
    binary potential + cooling + viscosity path stays finite and the
    planet wake starts forming at the forcing radius (catches broken
    source terms without the full-orbit run)."""
    sim = run_deck(DECK, ["parthenon/time/nlim=30"], str(tmp_path))
    w = np.asarray(sim.state["gas"]["w"][0])
    assert np.isfinite(w).all()
    d = w[0][0]
    assert (d > 0).all()
    x1v, x2v, _ = sim.grid.cell_centers()
    rc = x1v[0, 0]
    sig = np.abs(d - d.mean(axis=0))
    ii = np.argwhere(rc >= 1.0)[0][0]
    assert sig[:, ii].max() > 1e-6, "no wake forming at the planet radius"
