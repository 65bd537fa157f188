"""Shearing-sheet planet spiral (reference: tst/scripts/ssheet/ssheet.py).

A q=1e-5 planet in a 2-D shearing sheet; after one orbit the density wake
must sit on the Ogilvie & Lubow (2002) spiral y = -(3/4) x^2/h sign(x) to
0.03 in azimuth at |x| = 0.1 (ssheet.py:94)."""

import math
import os

import numpy as np
import pytest

from .utils import run_deck

DECK = os.path.join(os.path.dirname(__file__), "..", "inputs", "ssheet.in")


def spiral_pos(x, h=0.05):
    return -0.75 * x**2 / h if x > 0 else 0.75 * x**2 / h


@pytest.mark.slow
def test_ssheet(tmp_path):
    sim = run_deck(DECK, [f"parthenon/time/tlim={2.0 * math.pi:.16f}"], str(tmp_path))
    w = np.asarray(sim.state["gas"]["w"][0])
    d = w[0][0]  # [ny, nx]
    x1v, x2v, _ = sim.grid.cell_centers()
    xc = x1v[0, 0]
    yc = x2v[0, :, 0]
    sig = d - d.mean(axis=0)

    ii = np.argwhere(xc <= -0.1)[-1][0]
    io = np.argwhere(xc >= 0.1)[0][0]
    pi_ = yc[np.argmax(sig[:, ii])]
    po_ = yc[np.argmax(sig[:, io])]
    err_i = abs(pi_ - spiral_pos(float(xc[ii])))
    err_o = abs(po_ - spiral_pos(float(xc[io])))
    assert err_i <= 0.03, f"inner spiral err {err_i:g}"
    assert err_o <= 0.03, f"outer spiral err {err_o:g}"
    assert not np.isnan(w).any()
