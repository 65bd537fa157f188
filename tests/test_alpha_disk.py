"""Alpha-disk viscous steady state (reference: tst/scripts/diffusion/alpha_disk.py).

1-D axisymmetric alpha disk with viscous boundaries and instantaneous beta
cooling relaxed to t=8e3; the accretion rate must match mdot = 3 pi alpha
h^2 to 2e-3 (alpha_disk.py:41)."""

import math
import os

import numpy as np
import pytest

from .utils import run_deck

DECK = os.path.join(os.path.dirname(__file__), "..", "inputs", "alpha_disk.in")

ALPHA = 0.1
H = 0.1
TLIM = 8e3
NX = 64


@pytest.mark.slow
def test_alpha_disk(tmp_path):
    args = [
        f"parthenon/time/tlim={TLIM:.8e}",
        "parthenon/mesh/x1max=2.0",
        "physics/viscosity=true",
        f"gas/viscosity/alpha={ALPHA:.8e}",
        f"cooling/tcyl={H**2:.8e}",
        "cooling/cyl_plaw=-1.0",
        f"problem/mdot={ALPHA * H**2 * 3 * math.pi:.8e}",
        "problem/quiet_start=true",
        f"problem/h0={H:.8e}",
        "problem/dslope=0.0",
        "problem/flare=0.0",
        "artemis/coordinates=axisymmetric",
        f"parthenon/mesh/nx1={NX}",
        "parthenon/mesh/nx2=1",
        "parthenon/mesh/nx3=1",
        "parthenon/mesh/x2min=-0.5",
        "parthenon/mesh/x2max=0.5",
    ]
    sim = run_deck(DECK, args, str(tmp_path))
    w = np.asarray(sim.state["gas"]["w"][0])
    x1v, _, _ = sim.grid.cell_centers()
    r = x1v[0, 0]
    dens = w[0][0, 0]
    u = w[1][0, 0]
    mdot = -2 * math.pi * r * dens * u
    mdot_ans = 3 * math.pi * ALPHA * H**2
    err = np.abs(mdot / mdot_ans - 1.0).mean()
    assert err <= 2e-3, f"alpha disk mdot err {err:g}"
