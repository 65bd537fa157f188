"""Sedov blast sphericity across coordinate systems
(reference: tst/scripts/coords/blast.py — pressure L2 vs the semi-analytic
sedov{2,3}d.dat tables, threshold L2 < 1.0).

1-D spherical / 1-D cylindrical-symmetry runs are the fast default; the 2-D
cartesian and axisymmetric runs are marked slow.
"""

import math
import os

import numpy as np
import pytest
from scipy.interpolate import interp1d

from .utils import run_deck

HERE = os.path.dirname(__file__)
DECK = os.path.join(HERE, "..", "inputs", "blast.in")
DAT2 = np.loadtxt(os.path.join(HERE, "data", "sedov2d.dat"), comments="#")
DAT3 = np.loadtxt(os.path.join(HERE, "data", "sedov3d.dat"), comments="#")

ARGS = {
    "cart": [],
    "axi": [
        "artemis/coordinates=axisymmetric",
        "parthenon/mesh/x1min=0.0", "parthenon/mesh/x1max=2.0",
        "parthenon/mesh/x2min=-1.0", "parthenon/mesh/x2max=1.0",
        "parthenon/mesh/x3min=-0.5", "parthenon/mesh/x3max=0.5",
        "parthenon/mesh/ix1_bc=reflecting",
        "problem/symmetry=spherical",
    ],
    "cyl": [
        "artemis/coordinates=axisymmetric",
        "parthenon/mesh/x1min=0.0", "parthenon/mesh/x1max=1.0",
        "parthenon/mesh/nx1=1024", "parthenon/mesh/nx2=1",
        "parthenon/mesh/x2min=-0.5", "parthenon/mesh/x2max=0.5",
        "parthenon/mesh/x3min=-0.5", "parthenon/mesh/x3max=0.5",
        "problem/symmetry=cylindrical", "problem/samples=0",
    ],
    "cart3d": [
        # 3-D Cartesian spherical deposit (compute_overlap_sph Cartesian
        # branch, blast.hpp:91-107) vs the sedov3d table
        "parthenon/mesh/nx1=64", "parthenon/mesh/nx2=64",
        "parthenon/mesh/nx3=64",
        "parthenon/mesh/x3min=-1.0", "parthenon/mesh/x3max=1.0",
        "problem/symmetry=spherical", "problem/samples=20",
    ],
    "sph": [
        "artemis/coordinates=spherical",
        "parthenon/mesh/x1min=0.0", "parthenon/mesh/x1max=1.0",
        "parthenon/mesh/nx1=1024", "parthenon/mesh/nx2=1",
        "parthenon/mesh/x2min=0.0", f"parthenon/mesh/x2max={math.pi:.16f}",
        "parthenon/mesh/x3min=-0.5", "parthenon/mesh/x3max=0.5",
        "parthenon/mesh/ix1_bc=reflecting",
        "problem/symmetry=spherical", "problem/samples=0",
    ],
}


def _l2_pressure(geom, sim):
    table = DAT2 if geom in ("cart", "cyl") else DAT3
    pf = interp1d(table[:, 0], table[:, 3])
    w = np.asarray(sim.state["gas"]["w"][0])  # (rho, v1, v2, v3, p, sie)
    pres = w[4]
    x1v, x2v, x3v = sim.grid.cell_centers()
    if geom == "cart3d":
        rr = np.sqrt(x1v**2 + x2v**2 + x3v**2)
        rr = np.broadcast_to(rr, pres.shape)
    elif geom in ("cart", "axi"):
        rr = np.sqrt(x1v**2 + x2v**2)
        rr = np.broadcast_to(rr, pres.shape)
    else:
        rr = np.broadcast_to(x1v, pres.shape)
    inb = rr <= table[:, 0].max()
    pans = pf(np.clip(rr, table[0, 0], table[:, 0].max()))
    return float(np.sqrt(((pres - pans)[inb] ** 2).mean()))


def _run(geom, tmp_path, flux="hlle", recon="plm"):
    sim = run_deck(
        DECK,
        ARGS[geom] + [f"gas/reconstruct={recon}", f"gas/riemann={flux}",
                      f"parthenon/job/problem_id=blast_{geom}"],
        str(tmp_path),
    )
    l2 = _l2_pressure(geom, sim)
    assert np.isfinite(l2)
    assert l2 < 1.0, f"{geom}: pressure L2 {l2:g} >= 1.0"


@pytest.mark.parametrize("geom", ["sph", "cyl"])
def test_blast_1d(geom, tmp_path):
    _run(geom, tmp_path)


@pytest.mark.slow
@pytest.mark.parametrize("geom", ["cart", "axi"])
def test_blast_2d(geom, tmp_path):
    _run(geom, tmp_path)


@pytest.mark.slow
def test_blast_3d_cart(tmp_path):
    """3-D Cartesian Sedov with the spherical sub-cell energy deposit
    (reference blast.hpp compute_overlap_sph, Cartesian branch)."""
    _run("cart3d", tmp_path)
