"""Disk equilibrium regression (reference: tst/scripts/disk/disk.py).

5 cycles of the viscous sub-Keplerian disk in each geometry x {isothermal,
polytropic} x {ic, extrap} boundaries: no NaNs/negatives, dt in
[1e-4, 3e-2], and the density-weighted L2 deviation from the IC <= 6e-3
(disk.py:42,178-180).
"""

import os

import numpy as np
import pytest

from .utils import run_deck

HERE = os.path.dirname(__file__)

DIRECTIONS = {"cyl": ["x1", "x3"], "sph": ["x1", "x2"], "axi": ["x1", "x2"]}


def _run_case(geom, gamma, bc, tmp_path):
    deck = os.path.join(HERE, "..", "inputs", f"disk_{geom}.in")
    args = [
        "parthenon/time/nlim=5",
        f"problem/polytropic_index={gamma:.2f}",
        "gas/de_switch=" + str(0.0 if geom != "sph" else 1e-2),
    ]
    for d in DIRECTIONS[geom]:
        args += [f"parthenon/mesh/i{d}_bc={bc}", f"parthenon/mesh/o{d}_bc={bc}"]
    sim = run_deck(deck, args, str(tmp_path))
    w0 = np.asarray(sim.problem.prims["gas"][0])
    w = np.asarray(sim.state["gas"]["w"][0])
    d0, d = w0[0], w[0]
    T = w[5] / sim.gas_cfg.cv
    assert not np.isnan(w).any(), "NaN in primitives"
    assert (d > 0).all(), "negative density"
    assert (T > 0).all(), "negative temperature"
    assert 1e-4 < sim.tm.dt < 3e-2, f"dt {sim.tm.dt:g} out of range"
    err = np.sqrt((d0 * (d - d0) ** 2).sum()) / d0.sum()
    assert err <= 6e-3, f"disk_{geom} gam={gamma} bc={bc}: err {err:g}"


@pytest.mark.parametrize("geom,gamma,bc", [
    ("axi", 1.0, "ic"),
    ("axi", 1.4, "extrap"),
    ("cyl", 1.0, "extrap"),
])
def test_disk(geom, gamma, bc, tmp_path):
    _run_case(geom, gamma, bc, tmp_path)


@pytest.mark.slow
@pytest.mark.parametrize("geom,gamma,bc", [
    ("axi", 1.0, "extrap"), ("axi", 1.4, "ic"),
    ("cyl", 1.0, "ic"), ("cyl", 1.4, "ic"), ("cyl", 1.4, "extrap"),
    ("sph", 1.0, "ic"), ("sph", 1.4, "ic"),
    ("sph", 1.0, "extrap"), ("sph", 1.4, "extrap"),
])
def test_disk_full(geom, gamma, bc, tmp_path):
    _run_case(geom, gamma, bc, tmp_path)


def test_disk_sph_smoke(tmp_path):
    """Fast spherical-geometry gate (the full-res sph cases are in the
    slow set): half-resolution disk_sph for 5 cycles must hold the same
    equilibrium threshold — catches spherical-path breaks in the default
    suite."""
    deck = os.path.join(HERE, "..", "inputs", "disk_sph.in")
    sim = run_deck(deck, [
        "parthenon/time/nlim=5",
        "parthenon/mesh/nx1=64", "parthenon/mesh/nx2=32",
        "parthenon/mesh/nx3=32",
        "gas/de_switch=1e-2",
    ], str(tmp_path))
    w0 = np.asarray(sim.problem.prims["gas"][0])
    w = np.asarray(sim.state["gas"]["w"][0])
    d0, d = w0[0], w[0]
    assert not np.isnan(w).any() and (d > 0).all()
    err = np.sqrt((d0 * (d - d0) ** 2).sum()) / d0.sum()
    assert err <= 6e-3, f"disk_sph smoke err {err:g}"
