"""Physics regressions for the deck-inventory configurations
(reference: inputs/linwave/linear_wave_amr.in, inputs/disk/disk_cart.in,
inputs/disk/cb_disk.in, inputs/disk/disk_collision.in and their test
families tst/scripts/{hydro,disk,collisions}/)."""

import os

import numpy as np
import pytest

from artemis_tpu.simulation import Simulation

from .utils import load_errs

HERE = os.path.dirname(__file__)
INP = os.path.join(HERE, "..", "inputs")


def test_linear_wave_amr(tmp_path):
    """The refined linear wave converges like the unrefined run: the wave
    crosses the 2x patch and returns with plm-level L1 error (reference
    linear_wave_amr.in; thresholds scale from linwave.py:99-102)."""
    deck = os.path.join(INP, "linear_wave_amr.in")
    s_amr = Simulation(deck, overrides=[], data_dir=str(tmp_path / "amr"))
    s_amr.run()
    err_amr = load_errs(str(tmp_path / "amr"), "linear_wave_amr")[0, 4]

    s_ref = Simulation(deck, overrides=["parthenon/mesh/refinement=none"],
                       data_dir=str(tmp_path / "ref"))
    s_ref.run()
    err_ref = load_errs(str(tmp_path / "ref"), "linear_wave_amr")[0, 4]

    assert np.isfinite(err_amr)
    # refinement must not degrade the solution (prolongation/flux-correction
    # errors stay below the truncation error of the coarse run)
    assert err_amr <= 1.5 * err_ref, \
        f"AMR L1 {err_amr:g} vs unrefined {err_ref:g}"


def test_disk_cart_equilibrium(tmp_path):
    """Keplerian disk on a CARTESIAN grid holds its equilibrium with a
    static refinement patch over the inner disk (reference disk_cart.in
    uses static_refinement; disk.py:42 threshold)."""
    deck = os.path.join(INP, "disk_cart.in")
    sim = Simulation(deck, overrides=[
        "parthenon/time/nlim=5",
        "parthenon/mesh/nx1=64",
        "parthenon/mesh/nx2=64",
        "parthenon/mesh/refinement=static",
        "parthenon/static_refinement1/level=1",
        "parthenon/static_refinement1/x1min=-1.2",
        "parthenon/static_refinement1/x1max=1.2",
        "parthenon/static_refinement1/x2min=-1.2",
        "parthenon/static_refinement1/x2max=1.2",
    ], data_dir=str(tmp_path))
    w0 = np.asarray(sim.problem.prims["gas"][0])
    sim.run()
    w = np.asarray(sim.state["gas"]["w"][0])
    assert not np.isnan(w).any()
    d0, d = w0[0], w[0]
    # only the disk body (the IC floors the far field): weight by density
    err = np.sqrt((d0 * (d - d0) ** 2).sum()) / d0.sum()
    assert err <= 6e-3, f"disk_cart err {err:g}"


def test_cb_disk(tmp_path):
    """Circumbinary disk: live binary + nbody-referenced cooling + cavity
    (reference cb_disk.in; binary.py:96-131 orbital-drift thresholds)."""
    deck = os.path.join(INP, "cb_disk.in")
    sim = Simulation(deck, overrides=[
        "parthenon/time/nlim=10",
        "parthenon/mesh/nx1=128",
        "parthenon/mesh/nx2=128",
    ], data_dir=str(tmp_path))
    nb = sim.nbody

    def binary_elements():
        m1, m2 = nb.m[0], nb.m[1]
        dr = nb.pos[1] - nb.pos[0]
        dv = nb.vel[1] - nb.vel[0]
        gm = nb.G * (m1 + m2)
        r = np.linalg.norm(dr)
        v2 = np.dot(dv, dv)
        a = 1.0 / (2.0 / r - v2 / gm)
        hvec = np.cross(dr, dv)
        e = np.sqrt(max(0.0, 1.0 + (v2 - 2.0 * gm / r)
                        * np.dot(hvec, hvec) / gm**2))
        return a, e

    a0, e0 = binary_elements()
    sim.run()
    a1, e1 = binary_elements()
    w = np.asarray(sim.state["gas"]["w"][0])
    assert not np.isnan(w).any()
    assert (w[0] > 0).all()
    # binary orbital elements hold over the short run (binary.py: da<=2e-4)
    assert abs(a1 - a0) / a0 <= 2e-4, f"da/a {abs(a1-a0)/a0:g}"
    assert abs(e1 - e0) <= 5e-3, f"de {abs(e1-e0):g}"


def test_disk_collision(tmp_path):
    """20-planet disk with merge-on-collision: particle mass bookkeeping is
    exact whether or not merges occur (reference collisions.py:84)."""
    deck = os.path.join(INP, "disk_collision.in")
    sim = Simulation(deck, overrides=[
        "parthenon/time/nlim=5",
        "parthenon/mesh/nx1=64",
        "parthenon/mesh/nx2=128",
    ], data_dir=str(tmp_path))
    nb = sim.nbody
    m_tot0 = float(np.sum(nb.m * nb.alive))
    n_alive0 = int(np.sum(nb.alive))
    assert n_alive0 >= 20  # star + planets
    sim.run()
    m_tot1 = float(np.sum(nb.m * nb.alive))
    assert abs(m_tot1 - m_tot0) / m_tot0 < 1e-12, \
        "particle mass not conserved through merges"
    w = np.asarray(sim.state["gas"]["w"][0])
    assert not np.isnan(w).any()
    assert (w[0] > 0).all()


def test_disk_rhd_amr(tmp_path):
    """North-star composition (BASELINE.md): Cartesian Keplerian disk +
    static refinement patch + gray FLD radiation.  The radiative disk must
    hold its rotational equilibrium (disk.py:42-class threshold) with the
    per-level radiation solves active, and Er must stay finite/positive."""
    deck = os.path.join(INP, "disk_rhd_amr.in")
    sim = Simulation(deck, overrides=[
        "parthenon/time/nlim=5",
        "parthenon/mesh/nx1=64",
        "parthenon/mesh/nx2=64",
        "parthenon/mesh/nx3=16",
    ], data_dir=str(tmp_path))
    w0 = np.asarray(sim.problem.prims["gas"][0]).copy()
    sim.run()
    w = np.asarray(sim.state["gas"]["w"][0])
    assert np.isfinite(w).all()
    d0, d = w0[0], w[0]
    err = np.sqrt((d0 * (d - d0) ** 2).sum()) / d0.sum()
    assert err <= 6e-3, f"disk_rhd_amr err {err:g}"
    Er = np.asarray(sim.state["rad"]["Er"])
    assert np.isfinite(Er).all() and (Er > 0).all()


def test_dt_guards_halt_runaway(tmp_path):
    """<parthenon/time> dt_min/dt_max runaway guards halt with an error
    when the CFL timestep leaves their range (running.rst:46-56)."""
    deck = os.path.join(INP, "linwave.in")
    base = [
        "parthenon/mesh/nx1=16", "parthenon/mesh/nx2=8",
        "parthenon/mesh/nx3=8", "parthenon/mesh/nghost=2",
        "parthenon/time/nlim=4",
    ]
    # dt_min far above any CFL dt -> halt on the first check
    sim = Simulation(deck, overrides=base + ["parthenon/time/dt_min=10.0"],
                     data_dir=str(tmp_path / "lo"))
    with pytest.raises(RuntimeError, match="dt_min"):
        sim.run()
    # dt_max below the CFL dt -> halt too
    sim = Simulation(deck, overrides=base + ["parthenon/time/dt_max=1e-9"],
                     data_dir=str(tmp_path / "hi"))
    with pytest.raises(RuntimeError, match="dt_max"):
        sim.run()
    # in-range guards leave the run untouched
    sim = Simulation(deck, overrides=base + [
        "parthenon/time/dt_min=1e-12", "parthenon/time/dt_max=1.0"],
        data_dir=str(tmp_path / "ok"))
    sim.run()
    assert sim.tm.ncycle == 4
