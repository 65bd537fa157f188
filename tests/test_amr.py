"""Static mesh refinement regression.

A 2-D Sedov blast (cylindrical symmetry) with a 2x fine patch over the
explosion: the refined run must stay conservative across the refinement
boundary and match the semi-analytic sedov2d profile at the same threshold
the unrefined coords test uses (pressure L2 < 1.0, blast.py:118)."""

import os

import numpy as np
import pytest
from scipy.interpolate import interp1d

from artemis_tpu.amr import TwoLevelSMR
from artemis_tpu.config import ParameterInput
from artemis_tpu.driver import Integrator
from artemis_tpu.grid import grid_from_input
from artemis_tpu.ops.hydro import FluidCfg
from artemis_tpu.pgen import build_problem

HERE = os.path.dirname(__file__)
DECK = os.path.join(HERE, "..", "inputs", "blast.in")
DAT2 = np.loadtxt(os.path.join(HERE, "data", "sedov2d.dat"), comments="#")


@pytest.mark.slow
def test_blast_smr(tmp_path):
    pin = ParameterInput.from_file(DECK)
    pin.apply_overrides([
        "parthenon/mesh/nx1=128", "parthenon/mesh/nx2=128",
        "gas/reconstruct=plm", "gas/riemann=hlle",
    ])
    grid = grid_from_input(pin)
    cfg = FluidCfg(fluid="gas", recon="plm", rsolver="hlle",
                   gamma=pin.get_real("gas", "gamma"),
                   cfl=pin.get_real("gas", "cfl"),
                   dfloor=pin.get_real("gas", "dfloor"),
                   siefloor=pin.get_real("gas", "siefloor"))

    # fine patch over the central quarter of the domain
    lo = (32, 32, 0)
    n = (64, 64, 1)
    smr = TwoLevelSMR(grid, Integrator.make("rk2"), cfg, lo, n)

    prob_c = build_problem("blast", pin, grid, cfg)
    pin_f = ParameterInput.from_string(repr(pin))
    prob_f = build_problem("blast", pin_f, smr.fg, cfg)
    sc, sf = smr.initialize(prob_c.prims["gas"], prob_f.prims["gas"])

    # conservation bookkeeping (total mass over the composite grid)
    def totals(sc, sf):
        volc = np.broadcast_to(smr.cg.geom.volume(), smr.cg.shape_entire)[
            smr.cg.int_slices]
        volf = np.broadcast_to(smr.fg.geom.volume(), smr.fg.shape_entire)[
            smr.fg.int_slices]
        uc = np.asarray(sc[0][0])
        uf = np.asarray(sf[0][0])
        mask = np.ones_like(volc)
        psl = smr._patch_slices()
        mask[psl] = 0.0
        m = (uc[0] * volc * mask).sum() + (uf[0] * volf).sum()
        e = (uc[4] * volc * mask).sum() + (uf[4] * volf).sum()
        return m, e

    m0, e0 = totals(sc, sf)
    sc, sf, t, nc = smr.run(sc, sf, tlim=0.1)
    m1, e1 = totals(sc, sf)
    assert abs(m1 - m0) / m0 < 1e-12, f"mass drift {abs(m1 - m0) / m0:g}"
    assert abs(e1 - e0) / e0 < 1e-10, f"energy drift {abs(e1 - e0) / e0:g}"

    # pressure profile vs the sedov table, on the fine level
    pf = interp1d(DAT2[:, 0], DAT2[:, 3])
    wf = np.asarray(sf[1][0])
    pres = wf[4]
    x1v, x2v, _ = smr.fg.cell_centers()
    rr = np.broadcast_to(np.sqrt(x1v**2 + x2v**2), pres.shape)
    inb = rr <= DAT2[:, 0].max()
    pans = pf(np.clip(rr, DAT2[0, 0], DAT2[:, 0].max()))
    l2 = float(np.sqrt(((pres - pans)[inb] ** 2).mean()))
    assert np.isfinite(l2) and l2 < 1.0, f"SMR blast pressure L2 {l2:g}"


def test_adaptive_patch_follows_blast(tmp_path):
    """Adaptive mode: a fixed-shape fine patch re-centers on the refinement
    tags (gradient criterion, gas.cpp:304-383) as the blast expands from an
    off-patch position — and the move is conservative (prolongation
    preserves parent averages; restriction is exact)."""
    pin = ParameterInput.from_file(DECK)
    pin.apply_overrides([
        "parthenon/mesh/nx1=64", "parthenon/mesh/nx2=64",
        "gas/reconstruct=plm", "gas/riemann=hlle",
        # blast centered off the domain center; closed domain so total
        # mass is exactly conserved (isolates AMR conservation)
        "problem/x0=-0.25", "problem/y0=-0.25",
        "parthenon/mesh/ix1_bc=reflecting", "parthenon/mesh/ox1_bc=reflecting",
        "parthenon/mesh/ix2_bc=reflecting", "parthenon/mesh/ox2_bc=reflecting",
    ])
    grid = grid_from_input(pin)
    cfg = FluidCfg(fluid="gas", recon="plm", rsolver="hlle",
                   gamma=pin.get_real("gas", "gamma"),
                   cfl=pin.get_real("gas", "cfl"),
                   dfloor=pin.get_real("gas", "dfloor"),
                   siefloor=pin.get_real("gas", "siefloor"))

    # patch starts in the wrong corner on purpose
    lo0 = (40, 40, 0)
    n = (16, 16, 1)
    smr = TwoLevelSMR(grid, Integrator.make("rk2"), cfg, lo0, n)

    prob_c = build_problem("blast", pin, grid, cfg)
    pin_f = ParameterInput.from_string(repr(pin))
    prob_f = build_problem("blast", pin_f, smr.fg, cfg)
    sc, sf = smr.initialize(prob_c.prims["gas"], prob_f.prims["gas"])

    def coarse_mass(sc):
        volc = np.broadcast_to(smr.cg.geom.volume(), smr.cg.shape_entire)[
            smr.cg.int_slices]
        # u layout [ns, C, z, y, x]; component 0 = density
        return float((np.asarray(sc[0][:, 0]) * volc).sum())

    m0 = coarse_mass(sc)
    crit = dict(field="pressure", type="gradient", refine_thr=0.3)
    sc, sf, t, ncyc = smr.run(sc, sf, tlim=0.06, criterion=crit,
                              retag_interval=5)
    # the patch must have moved toward the blast (lower-left quadrant)
    assert smr.patch_lo != lo0
    assert smr.patch_lo[0] < 40 and smr.patch_lo[1] < 40
    # coarse grid (which holds the restricted fine solution everywhere
    # under the patch) conserves mass across the moves
    m1 = coarse_mass(sc)
    assert abs(m1 - m0) / m0 < 1e-12
    rho = np.asarray(sc[1][:, 0])
    assert np.isfinite(rho).all() and rho.min() > 0


def test_adaptive_patch_follows_blast_cylindrical(tmp_path):
    """Curvilinear adaptive patch moves: the move rebuilds the fine node's
    geometry (grid, volumes, centroid-aware prolongation weights) at the
    new window, so the refined cylindrical blast keeps exact conservation
    through every relocation (reference: Parthenon adaptive refinement is
    geometry-agnostic; amr_criteria.hpp:28-80)."""
    import math

    pin = ParameterInput.from_file(DECK)
    pin.apply_overrides([
        "artemis/coordinates=cylindrical",
        "parthenon/mesh/nx1=64", "parthenon/mesh/nx2=64",
        "parthenon/mesh/x1min=1.0", "parthenon/mesh/x1max=5.0",
        "parthenon/mesh/x2min=0.0",
        f"parthenon/mesh/x2max={0.5 * math.pi:.16f}",
        # closed domain so total mass is exactly conserved
        "parthenon/mesh/ix1_bc=reflecting", "parthenon/mesh/ox1_bc=reflecting",
        "parthenon/mesh/ix2_bc=reflecting", "parthenon/mesh/ox2_bc=reflecting",
        "gas/reconstruct=plm", "gas/riemann=hlle", "gas/gamma=1.4",
        "problem/radius=0.15", "problem/height=1.0",
        "problem/symmetry=cylindrical", "problem/samples=0",
        # blast at low r / low phi; the patch starts in the far corner
        "problem/x1=1.8", f"problem/x2={0.1 * math.pi:.16f}",
    ])
    grid = grid_from_input(pin)
    cfg = FluidCfg(fluid="gas", recon="plm", rsolver="hlle",
                   gamma=pin.get_real("gas", "gamma"),
                   cfl=pin.get_real("gas", "cfl"),
                   dfloor=pin.get_real("gas", "dfloor"),
                   siefloor=pin.get_real("gas", "siefloor"))
    lo0 = (42, 42, 0)
    n = (16, 16, 1)
    smr = TwoLevelSMR(grid, Integrator.make("rk2"), cfg, lo0, n)
    assert smr.curv

    prob_c = build_problem("blast", pin, grid, cfg)
    pin_f = ParameterInput.from_string(repr(pin))
    prob_f = build_problem("blast", pin_f, smr.fg, cfg)
    sc, sf = smr.initialize(prob_c.prims["gas"], prob_f.prims["gas"])

    volc = np.broadcast_to(smr.cg.geom.volume(), smr.cg.shape_entire)[
        smr.cg.int_slices]

    def mass(sc):
        return float((np.asarray(sc[0][:, 0]) * volc).sum())

    m0 = mass(sc)
    crit = dict(field="pressure", type="gradient", refine_thr=0.3)
    sc, sf, t, ncyc = smr.run(sc, sf, tlim=0.05, criterion=crit,
                              retag_interval=5)
    # the patch must have moved toward the blast (low r, low phi)
    assert smr.patch_lo != lo0
    assert smr.patch_lo[0] < 42 and smr.patch_lo[1] < 42
    # the fine node's geometry followed the move: its inner edge is the
    # coarse face at the new origin
    node = smr.ml.nodes[1]
    ngc = grid.ng[0]
    assert node.grid.xmin[0] == pytest.approx(
        float(grid.geom.xf1[ngc + smr.patch_lo[0]]), rel=0, abs=1e-14)
    # volume-weighted restriction + centroid-aware re-prolongation keep
    # the composite mass exact across the moves
    m1 = mass(sc)
    assert abs(m1 - m0) / m0 < 1e-12, f"mass drift {(m1 - m0) / m0:.3e}"
    rho = np.asarray(sc[1][:, 0])
    assert np.isfinite(rho).all() and rho.min() > 0


def test_deck_driven_adaptive(tmp_path):
    """<parthenon/mesh> refinement=adaptive wiring through Simulation/CLI
    (blast_amr deck): the SMRDriver adapter runs under evolve() and the
    patch migrates toward the off-center blast.  style=move pinned:
    criterion decks now DEFAULT to tiled spawn/destroy (reference
    semantics, covered by test_amr_adaptive) — this test checks the
    MOVE-style re-centering machinery specifically."""
    from artemis_tpu.simulation import Simulation

    deck = os.path.join(HERE, "..", "inputs", "blast_amr.in")
    sim = Simulation(deck, overrides=["parthenon/time/tlim=0.03",
                                      "parthenon/refinement/style=move"],
                     data_dir=str(tmp_path))
    lo0 = tuple(int(v) for v in np.asarray(sim.driver._los[1]))
    sim.run()
    assert sim.tm.time >= 0.03 * (1 - 1e-12)
    lo1 = tuple(int(v) for v in np.asarray(sim.driver._los[1]))
    assert lo1 != lo0 and lo1[0] < lo0[0] and lo1[1] < lo0[1]
    # history output written with finite totals
    hst = [f for f in os.listdir(tmp_path) if f.endswith(".hst")]
    assert hst
    data = np.loadtxt(os.path.join(tmp_path, hst[0]), ndmin=2)
    assert np.isfinite(data).all()


@pytest.mark.slow
def test_blast_smr_cylindrical(tmp_path):
    """Static two-level refinement in cylindrical geometry (the reference's
    blast_amr.in configuration): volume-weighted restriction, area-weighted
    flux correction, and centroid-aware prolongation keep the off-axis blast
    conservative and matching the sedov2d profile."""
    import math

    pin = ParameterInput.from_file(DECK)
    pin.apply_overrides([
        "artemis/coordinates=cylindrical",
        "parthenon/mesh/nx1=128", "parthenon/mesh/nx2=128",
        "parthenon/mesh/x1min=1.0", "parthenon/mesh/x1max=5.0",
        "parthenon/mesh/x2min=0.0",
        f"parthenon/mesh/x2max={0.5 * math.pi:.16f}",
        "parthenon/mesh/ix1_bc=outflow", "parthenon/mesh/ox1_bc=outflow",
        "parthenon/mesh/ix2_bc=outflow", "parthenon/mesh/ox2_bc=outflow",
        "gas/reconstruct=plm", "gas/riemann=hlle", "gas/gamma=1.4",
        "problem/radius=0.1", "problem/height=1.0",
        "problem/symmetry=cylindrical", "problem/samples=0",
        "problem/x1=2.5", f"problem/x2={0.25 * math.pi:.16f}",
    ])
    grid = grid_from_input(pin)
    cfg = FluidCfg(fluid="gas", recon="plm", rsolver="hlle",
                   gamma=pin.get_real("gas", "gamma"),
                   cfl=pin.get_real("gas", "cfl"),
                   dfloor=pin.get_real("gas", "dfloor"),
                   siefloor=pin.get_real("gas", "siefloor"))
    # fine patch over the blast (cells r~2.0-3.1, phi around pi/4)
    lo = (32, 32, 0)
    n = (64, 64, 1)
    smr = TwoLevelSMR(grid, Integrator.make("rk2"), cfg, lo, n)
    assert smr.curv

    prob_c = build_problem("blast", pin, grid, cfg)
    pin_f = ParameterInput.from_string(repr(pin))
    prob_f = build_problem("blast", pin_f, smr.fg, cfg)
    sc, sf = smr.initialize(prob_c.prims["gas"], prob_f.prims["gas"])

    volc = np.broadcast_to(smr.cg.geom.volume(), smr.cg.shape_entire)[
        smr.cg.int_slices]

    def mass(sc):
        return float((np.asarray(sc[0][:, 0]) * volc).sum())

    m0 = mass(sc)
    sc, sf, t, nc = smr.run(sc, sf, tlim=0.1)
    # blast stays inside the domain -> exact conservation across the
    # refinement boundary (flux correction + volume-weighted restriction)
    m1 = mass(sc)
    assert abs(m1 - m0) / m0 < 1e-12, f"mass drift {m1 - m0:.3e}"

    # composite solution vs the semi-analytic sedov2d profile (same table
    # and threshold as the unrefined coords test: pressure L2 < 1.0)
    from scipy.interpolate import interp1d

    w = np.asarray(sc[1][0])
    rho, p = w[0, 0], w[4, 0]
    x1 = smr.cg.geom.xv1[smr.cg.int_slices[2]][None, :]
    x2 = smr.cg.geom.xv2[smr.cg.int_slices[1]][:, None]
    x = x1 * np.cos(x2)
    y = x1 * np.sin(x2)
    xc, yc = 2.5 * math.cos(0.25 * math.pi), 2.5 * math.sin(0.25 * math.pi)
    rr = np.hypot(x - xc, y - yc)
    pf = interp1d(DAT2[:, 0], DAT2[:, 3])
    inb = rr <= DAT2[:, 0].max()
    pans = pf(np.clip(rr, DAT2[0, 0], DAT2[:, 0].max()))
    l2 = float(np.sqrt(((p - pans)[inb] ** 2).mean()))
    assert l2 < 1.0, f"pressure L2 {l2:g}"
    assert np.isfinite(p).all() and p.min() > 0
    assert rho.max() > 2.0  # a strong cylindrical shock formed


def test_deck_driven_amr_user(tmp_path):
    """<artemis> amr_user: a problem-provided criterion replaces the <gas>
    refine_* keys (ProblemCheckRefinementBlock registration,
    artemis.cpp:149-150); pgens without one fail with a clear error (the
    reference's only pgen implementation, disk.hpp:818-823, is a fail
    stub, so every reference deck with amr_user=true errors the same way)."""
    from artemis_tpu.simulation import Simulation

    deck = os.path.join(HERE, "..", "inputs", "blast_amr.in")
    with pytest.raises(ValueError, match="amr_user"):
        Simulation(deck, overrides=["artemis/amr_user=true"],
                   data_dir=str(tmp_path / "err"))

    # a problem-defined criterion drives the adaptive moves end-to-end
    # (style=move pinned: tiled is the criterion-deck default now and
    # pool tiles spawn/destroy instead of migrating)
    sim = Simulation(deck, overrides=["parthenon/time/tlim=0.03",
                                      "parthenon/refinement/style=move"],
                     data_dir=str(tmp_path))

    def crit(w, grid):
        p = np.asarray(w)[:, 4].max(axis=0)
        return p > 0.5 * (p.min() + p.max())

    sim.driver.criterion = None
    sim.driver.user_criterion = crit
    lo0 = tuple(int(v) for v in np.asarray(sim.driver._los[1]))
    sim.run()
    lo1 = tuple(int(v) for v in np.asarray(sim.driver._los[1]))
    assert lo1 != lo0 and lo1[0] < lo0[0] and lo1[1] < lo0[1]
