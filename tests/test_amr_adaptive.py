"""Tag-driven spawn/destroy adaptivity (MultiLevelSMR.regrid_tiles).

The reference tags cells every cycle and Parthenon creates/destroys/
redistributes refined MeshBlocks (parthenon::Refinement::Tag,
artemis_driver.cpp:292; criteria amr_criteria.hpp:28-96).  The TPU-native
recast is a fixed tile lattice whose level-1 patches spawn where refine
tags land and drop where the derefine criterion clears them — every patch
is a static-shape XLA program, so only the patch SET changes at regrid.

Gates: an off-center blast whose refined coverage GROWS as the shock
expands (not just re-centers), exact (1e-12) mass conservation across
spawns/destroys, and the sedov2d profile at the coords-test threshold.
"""

import os

import numpy as np
import pytest
from scipy.interpolate import interp1d

import jax.numpy as jnp

from artemis_tpu.amr import MultiLevelSMR
from artemis_tpu.config import ParameterInput
from artemis_tpu.driver import Integrator
from artemis_tpu.grid import grid_from_input
from artemis_tpu.ops.hydro import FluidCfg

HERE = os.path.dirname(__file__)
DECK = os.path.join(HERE, "..", "inputs", "blast_amr.in")
DAT2 = np.loadtxt(os.path.join(HERE, "data", "sedov2d.dat"), comments="#")

TILED = [
    "parthenon/refinement/style=tiled",
    "parthenon/refinement/tile_nx1=16",
    "parthenon/refinement/tile_nx2=16",
]


def _pool(drv):
    return [nd for nd in drv.smr.nodes if getattr(nd, "pool", False)]


def _total_mass(sim):
    grid = sim.grid
    vol = np.broadcast_to(grid.geom.volume(), grid.shape_entire)[
        grid.int_slices]
    return float((np.asarray(sim.state["gas"]["u"][0, 0]) * vol).sum())


def _bump_states(ml, cfg, centers):
    """Root state with sharp density squares at the given (y, x) cells."""
    w = np.ones((1, 6, 1, 32, 32))
    w[:, 1:4] = 0.0
    for (cy, cx) in centers:
        w[:, 0, :, cy:cy + 4, cx:cx + 4] = 4.0
    w[:, 4] = 1.0
    w[:, 5] = w[:, 4] / ((cfg.gamma - 1.0) * w[:, 0])
    u, wj = ml.root.hydro.prim_to_cons(jnp.asarray(w), cfg)
    return [{"gas": {"u": u, "w": wj}}]


def _make_ml():
    pin = ParameterInput.from_file(os.path.join(HERE, "..", "inputs",
                                                "blast.in"))
    pin.apply_overrides(["parthenon/mesh/nx1=32", "parthenon/mesh/nx2=32"])
    grid = grid_from_input(pin)
    cfg = FluidCfg(fluid="gas", recon="plm", rsolver="hlle", gamma=1.4,
                   cfl=0.3)
    return MultiLevelSMR(grid, Integrator.make("rk2"), cfg, patches=[],
                         moving_patches=True), cfg


CRIT = dict(field="density", type="gradient", refine_thr=0.5, deref_thr=0.1)


def _make_ml_periodic():
    """32^2 periodic box (constant pgen deck dialect) for exact-invariant
    conservation checks."""
    from artemis_tpu.config import ParameterInput as PI

    box = """
<artemis>
problem = constant
coordinates = cartesian
<parthenon/time>
tlim = 1.0
<parthenon/mesh>
nghost = 2
nx1 = 32
x1min = -1.0
x1max = 1.0
ix1_bc = periodic
ox1_bc = periodic
nx2 = 32
x2min = -1.0
x2max = 1.0
ix2_bc = periodic
ox2_bc = periodic
nx3 = 1
x3min = -0.25
x3max = 0.25
<gas>
gamma = 1.4
<problem>
rho = 1.0
pres = 1.0
"""
    pin = PI.from_string(box)
    grid = grid_from_input(pin)
    cfg = FluidCfg(fluid="gas", recon="plm", rsolver="hlle", gamma=1.4,
                   cfl=0.3)
    return MultiLevelSMR(grid, Integrator.make("rk2"), cfg, patches=[],
                         moving_patches=True), cfg, grid


def test_tiled_pool_seam_conservation():
    """Four ADJACENT pool tiles conserve mass to roundoff: sibling
    fine-ghost links apply to lattice-static pool tiles even on a
    moving tree (_links_static), so tile-tile seams see fine data
    instead of prolonged-coarse values (Parthenon same-level boundary
    buffers; without the exchange a 4-tile pool drifted ~4e-4)."""
    ml, cfg, grid = _make_ml_periodic()
    # sharp square spanning the corner where 4 tiles meet (tile 8x8,
    # lattice anchored at the rim: lo in {2, 10, 18})
    w = np.ones((1, 6, 1, 32, 32))
    w[:, 1:4] = 0.0
    w[:, 0, :, 14:20, 14:20] = 4.0
    w[:, 4] = 1.0
    w[:, 4, :, 14:20, 14:20] = 10.0
    w[:, 5] = w[:, 4] / ((cfg.gamma - 1.0) * w[:, 0])
    u, wj = ml.root.hydro.prim_to_cons(jnp.asarray(w), cfg)
    states = [{"gas": {"u": u, "w": wj}}]
    states, los = ml.regrid_tiles(states, [None], CRIT, (8, 8, 1))
    pool = [nd for nd in ml.nodes if getattr(nd, "pool", False)]
    assert len(pool) == 4, f"expected a 2x2 tile pool, got {len(pool)}"
    # every tile links to its 3 siblings
    for nd in pool:
        assert len(ml._sib_links[nd.index]) == 3

    vol = np.broadcast_to(grid.geom.volume(), grid.shape_entire)[
        grid.int_slices]

    def mass(st):
        return float((np.asarray(st[0]["gas"]["u"][0, 0]) * vol).sum())

    m0 = mass(states)
    dt = 0.8 * float(ml._dt(states))
    for _ in range(20):
        states = ml._step(states, jnp.asarray(dt), jnp.asarray(0.0), los,
                          None)
    drift = abs(mass(states) - m0) / m0
    assert drift < 1e-12, f"pool seam mass drift {drift:.3e}"


def test_tiled_spawn_growth_and_state():
    """Tiles spawn over tagged features, ADD more when a second feature
    appears (growth, not relocation), and carry prolonged fine data."""
    ml, cfg = _make_ml()
    states = _bump_states(ml, cfg, [(12, 12)])
    states, los = ml.regrid_tiles(states, [None], CRIT, (8, 8, 1))
    pool1 = [nd for nd in ml.nodes if getattr(nd, "pool", False)]
    assert pool1, "no tiles spawned"
    los1 = {nd.lo for nd in pool1}
    rho_f = np.asarray(states[pool1[0].index]["gas"]["w"][0, 0])
    assert rho_f.max() > 1.5, "spawned tile missing prolonged data"

    # a second, disjoint feature appears: coverage GROWS, old tiles stay
    states[0] = _bump_states(ml, cfg, [(12, 12), (22, 22)])[0]
    states, los = ml.regrid_tiles(states, los, CRIT, (8, 8, 1))
    pool2 = [nd for nd in ml.nodes if getattr(nd, "pool", False)]
    los2 = {nd.lo for nd in pool2}
    assert len(pool2) > len(pool1), "coverage did not grow"
    assert los1 <= los2, "existing tiles were dropped while still tagged"
    # surviving tiles kept their state object (bit-exact survival)
    for nd in pool2:
        if nd.lo in los1:
            assert np.asarray(states[nd.index]["gas"]["w"][0, 0]).max() > 1.5


def test_tiled_derefinement():
    """Tiles drop when every covered cell satisfies the derefine
    criterion (deref_thr), and absent one they persist (hysteresis)."""
    ml, cfg = _make_ml()
    states = _bump_states(ml, cfg, [(12, 12)])
    states, los = ml.regrid_tiles(states, [None], CRIT, (8, 8, 1))
    assert [nd for nd in ml.nodes if getattr(nd, "pool", False)]

    # smooth the root field -> every cell passes the deref criterion
    states[0] = _bump_states(ml, cfg, [])[0]
    states, los = ml.regrid_tiles(states, los, CRIT, (8, 8, 1))
    assert not [nd for nd in ml.nodes if getattr(nd, "pool", False)], \
        "tiles survived a fully-derefined field"
    assert len(states) == len(ml.nodes) == 1

    # without deref_thr the tiles persist (refine-only hysteresis)
    crit = dict(CRIT, deref_thr=0.0)
    states = _bump_states(ml, cfg, [(12, 12)])
    states, los = ml.regrid_tiles(states, [None], crit, (8, 8, 1))
    n1 = len(ml.nodes)
    states[0] = _bump_states(ml, cfg, [])[0]
    states, los = ml.regrid_tiles(states, los, crit, (8, 8, 1))
    assert len(ml.nodes) == n1, "tiles dropped without a deref criterion"


def test_tiled_multilevel_spawn_and_conservation():
    """numlevel=3 tile pools: a second regrid pass spawns level-2 tiles
    INSIDE tagged level-1 tiles (each nested in its exact parent), the
    3-level composite conserves mass to roundoff on a periodic box, and
    derefinement is nested (a level-1 tile with live children survives
    its own deref tag; reference numlevel semantics running.rst:87)."""
    ml, cfg, grid = _make_ml_periodic()
    w = np.ones((1, 6, 1, 32, 32))
    w[:, 1:4] = 0.0
    w[:, 0, :, 14:18, 14:18] = 4.0
    w[:, 4] = 1.0
    w[:, 4, :, 14:18, 14:18] = 10.0
    w[:, 5] = w[:, 4] / ((cfg.gamma - 1.0) * w[:, 0])
    u, wj = ml.root.hydro.prim_to_cons(jnp.asarray(w), cfg)
    states = [{"gas": {"u": u, "w": wj}}]
    # pass 1: level-1 tiles; pass 2: level-2 tiles inside them
    states, los = ml.regrid_tiles(states, [None], CRIT, (8, 8, 1),
                                  numlevel=3)
    states, los = ml.regrid_tiles(states, los, CRIT, (8, 8, 1), numlevel=3)
    lv1 = [nd for nd in ml.nodes if getattr(nd, "pool", False)
           and nd.level == 1]
    lv2 = [nd for nd in ml.nodes if getattr(nd, "pool", False)
           and nd.level == 2]
    assert lv1 and lv2, (len(lv1), len(lv2))
    for nd in lv2:
        assert nd.parent in lv1
        assert np.asarray(states[nd.index]["gas"]["w"][0, 0]).max() > 1.5

    vol = np.broadcast_to(grid.geom.volume(), grid.shape_entire)[
        grid.int_slices]

    def mass(st):
        return float((np.asarray(st[0]["gas"]["u"][0, 0]) * vol).sum())

    m0 = mass(states)
    dt = 0.8 * float(ml._dt(states))
    for _ in range(10):
        states = ml._step(states, jnp.asarray(dt), jnp.asarray(0.0), los,
                          None)
    drift = abs(mass(states) - m0) / m0
    assert drift < 1e-12, f"3-level mass drift {drift:.3e}"

    # nested derefinement: smooth field EVERYWHERE (deep tiles tag from
    # their own state) -> level-2 tiles drop first, level-1 tiles
    # survive while they still have children
    for nd in ml.nodes:
        nz, ny, nxc = tuple(reversed(nd.grid.nx))
        wsm = np.ones((1, 6, nz, ny, nxc))
        wsm[:, 1:4] = 0.0
        wsm[:, 4] = 1.0
        wsm[:, 5] = wsm[:, 4] / ((cfg.gamma - 1.0) * wsm[:, 0])
        usm, wsm_j = nd.hydro.prim_to_cons(jnp.asarray(wsm), cfg)
        states[nd.index] = {"gas": {"u": usm, "w": wsm_j}}
    parents_of_lv2 = {id(nd.parent) for nd in lv2}
    states, los = ml.regrid_tiles(states, los, CRIT, (8, 8, 1), numlevel=3)
    assert not [nd for nd in ml.nodes if getattr(nd, "pool", False)
                and nd.level == 2]
    # childless level-1 tiles deref immediately; child-bearing ones
    # survive this pass (nested hysteresis) and go next pass
    survivors = [nd for nd in ml.nodes if getattr(nd, "pool", False)
                 and nd.level == 1]
    assert {id(nd) for nd in survivors} == parents_of_lv2
    states, los = ml.regrid_tiles(states, los, CRIT, (8, 8, 1), numlevel=3)
    assert not [nd for nd in ml.nodes if getattr(nd, "pool", False)]


@pytest.mark.slow
@pytest.mark.parametrize("numlevel", [2, 3])
def test_tiled_blast_conserves(tmp_path, numlevel):
    """Deck-driven tiled adaptivity conserves mass across live
    spawn/destroy regrids, measured on a window where the invariant is
    exact: tlim=0.05 keeps the shock interior to the outflow boundaries
    (by tlim=0.1 it exits and even an UNREFINED run loses 5.8e-2, so no
    AMR gate is meaningful there).  Measured with the sibling-link fix:
    -1.6e-10 (was +1.8e-3 when adjacent tiles evolved against
    prolonged-coarse seams); gate at ~60x measured.  numlevel=3 runs
    the same window with a second tile-pool level live."""
    from artemis_tpu.simulation import Simulation

    sim = Simulation(DECK, overrides=TILED + [
        "parthenon/time/tlim=0.05",
        "parthenon/refinement/check_interval=25",
        f"parthenon/mesh/numlevel={numlevel}",
    ], data_dir=str(tmp_path))
    drv = sim.driver
    assert drv.tiled
    assert _pool(drv), "initial regrid spawned no patches"
    if numlevel >= 3:
        assert [nd for nd in _pool(drv) if nd.level == 2], \
            "pre-evolution passes spawned no level-2 tiles"
    m0 = _total_mass(sim)
    sim.run()
    assert sim.tm.time >= 0.05 * (1 - 1e-12)
    drift = abs(_total_mass(sim) - m0) / m0
    assert drift < 1e-8, f"mass drift {drift:.3e}"


@pytest.mark.slow
@pytest.mark.parametrize("numlevel", [2, 3])
def test_tiled_blast_grows_coverage(tmp_path, numlevel):
    """Off-center Sedov blast under deck-driven tiled adaptivity: the
    refined footprint expands with the shock (growth, not relocation)
    and the composite solution matches the sedov2d profile at the
    coords-test threshold (L2 < 1) — at numlevel=3 with a live second
    pool level (reference numlevel=3 blast, running.rst:87).  No mass
    gate here: with outflow boundaries the shock exits the domain
    before tlim=0.1 — exact conservation is gated on the interior
    window (test_tiled_blast_conserves) and on the periodic pool
    smokes."""
    from artemis_tpu.simulation import Simulation

    sim = Simulation(DECK, overrides=TILED + [
        "parthenon/time/tlim=0.1",
        "parthenon/refinement/check_interval=25",
        f"parthenon/mesh/numlevel={numlevel}",
    ], data_dir=str(tmp_path))
    drv = sim.driver
    assert drv.tiled
    pool0 = _pool(drv)
    assert pool0, "initial regrid spawned no patches"
    los0 = {nd.lo for nd in pool0}

    sim.run()
    assert sim.tm.time >= 0.1 * (1 - 1e-12)
    pool1 = _pool(drv)
    los1 = {nd.lo for nd in pool1}
    assert len(pool1) > len(pool0), \
        f"coverage did not grow: {sorted(los0)} -> {sorted(los1)}"
    assert los1 - los0, "no new tile positions spawned"

    pf = interp1d(DAT2[:, 0], DAT2[:, 3])
    w = np.asarray(sim.state["gas"]["w"][0])
    pres = w[4][0]
    x1v, x2v, _ = sim.grid.cell_centers()
    rr = np.sqrt((x1v + 0.2) ** 2 + (x2v + 0.2) ** 2)[0]
    rr = np.broadcast_to(rr, pres.shape)
    inb = rr <= DAT2[:, 0].max()
    pans = pf(np.clip(rr, DAT2[0, 0], DAT2[:, 0].max()))
    l2 = float(np.sqrt(((pres - pans)[inb] ** 2).mean()))
    assert np.isfinite(l2) and l2 < 1.0, f"pressure L2 {l2:g}"


def test_tiled_restart_roundtrip(tmp_path):
    """A checkpoint written mid-run restores the pool bit-exactly."""
    from artemis_tpu.simulation import Simulation

    sim = Simulation(DECK, overrides=TILED + [
        "parthenon/time/tlim=0.03",
        "parthenon/refinement/check_interval=10",
        "parthenon/output2/file_type=rst",
        "parthenon/output2/dt=0.015",
    ], data_dir=str(tmp_path))
    sim.run()
    rsts = sorted(f for f in os.listdir(tmp_path) if ".rst.npz" in f
                  and "final" in f)
    assert rsts
    pool_before = sorted(nd.lo for nd in _pool(sim.driver))
    assert pool_before

    sim2 = Simulation(DECK, overrides=TILED, data_dir=str(tmp_path),
                      restart=os.path.join(str(tmp_path), rsts[-1]))
    pool_after = sorted(nd.lo for nd in _pool(sim2.driver))
    assert pool_after == pool_before
    for i in range(1, len(sim.driver.smr.nodes)):
        a = np.asarray(sim.driver._states[i]["gas"]["u"])
        b = np.asarray(sim2.driver._states[i]["gas"]["u"])
        assert np.array_equal(a, b), f"node {i} state not bit-exact"


def test_tiled_forced_static_window(tmp_path):
    """<parthenon/static_refinementK> blocks compose with tiled
    adaptivity as FORCED tile windows (Parthenon honors static regions
    under refinement=adaptive: those MeshBlocks stay refined regardless
    of tags, running.rst:121-135) — no standalone patch is spawned (it
    would overlap the pool), and the forced tiles persist even where the
    criterion never fires and the derefine tag is set."""
    from artemis_tpu.simulation import Simulation

    # blast at (-0.2, -0.2); forced window in the far corner (+x, +y)
    sim = Simulation(DECK, overrides=TILED + [
        "parthenon/time/tlim=0.02",
        "parthenon/refinement/check_interval=10",
        "parthenon/static_refinement1/level=1",
        "parthenon/static_refinement1/x1min=0.05",
        "parthenon/static_refinement1/x1max=0.25",
        "parthenon/static_refinement1/x2min=0.05",
        "parthenon/static_refinement1/x2max=0.25",
    ], data_dir=str(tmp_path))
    drv = sim.driver
    assert drv.tiled
    assert drv.forced_windows and drv.forced_windows[0]["level"] == 1
    pool0 = _pool(drv)
    assert pool0

    def covers_forced(pool):
        c0, c1 = drv.forced_windows[0]["c0"], drv.forced_windows[0]["c1"]
        # every forced root cell must fall inside some pool tile
        cov = np.zeros((64, 64), bool)
        for nd in pool:
            if nd.level != 1:
                continue
            t = tuple(nd.grid.nx[d] // 2 for d in range(3))
            cov[nd.lo[1]:nd.lo[1] + t[1], nd.lo[0]:nd.lo[0] + t[0]] = True
        return bool(cov[c0[1]:c1[1], c0[0]:c1[0]].all())

    assert covers_forced(pool0), "forced window not covered on the IC"
    m0 = _total_mass(sim)
    sim.run()
    assert covers_forced(_pool(drv)), "forced tiles were destroyed"
    drift = abs(_total_mass(sim) - m0) / m0
    assert drift < 1e-8, f"mass drift {drift:.3e}"
