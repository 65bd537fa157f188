"""Radiation (gray FLD) composed with mesh refinement: per-level solves
coupled through prolonged Dirichlet Er ghost planes + restriction
(the jaybenne photons-cross-refinement-boundaries analogue)."""

import os

import numpy as np

from artemis_tpu.simulation import Simulation

HERE = os.path.dirname(__file__)
INP = os.path.join(HERE, "..", "inputs")

EQ_DECK = """
<artemis>
problem = constant
coordinates = cartesian

<parthenon/time>
tlim = 1.0e-8
nlim = 10
integrator = rk2

<parthenon/mesh>
nghost = 2
refinement = static
nx1 = 64
x1min = 0.0
x1max = 1.0
ix1_bc = reflecting
ox1_bc = reflecting
nx2 = 32
x2min = 0.0
x2max = 0.5
ix2_bc = reflecting
ox2_bc = reflecting
nx3 = 1
x3min = -0.5
x3max = 0.5

<parthenon/refinement>
patch_nx1 = 32
patch_nx2 = 16

<physics>
gas = true
radiation = true

<gas>
gamma = 1.6666666666666667
cfl = 0.4
reconstruct = plm
riemann = hllc

<gas/opacity/absorption>
opacity_model = constant
kappa_a = 1.0

<jaybenne>
dt = 1.0e-10

<problem>
rho = 1.0
pres = 0.6666666666666666
"""


def test_refined_radiative_equilibrium(tmp_path):
    """A uniform gas-radiation equilibrium (Er = a T^4) on a refined mesh
    must stay in equilibrium: any spurious flux at the refinement boundary
    would show up immediately."""
    sim = Simulation(EQ_DECK, is_path=False, data_dir=str(tmp_path))
    drv = sim.driver
    assert drv.smr.nodes[1].radiation is not None
    T0 = np.asarray(sim.state["gas"]["w"][0, 5]) / sim.gas_cfg.cv
    Er0 = np.asarray(sim.state["rad"]["Er"])
    sim.run()
    T1 = np.asarray(sim.state["gas"]["w"][0, 5]) / sim.gas_cfg.cv
    Er1 = np.asarray(sim.state["rad"]["Er"])
    assert np.max(np.abs(T1 / T0 - 1.0)) < 1e-11, "gas T drifted"
    assert np.max(np.abs(Er1 / Er0 - 1.0)) < 1e-11, "Er drifted"
    # the fine level holds the same equilibrium
    Erf = np.asarray(drv._states[1]["rad"]["Er"])
    assert np.max(np.abs(Erf / Er0.max() - 1.0)) < 1e-11


def test_rad_shock_refined_matches_unrefined(tmp_path):
    """The radiative shock with a static refinement patch over the shock
    region tracks the unrefined run (rad_shock deck; the AMR RHD
    composition of the north-star configuration)."""
    deck = os.path.join(INP, "rad_shock.in")
    # equal PHYSICAL time: the fine level halves the global CFL dt, so an
    # equal-ncycle comparison would land at different times
    args = ["parthenon/time/tlim=4.0e-4", "parthenon/mesh/nx1=256"]
    s0 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "uni"))
    s0.run()

    s1 = Simulation(deck, overrides=args + [
        "parthenon/mesh/refinement=static",
        "parthenon/refinement/patch_nx1=128",
    ], data_dir=str(tmp_path / "amr"))
    assert s1.driver.smr.nodes[1].radiation is not None
    s1.run()

    assert abs(s0.tm.time - s1.tm.time) < 1e-12
    for key, kind in (("gas", "w"), ("rad", "Er")):
        a = np.asarray(s0.state[key][kind])
        b = np.asarray(s1.state[key][kind])
        assert np.isfinite(b).all()
        # L1: a max-norm at the (sub-cell-shifted) shock front would
        # compare O(1) jumps; the integrated difference is bounded by the
        # coarse truncation error
        rel = np.abs(a - b).sum() / np.abs(a).sum()
        assert rel < 2e-2, (key, kind, rel)
