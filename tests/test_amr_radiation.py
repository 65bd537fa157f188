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


TWO_PATCH_DECK = """
<artemis>
problem = constant
coordinates = cartesian

<parthenon/time>
tlim = 1.0e-8
nlim = 4
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

<parthenon/static_refinement1>
level = 1
x1min = 0.125
x1max = 0.375
x2min = 0.125
x2max = 0.25

<parthenon/static_refinement2>
level = 1
x1min = 0.5
x1max = 0.75
x2min = 0.25
x2max = 0.375

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


def test_batched_fine_solves_match_sequential(tmp_path, monkeypatch):
    """Two same-shape level-1 patches solve as ONE vmapped union system
    (amr.py _radiation_pass batching); per-element while_loop masking
    must reproduce the sequential per-patch solves to roundoff."""
    import jax.numpy as jnp

    sim = Simulation(TWO_PATCH_DECK, is_path=False, data_dir=str(tmp_path))
    drv = sim.driver
    drv._ensure_states(sim.state)
    smr, los = drv.smr, drv._los
    fine = [n for n in smr.nodes if n.parent is not None]
    assert len(fine) == 2
    assert tuple(fine[0].grid.nx) == tuple(fine[1].grid.nx)

    # knock the radiation field out of equilibrium with distinct ramps
    # per node so the solves are non-trivial and node-distinguishable
    states = [dict(s) for s in smr_states_with_ramps(drv._states)]
    dt = jnp.asarray(2.0e-9)

    calls = []
    for n in smr.nodes:
        orig = n.radiation.step

        def wrapped(st, d, ghosts=None, _o=orig, _n=n, **kw):
            calls.append(_n.index)
            return _o(st, d, ghosts=ghosts, **kw)

        monkeypatch.setattr(n.radiation, "step", wrapped)

    monkeypatch.setenv("ARTEMIS_BATCH_RAD", "0")
    seq = smr._radiation_pass([dict(s) for s in states], dt, los)
    seq_calls = list(calls)
    calls.clear()
    monkeypatch.setenv("ARTEMIS_BATCH_RAD", "1")
    bat = smr._radiation_pass([dict(s) for s in states], dt, los)
    # sequential: root + 2 fine solves; batched: root + ONE vmapped call
    assert len(seq_calls) == 3
    assert len(calls) == 2, "fine patches were not batched"

    for s, b in zip(seq, bat):
        for fl in s:
            for k in s[fl]:
                a = np.asarray(s[fl][k], dtype=np.float64)
                c = np.asarray(b[fl][k], dtype=np.float64)
                scale = np.abs(a).max() + 1e-300
                assert np.max(np.abs(a - c)) / scale < 1e-12, (fl, k)


def smr_states_with_ramps(states):
    """Distinct smooth Er ramps per node (keeps gas untouched)."""
    out = []
    for i, st in enumerate(states):
        st = dict(st)
        Er = np.asarray(st["rad"]["Er"], dtype=np.float64)
        ny, nx = Er.shape[-2], Er.shape[-1]
        yy, xx = np.meshgrid(np.linspace(0, 1, ny), np.linspace(0, 1, nx),
                             indexing="ij")
        ramp = 1.0 + 0.4 * np.sin(2.5 * (xx + 0.3 * i)) * np.cos(1.7 * yy)
        st["rad"] = {"Er": st["rad"]["Er"] * ramp.reshape(
            (1,) * (Er.ndim - 2) + (ny, nx))}
        out.append(st)
    return out
