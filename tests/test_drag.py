"""Gas-dust drag regression (reference: tst/scripts/drag/drag.py).

Uniform box, gas moving at v=1 against 4 dust species with stopping times
tau = {1e-2, 0.1, 1, 10}.  The velocity separation must follow the analytic
damped solution exp(-(1+eps) t / tau) to 3e-3, and total momentum must be
conserved to 1e-13 (drag.py:36,109-128).
"""

import os

import numpy as np

from artemis_tpu.simulation import Simulation

DECK = os.path.join(os.path.dirname(__file__), "..", "inputs", "simple_drag.in")

TLIM = 10.0
TAU = [1e-2, 0.1, 1.0, 10.0]


class Sampler:
    """Observer: record vd - vg and total momentum every dt_out."""

    def __init__(self, dt_out=0.05):
        self.dt_out = dt_out
        self.next = dt_out
        self.rows = []

    def __call__(self, state, tm):
        if tm.time < self.next:
            return
        self.next += self.dt_out * (1 + int((tm.time - self.next) / self.dt_out))
        wg = np.asarray(state["gas"]["w"])
        wd = np.asarray(state["dust"]["w"])
        ug = np.asarray(state["gas"]["u"])
        ud = np.asarray(state["dust"]["u"])
        vsep = [float((wd[d, 1] - wg[0, 1]).mean()) for d in range(4)]
        mom = float(ug[0, 1].sum() + ud[:, 1].sum())
        self.rows.append((tm.time, vsep, mom))


def test_simple_dust_drag(tmp_path):
    sim = Simulation(DECK, overrides=[f"parthenon/time/tlim={TLIM:.8f}"],
                     data_dir=str(tmp_path))
    sampler = Sampler()
    sim.run(extra_observers=[sampler])

    dv0 = -1.0
    eps = 0.01 / 10.0
    ans = lambda tc, t: np.exp(-(1.0 + eps) * t / tc) * dv0

    assert len(sampler.rows) > 100
    errs = []
    moms = []
    for (t, vsep, mom) in sampler.rows:
        for d in range(4):
            errs.append(abs(vsep[d] - ans(TAU[d], t)))
        moms.append(mom)
    moms = np.array(moms)
    assert np.max(errs) <= 3e-3, f"max drag err {np.max(errs):g}"
    mom_err = np.max(np.abs(moms / moms[0] - 1.0))
    assert mom_err <= 1e-13, f"momentum drift {mom_err:g}"


DAMP_DECK = """
<artemis>
problem = constant
coordinates = cylindrical

<parthenon/time>
tlim = 1.0
nlim = 2
integrator = rk2

<parthenon/mesh>
nghost = 2
nx1 = 32
x1min = 0.5
x1max = 2.0
ix1_bc = outflow
ox1_bc = outflow
nx2 = 8
x2min = -3.141592653589793
x2max = 3.141592653589793
ix2_bc = periodic
ox2_bc = periodic
nx3 = 1
x3min = -0.5
x3max = 0.5

<physics>
gas = true
viscosity = true
drag = true

<gas>
gamma = 1.4
cfl = 0.5

<gas/viscosity>
type = constant
nu = 1.0e-3

<drag>
type = self

<gas/damping>
inner_x1 = 10.0
inner_x1_rate = 1.0e4
damp_to_visc = %s

<problem>
rho = 1.0
pres = 1.0
"""


def test_damp_to_visc(tmp_path):
    """damp_to_visc relaxes the gas toward the viscous inflow
    v_R = -1.5 nu / R instead of rest (drag.hpp:240-245): with a
    domain-wide strong damping zone, two cycles land the radial velocity
    on the target."""
    sim = Simulation(DAMP_DECK % "true", data_dir=str(tmp_path / "visc"),
                     is_path=False)
    sim.run()
    w = np.asarray(sim.state["gas"]["w"])
    g = sim.grid.geom
    s3, s2, s1 = sim.grid.int_slices
    R = g.xv1[s1][None, None, :]
    v_target = -1.5e-3 / R
    v1 = w[0, 1]
    err = np.max(np.abs(v1 - v_target) / np.abs(v_target))
    assert err < 2e-2, f"viscous-inflow target missed: rel err {err:g}"

    # the option must change the answer: without it the gas damps to rest
    sim0 = Simulation(DAMP_DECK % "false", data_dir=str(tmp_path / "zero"),
                      is_path=False)
    sim0.run()
    v1_zero = np.asarray(sim0.state["gas"]["w"])[0, 1]
    assert np.max(np.abs(v1_zero)) < 0.02 * np.max(np.abs(v_target))
