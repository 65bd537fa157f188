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
