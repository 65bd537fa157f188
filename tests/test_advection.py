"""Gas+dust advection regression (reference: tst/scripts/advection/advection.py).

Checks L1 error magnitude + convergence for gas and both dust species, and
history-file integrals against the reference's expected values
(advection.py:94-128; thresholds :142-146).
"""

import os

import numpy as np
import pytest

from .utils import load_errs, run_deck

DECK = os.path.join(os.path.dirname(__file__), "..", "inputs", "advection.in")


def _args(res, flux):
    return [
        "parthenon/job/problem_id=advection",
        "problem/nperiod=1",
        "parthenon/time/nlim=1000",
        "parthenon/time/integrator=rk2",
        "parthenon/mesh/nghost=4",
        f"parthenon/mesh/nx1={res}",
        f"parthenon/mesh/nx2={res // 2}",
        f"parthenon/mesh/nx3={res // 2}",
        "problem/amp=1.0e-6",
        "gas/reconstruct=plm",
        "dust/reconstruct=plm",
        f"gas/riemann={flux}",
        f"dust/riemann={flux}",
    ]


@pytest.mark.parametrize("flux", ["hlle", "llf"])
def test_advection(flux, tmp_path):
    data = str(tmp_path)
    for res in (16, 32):
        run_deck(DECK, _args(res, flux), data)
    errs = load_errs(data, "advection")
    assert not np.isnan(errs).any()
    # columns: Nx1 Nx2 Nx3 Ncycle rms_gas rms_d1 rms_d2 ...
    for si in range(3):  # gas, dust1, dust2
        n16 = errs[0, 4 + si]
        n32 = errs[1, 4 + si]
        assert n32 <= 2.21e-7, f"species {si} err {n32:g}"
        assert n32 / n16 <= 0.30, f"species {si} conv {n32 / n16:g}"


def test_advection_history(tmp_path):
    """History integrals at t=1 match the reference expectations
    (advection.py:100-117; nbtotal excluded — no mesh blocks here)."""
    data = str(tmp_path)
    run_deck(
        DECK,
        [
            "parthenon/mesh/nghost=4",
            "parthenon/mesh/nx1=32",
            "parthenon/mesh/nx2=16",
            "parthenon/mesh/nx3=16",
            "problem/amp=1.0e-6",
            "gas/riemann=llf",
            "dust/riemann=llf",
        ],
        data,
    )
    from .ahistory import ahistory

    hist = ahistory(os.path.join(data, "advection.out0.hst"))
    expected = {
        "time": 1.0,
        "dt": 1.11612e-02,
        "cycle": 56,
        "gas_mass_0": 6.75,
        "gas_momentum_x1_0": 2.25,
        "gas_momentum_x2_0": 4.5,
        "gas_momentum_x3_0": 4.5,
        "gas_energy_0": 9.45,
        "gas_internal_energy_0": 6.075,
        "dust_mass_0": 6.75,
        "dust_mass_1": 6.75,
        "dust_momentum_x1_0": 2.25,
        "dust_momentum_x1_1": -2.25,
        "dust_momentum_x2_0": 4.5,
        "dust_momentum_x2_1": -4.5,
        "dust_momentum_x3_0": 4.5,
        "dust_momentum_x3_1": -4.5,
    }
    for key, want in expected.items():
        vals = hist.Get(key)
        assert vals is not None and len(vals) == 11, f"{key}: {vals}"
        got = vals[-1]
        assert 2.0 * abs(got - want) / (abs(got) + abs(want)) <= 1.0e-4, \
            f"{key}: {got} != {want}"
