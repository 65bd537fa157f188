"""Diffusion regressions (reference: tst/scripts/diffusion/).

* viscous_diffusion: a Gaussian vx3 bump spreads as sig^2 = 2 nu t; mean
  abs err <= 1e-8 in 1-D and 2-D (viscous_diffusion.py:42).
* thermal_diffusion: steady conductive profile with a fixed inner heat flux
  in cartesian/axisymmetric/spherical; rel err <= 5e-3
  (thermal_diffusion.py:42).
"""

import math
import os

import numpy as np
import pytest

from .utils import run_deck

HERE = os.path.dirname(__file__)
BUMP = os.path.join(HERE, "..", "inputs", "gaussian_bump.in")
COND = os.path.join(HERE, "..", "inputs", "conduction.in")

_NU = 0.25
_T0 = 0.5
_EPS = 1e-6
_TLIM = 2.0
_NX = 64


@pytest.mark.parametrize("ndim", [1, 2])
def test_viscous_diffusion(ndim, tmp_path):
    sig2 = 2.0 * _NU * _T0
    args = [
        "physics/viscosity=true",
        "physics/conduction=false",
        f"gas/viscosity/nu={_NU:.8e}",
        "problem/vx3_bump={:.16e}".format(_EPS * (2.0 * math.pi * sig2) ** (-0.5 * ndim)),
        "problem/sigma={:.8e}".format(math.sqrt(sig2)),
        "problem/temperature_bump=0.0",
        f"parthenon/time/tlim={_TLIM:.8e}",
        f"parthenon/mesh/nx1={_NX}",
        f"parthenon/mesh/nx2={_NX if ndim == 2 else 1}",
        "parthenon/mesh/nx3=1",
    ]
    sim = run_deck(BUMP, args, str(tmp_path))
    w = np.asarray(sim.state["gas"]["w"][0])
    vx3 = w[3][0]  # [ny, nx]
    x1v, x2v, _ = sim.grid.cell_centers()
    t = sim.tm.time + _T0
    s2 = 2.0 * _NU * t
    if ndim == 1:
        ans = _EPS * (2.0 * math.pi * s2) ** -0.5 * np.exp(-x1v[0, 0] ** 2 / (2 * s2))
        err = np.abs(ans - vx3[0]).mean()
    else:
        dr2 = np.broadcast_to(x1v**2 + x2v**2, vx3[None].shape)[0]
        ans = _EPS * (2.0 * math.pi * s2) ** -1.0 * np.exp(-dr2 / (2 * s2))
        err = np.abs(ans - vx3).mean()
    assert err <= 1e-8, f"{ndim}D viscous diffusion err {err:g}"


_FLUX = 0.01
_KCOND = 0.1
_GTEMP = 0.05


def _tans(x, d):
    f = _FLUX * 0.2**d
    if d == 0:
        return _GTEMP + (x - 1.2) * -f / _KCOND
    if d == 1:
        return _GTEMP + np.log(x / 1.2) * -f / _KCOND
    return _GTEMP + (1.0 / x - 1.0 / 1.2) * f / _KCOND


@pytest.mark.parametrize("geom,d", [("cartesian", 0), ("axisymmetric", 1),
                                    ("spherical", 2)])
def test_thermal_diffusion(geom, d, tmp_path):
    args = [
        f"artemis/coordinates={geom}",
        "parthenon/time/tlim=50.0",
        f"gas/conductivity/cond={_KCOND:.8f}",
        "gravity/uniform/gx1=0.0",
        f"problem/flux={_FLUX:.8f}",
        f"problem/gas_temp={_GTEMP:.8f}",
    ]
    if geom == "axisymmetric":
        args += ["parthenon/mesh/x2min=-0.5", "parthenon/mesh/x2max=0.5"]
    elif geom == "spherical":
        args += [f"parthenon/mesh/x2min={math.pi / 2 - 0.5:.8f}",
                 f"parthenon/mesh/x2max={math.pi / 2 + 0.5:.8f}"]
    sim = run_deck(COND, args, str(tmp_path))
    w = np.asarray(sim.state["gas"]["w"][0])
    temp = (w[5] / sim.gas_cfg.cv)[0, 0]
    x1v, _, _ = sim.grid.cell_centers()
    ans = _tans(x1v[0, 0], d)
    err = np.abs(temp / ans - 1.0).mean()
    assert err <= 5e-3, f"{geom} thermal steady state err {err:g}"
