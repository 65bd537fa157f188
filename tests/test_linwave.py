"""Linear wave convergence regression (reference: tst/scripts/hydro/linwave.py).

Thresholds are the reference's own (linwave.py:99-143): L1 error magnitude,
N16->N32 convergence rate, and exact L/R sound-wave error symmetry.
"""

import os

import numpy as np
import pytest

from .utils import load_errs, run_deck

DECK = os.path.join(os.path.dirname(__file__), "..", "inputs", "linwave.in")

_WAVES = {
    "L-sound": ["problem/wave_flag=0", "problem/vflow=0.0"],
    "R-sound": ["problem/wave_flag=4", "problem/vflow=0.0"],
    "entropy": ["problem/wave_flag=3", "problem/vflow=1.0"],
}

_THRESH = {
    # recon -> (sound_err, entropy_err, sound_conv, entropy_conv)
    "plm": (2.23e-7, 2.21e-7, 0.29, 0.30),
    "ppm": (1.75e-7, 1.11e-7, 0.44, 0.42),
}


def _base_args(res):
    return [
        "parthenon/job/problem_id=linear_wave",
        "problem/nperiod=1",
        "parthenon/time/nlim=1000",
        "parthenon/time/integrator=rk2",
        "parthenon/mesh/nghost=4",
        f"parthenon/mesh/nx1={res}",
        f"parthenon/mesh/nx2={res // 2}",
        f"parthenon/mesh/nx3={res // 2}",
        "problem/amp=1.0e-6",
    ]


def _run_family(recon, flux, tmp_path):
    data = str(tmp_path)
    for res in (16, 32):
        for wave, wargs in _WAVES.items():
            run_deck(
                DECK,
                _base_args(res)
                + [f"gas/reconstruct={recon}", f"gas/riemann={flux}"]
                + wargs,
                data,
            )
    errs = load_errs(data, "linear_wave")
    assert not np.isnan(errs).any()
    # rows: [res16 x 3 waves, res32 x 3 waves] in run order
    errs = errs.reshape(2, 3, -1)
    return errs


@pytest.mark.parametrize(
    "recon,flux",
    [("plm", "hllc"), ("ppm", "llf")],
)
def test_linwave(recon, flux, tmp_path):
    errs = _run_family(recon, flux, tmp_path)
    sound_err, entr_err, sound_conv, entr_conv = _THRESH[recon]
    rms16 = errs[0, :, 4]
    rms32 = errs[1, :, 4]
    # error magnitude at N=32
    assert rms32[0] <= sound_err, f"L-sound err {rms32[0]:g} > {sound_err:g}"
    assert rms32[1] <= sound_err, f"R-sound err {rms32[1]:g} > {sound_err:g}"
    assert rms32[2] <= entr_err, f"entropy err {rms32[2]:g} > {entr_err:g}"
    # convergence rate
    assert rms32[0] / rms16[0] <= sound_conv
    assert rms32[1] / rms16[1] <= sound_conv
    assert rms32[2] / rms16[2] <= entr_conv
    # exact L/R sound symmetry (linwave.py:135-143)
    assert rms32[0] == rms32[1], f"L/R asymmetry: {rms32[0]:g} vs {rms32[1]:g}"


@pytest.mark.slow
@pytest.mark.parametrize(
    "recon,flux",
    [("plm", "hlle"), ("plm", "llf"), ("ppm", "hllc"), ("ppm", "hlle")],
)
def test_linwave_full_matrix(recon, flux, tmp_path):
    test_linwave(recon, flux, tmp_path)
