"""Pallas FLD kernels (ops/pallas_fld.py) vs the jnp operator path.

The fused coefficient+matvec kernels must reproduce the jnp FLD solve
(radiation.py) to roundoff in interpreter mode — same Levermore-
Pomraning limiter, diffusivity cap, edge masking (zero-flux and
Dirichlet), Newton outer, and exact energy bookkeeping.  Reference
behavior: jaybenne gray transport (jaybenne.cpp) recast as
deterministic FLD per the north star (BASELINE.json)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artemis_tpu.config import ParameterInput
from artemis_tpu.grid import grid_from_input
from artemis_tpu.ops.hydro import FluidCfg, Hydro
from artemis_tpu.radiation import Radiation, RadiationCfg

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _setup():
    pin = ParameterInput.from_file(os.path.join(ROOT, "inputs",
                                                "disk_rhd_amr.in"))
    # nx3=32 -> tz=16, nzb=2: the (i±1 mod nzb) neighbor-block halo
    # assembly actually crosses blocks (nzb=1 would self-reference and
    # leave the halo indexing untested)
    pin.apply_overrides(["parthenon/mesh/nx1=32",
                         "parthenon/mesh/nx2=16",
                         "parthenon/mesh/nx3=32"])
    grid = grid_from_input(pin)
    gas = FluidCfg(fluid="gas", recon="plm", rsolver="hllc",
                   gamma=pin.get_real("gas", "gamma"), cfl=0.9)
    hyd = Hydro(grid, gas)
    cfg = RadiationCfg(opacity_model="constant", kappa_a=3.0,
                       c_code=10.0, arad=2.0)
    rad = Radiation(cfg, grid, hyd, gas)
    rng = np.random.default_rng(1)
    nz, ny, nx = 32, 16, 32
    rho = jnp.asarray(1.0 + rng.random((1, nz, ny, nx)))
    sie = jnp.asarray(1.0 + rng.random((1, nz, ny, nx)))
    u = (jnp.zeros((1, 6, nz, ny, nx)).at[:, 0].set(rho)
         .at[:, 5].set(rho * sie).at[:, 4].set(rho * sie))
    Er = jnp.asarray(0.5 + rng.random((1, nz, ny, nx)))
    state = {"gas": {"u": u, "w": u * 0}, "rad": {"Er": Er}}
    gh = {1: (0.7 + 0 * Er[..., :1], 0.9 + 0 * Er[..., :1])}
    return rad, state, gh


@pytest.mark.parametrize("with_ghosts", [False, True])
def test_pallas_fld_matches_jnp(with_ghosts):
    """Interpret-mode kernels reproduce the jnp solve to roundoff,
    with zero-flux edges and with Dirichlet ghost planes."""
    rad, state, gh = _setup()
    ghosts = dict(gh) if with_ghosts else None
    dt = 1.0e-3
    os.environ["ARTEMIS_PALLAS_INTERPRET"] = "1"
    os.environ["ARTEMIS_PALLAS_RAD"] = "1"   # opt-in path under test
    try:
        out_pal = rad.step(dict(state), dt, ghosts=ghosts)
        os.environ["ARTEMIS_PALLAS_RAD"] = "0"
        out_jnp = rad.step(dict(state), dt, ghosts=ghosts)
    finally:
        os.environ.pop("ARTEMIS_PALLAS_INTERPRET", None)
        os.environ.pop("ARTEMIS_PALLAS_RAD", None)
    scale = float(jnp.max(jnp.abs(out_jnp["rad"]["Er"])))
    dE = float(jnp.max(jnp.abs(out_pal["rad"]["Er"]
                               - out_jnp["rad"]["Er"])))
    du = float(jnp.max(jnp.abs(out_pal["gas"]["u"]
                               - out_jnp["gas"]["u"])))
    assert dE <= 1e-11 * scale
    assert du <= 1e-11
    # conservation: the pallas path's gas+radiation total matches the
    # jnp path's exactly (identical Dirichlet boundary fluxes)
    tp = float(jnp.sum(out_pal["rad"]["Er"])
               + jnp.sum(out_pal["gas"]["u"][:, 4]))
    tj = float(jnp.sum(out_jnp["rad"]["Er"])
               + jnp.sum(out_jnp["gas"]["u"][:, 4]))
    assert abs(tp - tj) <= 1e-10 * abs(tj)
