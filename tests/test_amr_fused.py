"""Fused whole-stage Pallas kernel on the AMR tree vs the jnp stage
(interpret mode): the north-star AMR-disk-RHD composition runs each node's
gas stage as one fused VMEM pass, with coarse-fine conservation restored by
rim flux deltas + restriction (reference: Parthenon flux correction,
artemis_driver.cpp:198-202 / SetFluxCorrections)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from artemis_tpu.amr import MultiLevelSMR
from artemis_tpu.config import ParameterInput
from artemis_tpu.driver import Integrator
from artemis_tpu.grid import grid_from_input
from artemis_tpu.ops.hydro import FluidCfg
from artemis_tpu.sources import Gravity
from artemis_tpu.units import Constants, Units

BOX = """
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
nx3 = 8
x3min = -0.25
x3max = 0.25
ix3_bc = periodic
ox3_bc = periodic
<physics>
gravity = true
<gravity>
tstart = -1.0e300
<gravity/point>
gm = 1.0
soft = 0.3
<gas>
gamma = 1.4
<problem>
rho = 1.0
pres = 1.0
"""

PATCHES = [dict(level=1, lo=(8, 8, 2), n=(16, 16, 4))]


def _bump_ic(g, dtype):
    x1, x2, x3 = g.cell_centers()
    nz, ny, nx = tuple(reversed(g.nx))
    w = np.zeros((1, 6, nz, ny, nx), dtype=dtype)
    r2 = np.broadcast_to(x1 ** 2 + x2 ** 2 + x3 ** 2, (nz, ny, nx))
    w[:, 0] = 1.0 + 0.5 * np.exp(-r2 / 0.05)
    w[:, 1] = 0.3
    w[:, 2] = -0.2
    w[:, 4] = 1.0
    w[:, 5] = w[:, 4] / (0.4 * w[:, 0])
    return w


def _run(pin, grid, cfg, nsteps):
    ml = MultiLevelSMR(
        grid, Integrator.make("rk2"), cfg,
        sources_factory=lambda g: [
            Gravity(pin, g, Constants.from_units(Units.from_input(pin)))],
        patches=[dict(p) for p in PATCHES])
    states = ml.initialize(
        [{"gas": _bump_ic(nd.grid, np.float32)} for nd in ml.nodes])
    los = [None] + [jnp.asarray(np.array(nd.lo, dtype=np.int32))
                    for nd in ml.nodes[1:]]
    dt = 0.8 * float(ml._dt(states))
    t = 0.0
    for _ in range(nsteps):
        states = ml._step(states, jnp.asarray(dt), jnp.asarray(t), los, None)
        t += dt
    return ml, states


def test_fused_amr_stage_matches_jnp(monkeypatch):
    """The fused AMR stage (kernel per node + rim deltas) matches the jnp
    flux-correction stage on a refined 3-D box with point gravity."""
    pin = ParameterInput.from_string(BOX)
    grid = grid_from_input(pin)
    cfg = FluidCfg(fluid="gas", recon="plm", rsolver="hllc", gamma=1.4,
                   cfl=0.4)

    monkeypatch.setenv("ARTEMIS_PALLAS", "0")
    ml_ref, ref = _run(pin, grid, cfg, nsteps=8)
    assert ml_ref._fused is None

    monkeypatch.delenv("ARTEMIS_PALLAS", raising=False)
    monkeypatch.setenv("ARTEMIS_PALLAS_INTERPRET", "1")
    ml_fused, fused = _run(pin, grid, cfg, nsteps=8)
    assert ml_fused._fused is not None

    for i in range(len(ref)):
        for key in ("u", "w"):
            a = np.asarray(ref[i]["gas"][key], dtype=np.float64)
            b = np.asarray(fused[i]["gas"][key], dtype=np.float64)
            # per-variable max-magnitude normalization: the jnp reference
            # runs mixed precision under x64 (u promoted through f64
            # geometry), so pointwise agreement is limited to f32 roundoff
            # accumulation
            scale = np.max(np.abs(a), axis=(0, 2, 3, 4), keepdims=True)
            err = np.max(np.abs(a - b) / (scale + 1e-30))
            assert err < 2e-5, f"node {i} {key} mismatch {err:g}"


def test_fused_amr_conservation(monkeypatch):
    """Mass is conserved to f32 roundoff across the refinement boundary on
    the fused path (rim deltas restore the pooled fine fluxes)."""
    deck = BOX.replace("gravity = true", "gravity = false")
    pin = ParameterInput.from_string(deck)
    grid = grid_from_input(pin)
    cfg = FluidCfg(fluid="gas", recon="plm", rsolver="hllc", gamma=1.4,
                   cfl=0.4)
    monkeypatch.setenv("ARTEMIS_PALLAS_INTERPRET", "1")
    ml = MultiLevelSMR(grid, Integrator.make("rk2"), cfg,
                       patches=[dict(p) for p in PATCHES])
    assert ml._fused is not None
    states = ml.initialize(
        [{"gas": _bump_ic(nd.grid, np.float32)} for nd in ml.nodes])
    los = [None] + [jnp.asarray(np.array(nd.lo, dtype=np.int32))
                    for nd in ml.nodes[1:]]
    vol = np.asarray(ml.root.hydro.vol)
    dt = 0.8 * float(ml._dt(states))
    states = ml._step(states, jnp.asarray(dt), jnp.asarray(0.0), los, None)
    m0 = float(np.sum(vol * np.asarray(states[0]["gas"]["u"][0, 0],
                                       dtype=np.float64)))
    for _ in range(10):
        states = ml._step(states, jnp.asarray(dt), jnp.asarray(0.0), los,
                          None)
    m1 = float(np.sum(vol * np.asarray(states[0]["gas"]["u"][0, 0],
                                       dtype=np.float64)))
    assert abs(m1 / m0 - 1.0) < 5e-6, f"mass drift {abs(m1 / m0 - 1):g}"
    rho = np.asarray(states[0]["gas"]["w"][0, 0])
    assert np.isfinite(rho).all() and rho.min() > 0
