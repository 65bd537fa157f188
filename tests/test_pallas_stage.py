"""Fused whole-stage Pallas kernel vs the composable jnp path.

Runs the kernels in interpret mode (CPU) on random smooth states and
requires machine-precision agreement with the jnp stage sequence
(compute_fluxes -> apply_update -> flux_source -> set_auxiliary ->
cons_to_prim -> prim_to_cons)."""

import numpy as np
import pytest

from artemis_tpu import bc as bc_mod
from artemis_tpu.config import ParameterInput
from artemis_tpu.grid import grid_from_input
from artemis_tpu.ops import pallas_stage
from artemis_tpu.ops.hydro import FluidCfg, Hydro

from .utils import INPUTS_DIR
import os


def _setup(nx, ny, nz, recon="plm", nghost=None):
    import jax.numpy as jnp

    pin = ParameterInput.from_file(os.path.join(INPUTS_DIR, "linwave.in"))
    pin.apply_overrides([
        f"parthenon/mesh/nx1={nx}", f"parthenon/mesh/nx2={ny}",
        f"parthenon/mesh/nx3={nz}", "problem/amp=1e-3"]
        + ([f"parthenon/mesh/nghost={nghost}"] if nghost else []))
    grid = grid_from_input(pin)
    cfg = FluidCfg(fluid="gas", recon=recon, rsolver="hllc",
                   gamma=pin.get_real("gas", "gamma"),
                   cfl=pin.get_real("gas", "cfl"))
    hyd = Hydro(grid, cfg)
    rng = np.random.default_rng(1)
    w = np.empty((1, 6, nz, ny, nx))
    w[:, 0] = 1.0 + 0.2 * rng.random((nz, ny, nx))
    w[:, 1:4] = 0.3 * (rng.random((1, 3, nz, ny, nx)) - 0.5)
    w[:, 5] = 1.0 + 0.2 * rng.random((nz, ny, nx))
    w[:, 4] = (cfg.gamma - 1) * w[:, 0] * w[:, 5]
    u, w = hyd.prim_to_cons(jnp.asarray(w), cfg)
    return grid, cfg, hyd, u, w


def _ref_stage(hyd, grid, cfg, u, w, u1, gam0, gam1, bdt, pcm):
    wp = bc_mod.pad_and_fill(w, grid, "gas", {})
    fx = hyd.compute_fluxes(wp, cfg, pcm)
    ur = hyd.apply_update(u, u1, fx, gam0, gam1, bdt)
    ur = hyd.flux_source(ur, w, fx, bdt)
    ur = hyd.set_auxiliary(ur, cfg)
    wr = hyd.cons_to_prim(ur, cfg)
    return hyd.prim_to_cons(wr, cfg)


@pytest.mark.parametrize("pcm", [False, True])
def test_fused_stage_matches_jnp(pcm):
    import jax.numpy as jnp

    grid, cfg, hyd, u, w = _setup(32, 32, 8)
    u1 = u * 1.0
    ur, wr = _ref_stage(hyd, grid, cfg, u, w, u1, 0.5, 0.5, 1e-3, pcm)
    wp = bc_mod.pad_and_fill(w, grid, "gas", {})
    uf, wf, dmax = pallas_stage.stage(wp, u, u1, grid, cfg, 0.5, 0.5, 1e-3,
                                      pcm, interpret=True)
    assert abs(cfg.cfl / float(jnp.max(dmax))
               - float(hyd.estimate_dt(wf, cfg))) < 1e-12
    assert float(jnp.max(jnp.abs(uf - ur))) < 1e-12
    assert float(jnp.max(jnp.abs(wf - wr))) < 1e-12


@pytest.mark.parametrize("pcm", [False, True])
def test_fused_periodic_stage_matches_jnp(pcm):
    import jax.numpy as jnp

    grid, cfg, hyd, u, w = _setup(128, 32, 16)
    u1 = u * 1.0
    ur, wr = _ref_stage(hyd, grid, cfg, u, w, u1, 0.5, 0.5, 1e-3, pcm)
    uf, wf, dmax = pallas_stage.stage_periodic(w, u, u1, grid, cfg, 0.5,
                                               0.5, 1e-3, pcm, interpret=True)
    assert abs(cfg.cfl / float(jnp.max(dmax))
               - float(hyd.estimate_dt(wf, cfg))) < 1e-12
    assert float(jnp.max(jnp.abs(uf - ur))) < 1e-12
    assert float(jnp.max(jnp.abs(wf - wr))) < 1e-12


def test_fused_stage_2d():
    import jax.numpy as jnp

    grid, cfg, hyd, u, w = _setup(32, 32, 1)
    u1 = u * 1.0
    ur, wr = _ref_stage(hyd, grid, cfg, u, w, u1, 0.0, 1.0, 2e-3, False)
    wp = bc_mod.pad_and_fill(w, grid, "gas", {})
    uf, wf, _ = pallas_stage.stage(wp, u, u1, grid, cfg, 0.0, 1.0, 2e-3,
                                   False, interpret=True)
    assert float(jnp.max(jnp.abs(uf - ur))) < 1e-12
    assert float(jnp.max(jnp.abs(wf - wr))) < 1e-12




@pytest.mark.parametrize("nghost", [3, 4])
def test_fused_stage_ppm(nghost, monkeypatch):
    """PPM reconstruction on the fused fast path (nghost>=3 slab halo;
    VERDICT: ppm decks must not silently lose the fast path)."""
    import jax.numpy as jnp

    monkeypatch.setenv("ARTEMIS_PALLAS_INTERPRET", "1")
    grid, cfg, hyd, u, w = _setup(32, 32, 8, recon="ppm", nghost=nghost)
    assert pallas_stage.supported(grid, cfg)
    u1 = u * 1.0
    ur, wr = _ref_stage(hyd, grid, cfg, u, w, u1, 0.5, 0.5, 1e-3, False)
    wp = bc_mod.pad_and_fill(w, grid, "gas", {})
    uf, wf, dmax = pallas_stage.stage(wp, u, u1, grid, cfg, 0.5, 0.5, 1e-3,
                                      False, interpret=True)
    assert float(jnp.max(jnp.abs(uf - ur))) < 1e-12
    assert float(jnp.max(jnp.abs(wf - wr))) < 1e-12


def test_fused_periodic_stage_ppm():
    import jax.numpy as jnp

    grid, cfg, hyd, u, w = _setup(128, 32, 8, recon="ppm", nghost=4)
    u1 = u * 1.0
    ur, wr = _ref_stage(hyd, grid, cfg, u, w, u1, 0.5, 0.5, 1e-3, False)
    uf, wf, dmax = pallas_stage.stage_periodic(w, u, u1, grid, cfg,
                                               0.5, 0.5, 1e-3, False,
                                               interpret=True)
    assert float(jnp.max(jnp.abs(uf - ur))) < 1e-12
    assert float(jnp.max(jnp.abs(wf - wr))) < 1e-12
