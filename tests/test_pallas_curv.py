"""Curvilinear fused whole-stage kernel vs the composable jnp path
(interpret mode; machine-precision across coordinate systems, both full
and partial-with-sources modes, with the rotating-frame torque folded)."""

import os

import numpy as np
import pytest

from artemis_tpu import bc as bc_mod
from artemis_tpu.config import ParameterInput
from artemis_tpu.grid import grid_from_input
from artemis_tpu.ops import pallas_stage_curv as psc
from artemis_tpu.ops.hydro import FluidCfg, Hydro
from artemis_tpu.sources import RotatingFrame

MESHES = {
    "cylindrical": dict(nx1=64, nx2=32, nx3=8, x1min=0.4, x1max=2.0,
                        x2min=-3.14159, x2max=3.14159, x3min=-0.3, x3max=0.3),
    "cartesian": dict(nx1=64, nx2=32, nx3=8, x1min=-2.0, x1max=2.0,
                      x2min=-1.0, x2max=1.0, x3min=-0.25, x3max=0.25),
    "spherical": dict(nx1=48, nx2=32, nx3=8, x1min=0.4, x1max=2.0,
                      x2min=0.8, x2max=2.3, x3min=-3.14159, x3max=3.14159),
    "axisymmetric": dict(nx1=48, nx2=32, nx3=1, x1min=0.4, x1max=2.0,
                         x2min=-0.6, x2max=0.6, x3min=-3.14, x3max=3.14),
}


def _setup(coords, rotating, rsolver="hllc"):
    import jax.numpy as jnp

    mesh = MESHES[coords]
    deck = f"""
<artemis>
problem = constant
coordinates = {coords}
<parthenon/time>
tlim = 1.0
<parthenon/mesh>
nghost = 2
""" + "\n".join(f"{k} = {v}" for k, v in mesh.items()) + """
ix1_bc = outflow
ox1_bc = outflow
ix2_bc = outflow
ox2_bc = outflow
ix3_bc = periodic
ox3_bc = periodic
<physics>
rotating_frame = """ + ("true" if rotating else "false") + """
<rotating_frame>
omega = 1.0
<gas>
gamma = 1.4
<problem>
rho = 1.0
pres = 1.0
"""
    pin = ParameterInput.from_string(deck)
    grid = grid_from_input(pin)
    cfg = FluidCfg(fluid="gas", recon="plm", rsolver=rsolver, gamma=1.4,
                   cfl=0.3)
    hyd = Hydro(grid, cfg)
    nz, ny, nx = tuple(reversed(grid.nx))
    rng = np.random.default_rng(2)
    w = np.empty((1, 6, nz, ny, nx))
    w[:, 0] = 1 + 0.2 * rng.random((nz, ny, nx))
    w[:, 1:4] = 0.3 * (rng.random((1, 3, nz, ny, nx)) - 0.5)
    w[:, 5] = 1 + 0.2 * rng.random((nz, ny, nx))
    w[:, 4] = 0.4 * w[:, 0] * w[:, 5]
    u, w = hyd.prim_to_cons(jnp.asarray(w), cfg)
    return pin, grid, cfg, hyd, u, w


@pytest.mark.parametrize("coords", list(MESHES))
@pytest.mark.parametrize("pcm", [False, True])
def test_curv_stage_full(coords, pcm):
    import jax.numpy as jnp

    pin, grid, cfg, hyd, u, w = _setup(coords, rotating=False)
    u1 = u * 1.0
    gam0, gam1, bdt = 0.5, 0.5, 1e-3
    omf = 0.7
    wp = bc_mod.pad_and_fill(w, grid, "gas", {})
    fx = hyd.compute_fluxes(wp, cfg, pcm)
    ur = hyd.apply_update(u, u1, fx, gam0, gam1, bdt)
    ur = hyd.flux_source(ur, w, fx, bdt, omf=omf)
    ur = hyd.set_auxiliary(ur, cfg)
    wr = hyd.cons_to_prim(ur, cfg)
    ur, wr = hyd.prim_to_cons(wr, cfg)

    co = psc.CurvCoeffs(grid, omf, dtype=np.float64)
    uf, wf, dmax = psc.stage_curv(wp, u, u1, grid, cfg, gam0, gam1, bdt,
                                  pcm, co, co.pack(), full=True,
                                  interpret=True)
    assert float(jnp.max(jnp.abs(uf - ur))) < 1e-11
    assert float(jnp.max(jnp.abs(wf - wr))) < 1e-11
    assert abs(cfg.cfl / float(jnp.max(dmax))
               - float(hyd.estimate_dt(wr, cfg))) < 1e-11


def test_curv_stage_full_hlle():
    """HLLE solver path of the fused kernel vs the jnp hlle path."""
    import jax.numpy as jnp

    pin, grid, cfg, hyd, u, w = _setup("spherical", rotating=False,
                                       rsolver="hlle")
    u1 = u * 1.0
    gam0, gam1, bdt = 0.5, 0.5, 1e-3
    wp = bc_mod.pad_and_fill(w, grid, "gas", {})
    fx = hyd.compute_fluxes(wp, cfg, False)
    ur = hyd.apply_update(u, u1, fx, gam0, gam1, bdt)
    ur = hyd.flux_source(ur, w, fx, bdt, omf=0.0)
    ur = hyd.set_auxiliary(ur, cfg)
    wr = hyd.cons_to_prim(ur, cfg)
    ur, wr = hyd.prim_to_cons(wr, cfg)

    co = psc.CurvCoeffs(grid, 0.0, dtype=np.float64)
    uf, wf, _ = psc.stage_curv(wp, u, u1, grid, cfg, gam0, gam1, bdt,
                               False, co, co.pack(), full=True,
                               interpret=True)
    assert float(jnp.max(jnp.abs(uf - ur))) < 1e-11
    assert float(jnp.max(jnp.abs(wf - wr))) < 1e-11


@pytest.mark.parametrize("coords", list(MESHES))
@pytest.mark.parametrize("model", ["plaw", "alpha"])
def test_curv_stage_full_with_diffusion(coords, model):
    """Viscous + conductive diffusion fused into the stage kernel vs the
    jnp Diffusion pass (ops/diffusion.py; ref src/utils/diffusion/)."""
    import jax.numpy as jnp

    from artemis_tpu.ops.diffusion import DiffParams, Diffusion

    pin, grid, cfg, hyd, u, w = _setup(coords, rotating=False)
    if model == "plaw":
        visc = DiffParams(kind="viscosity_plaw", nu_s=2.0e-3, eta=0.2,
                          r_exp=0.5, R0=1.0)
    else:
        visc = DiffParams(kind="viscosity_alpha", alpha=1.0e-3, eta=0.0,
                          R0=1.0, Omega0=1.0)
    cond = DiffParams(kind="conductivity_plaw", hcond_0=1.0e-3,
                      temp_exp=0.5, rho_exp=0.3, T0=1.0, d0=1.0)
    diff = Diffusion(grid, hyd, cfg, visc, cond)
    if coords == "cartesian":
        # coefficient rows factor through Rcyl — not (x)*(y)-separable on a
        # Cartesian grid; CurvCoeffs must raise (jnp fallback), not build
        # garbage rows
        with pytest.raises(ValueError):
            psc.CurvCoeffs(grid, 0.0, dtype=np.float64, diff=diff)
        return

    u1 = u * 1.0
    gam0, gam1, bdt = 0.5, 0.5, 1e-3
    wp = bc_mod.pad_and_fill(w, grid, "gas", {})
    fx = hyd.compute_fluxes(wp, cfg, False)
    ur = hyd.apply_update(u, u1, fx, gam0, gam1, bdt)
    ur = hyd.flux_source(ur, w, fx, bdt, omf=0.0)
    dfx = diff.fluxes(wp)
    ur = diff.update(ur, w, dfx, bdt)
    ur = hyd.set_auxiliary(ur, cfg)
    wr = hyd.cons_to_prim(ur, cfg)
    ur, wr = hyd.prim_to_cons(wr, cfg)

    co = psc.CurvCoeffs(grid, 0.0, dtype=np.float64, diff=diff)
    uf, wf, dmax = psc.stage_curv(wp, u, u1, grid, cfg, gam0, gam1, bdt,
                                  False, co, co.pack(), full=True,
                                  interpret=True)
    err_u = float(jnp.max(jnp.abs(uf - ur)))
    err_w = float(jnp.max(jnp.abs(wf - wr)))
    assert err_u < 1e-10, f"u mismatch {err_u:g}"
    assert err_w < 1e-10, f"w mismatch {err_w:g}"
    # fused dt denominator folds the diffusive limit
    dt_ref = min(float(hyd.estimate_dt(wr, cfg)),
                 float(cfg.cfl * diff.estimate_dt(wr)))
    dt_fused = cfg.cfl / float(jnp.max(dmax))
    assert abs(dt_fused - dt_ref) < 1e-10 * abs(dt_ref) + 1e-13


@pytest.mark.parametrize("coords", list(MESHES))
def test_curv_stage_full_with_point_gravity(coords):
    """Central point-mass gravity folded into the kernel vs sources.Gravity
    (point_mass.cpp analogue)."""
    import jax.numpy as jnp

    from artemis_tpu.sources import Gravity
    from artemis_tpu.units import Constants, Units

    pin, grid, cfg, hyd, u, w = _setup(coords, rotating=False)
    pin.apply_overrides(["gravity/point/mass=1.0", "gravity/point/soft=0.05"])
    constants = Constants.from_units(Units.from_input(pin))
    gsrc = Gravity(pin, grid, constants)

    u1 = u * 1.0
    gam0, gam1, bdt = 0.5, 0.5, 1e-3
    wp = bc_mod.pad_and_fill(w, grid, "gas", {})
    fx = hyd.compute_fluxes(wp, cfg, False)
    ur = hyd.apply_update(u, u1, fx, gam0, gam1, bdt)
    ur = hyd.flux_source(ur, w, fx, bdt, omf=0.0)
    st = gsrc.apply({"gas": {"u": ur, "w": w}}, {"gas": fx},
                    jnp.asarray(0.0), jnp.asarray(bdt), hyd)
    ur = st["gas"]["u"]
    ur = hyd.set_auxiliary(ur, cfg)
    wr = hyd.cons_to_prim(ur, cfg)
    ur, wr = hyd.prim_to_cons(wr, cfg)

    # spherical3D/cylindrical use the general cartesian gravity branch;
    # axisymmetric(-spherical) grids the pure-radial branch; Cartesian
    # grids the raw-coordinate xyz branch
    gmode = {"axisymmetric": "sph", "cartesian": "xyz"}.get(coords, "cart")
    co = psc.CurvCoeffs(grid, 0.0, dtype=np.float64)
    uf, wf, _ = psc.stage_curv(wp, u, u1, grid, cfg, gam0, gam1, bdt,
                               False, co, co.pack(), full=True,
                               interpret=True,
                               grav=(gsrc.gm, gsrc.soft2, gmode, (0.0, 0.0, 0.0)),
                               grav_dt=bdt)
    err_u = float(jnp.max(jnp.abs(uf - ur)))
    err_w = float(jnp.max(jnp.abs(wf - wr)))
    assert err_u < 1e-10, f"u mismatch {err_u:g}"
    assert err_w < 1e-10, f"w mismatch {err_w:g}"


@pytest.mark.parametrize("coords", [c for c in MESHES if c != "cartesian"])
def test_curv_stage_partial_with_rotating_frame(coords):
    import jax.numpy as jnp

    pin, grid, cfg, hyd, u, w = _setup(coords, rotating=True)
    rfs = RotatingFrame(pin, grid)
    u1 = u * 1.0
    gam0, gam1, bdt = 0.5, 0.5, 1e-3
    omf = 1.0
    wp = bc_mod.pad_and_fill(w, grid, "gas", {})
    fx = hyd.compute_fluxes(wp, cfg, False)
    ur = hyd.apply_update(u, u1, fx, gam0, gam1, bdt)
    ur = hyd.flux_source(ur, w, fx, bdt, omf=omf)
    st = rfs.apply({"gas": {"u": ur, "w": w}}, {"gas": fx}, 0.0, bdt, hyd)
    ur_mid = st["gas"]["u"]

    co = psc.CurvCoeffs(grid, omf, dtype=np.float64)
    up, _, _ = psc.stage_curv(wp, u, u1, grid, cfg, gam0, gam1, bdt, False,
                              co, co.pack(), full=False, rf_omega=omf,
                              interpret=True)
    assert float(jnp.max(jnp.abs(up - ur_mid))) < 1e-11


def test_curv_stage_gather_matches_padded(tmp_path, monkeypatch):
    """The in-kernel halo-gather frontend (interior array + IC strips +
    periodic x3 wrap) reproduces the padded-array kernel exactly on the
    disk boundary layout."""
    import jax.numpy as jnp

    from artemis_tpu.simulation import Simulation

    monkeypatch.setenv("ARTEMIS_PALLAS_INTERPRET", "1")
    deck = os.path.join(os.path.dirname(__file__), "..", "inputs",
                        "disk_sph.in")
    sim = Simulation(deck, overrides=[
        "parthenon/time/nlim=0",
        "parthenon/mesh/nx1=128",
        "parthenon/mesh/nx2=32",
        "parthenon/mesh/nx3=16",
        "parthenon/mesh/x1min=0.4",
        "parthenon/mesh/x1max=2.4",
    ], data_dir=str(tmp_path))
    drv = sim.driver
    grid, cfg = sim.grid, sim.gas_cfg
    assert psc.gather_supported(grid, cfg, drv.bc_custom)
    caches = drv.bc_custom["ic"].shard_caches[0]
    strips = psc.prepare_gather_strips(grid, caches)

    co = psc.CurvCoeffs(grid, drv.omf, dtype=np.float64, diff=drv.diffusion)
    packed = co.pack()
    gsrc = [s for s in drv.sources if hasattr(s, "gtype")][0]
    grav = (gsrc.gm, gsrc.soft2, "cart", (0.0, 0.0, 0.0))
    u = sim.state["gas"]["u"]
    w = sim.state["gas"]["w"]
    wp = drv.fill_ghosts(w, "gas")
    up, wpad_out, dmp = psc.stage_curv(
        wp, u, u, grid, cfg, 0.5, 0.5, 1e-4, False, co, packed, full=True,
        rf_omega=drv._curv_rf if drv._curv else drv.omf, grav=grav,
        grav_dt=1e-4, interpret=True)
    ug, wg, dmg = psc.stage_curv_gather(
        w, u, u, grid, cfg, 0.5, 0.5, 1e-4, False, co, packed, strips,
        rf_omega=drv._curv_rf if drv._curv else drv.omf, grav=grav,
        grav_dt=1e-4, interpret=True)
    assert float(jnp.max(jnp.abs(ug - up))) == 0.0
    assert float(jnp.max(jnp.abs(wg - wpad_out))) == 0.0
    assert float(jnp.max(jnp.abs(jnp.max(dmg) - jnp.max(dmp)))) < 1e-12


def test_curv_stage_gather6_allic_matches_padded(tmp_path, monkeypatch):
    """The six-face strip gather (all-ic Cartesian boundary layout, the
    north-star root) reproduces the padded-array kernel exactly, and the
    plain Driver wires it up when every face is an ic value cache."""
    import jax.numpy as jnp

    from artemis_tpu.simulation import Simulation

    monkeypatch.setenv("ARTEMIS_PALLAS_INTERPRET", "1")
    deck = os.path.join(os.path.dirname(__file__), "..", "inputs",
                        "disk_rhd_amr.in")
    sim = Simulation(deck, overrides=[
        "parthenon/time/nlim=0",
        "parthenon/mesh/refinement=none",
        "physics/radiation=false",
        "parthenon/mesh/nx1=128",
        "parthenon/mesh/nx2=32",
        "parthenon/mesh/nx3=8",
    ], data_dir=str(tmp_path))
    drv = sim.driver
    grid, cfg = sim.grid, sim.gas_cfg
    assert psc.gather6_supported(grid)
    caches = drv.bc_custom["ic"].shard_caches[0]
    strips = psc.prepare_gather6_root_strips(grid, caches)

    co = psc.CurvCoeffs(grid, drv.omf, dtype=np.float64, diff=drv.diffusion)
    packed = co.pack()
    gm_, soft2_, gmode, gpos, _, _ = drv._curv_grav
    grav = (gm_, soft2_, gmode, gpos)
    u = sim.state["gas"]["u"]
    w = sim.state["gas"]["w"]
    wp = drv.fill_ghosts(w, "gas")
    up, wpad_out, dmp = psc.stage_curv(
        wp, u, u, grid, cfg, 0.5, 0.5, 1e-4, False, co, packed, full=True,
        rf_omega=drv._curv_rf, grav=grav, grav_dt=1e-4, interpret=True)
    ug, wg, dmg = psc.stage_curv_gather6(
        w, u, u, grid, cfg, 0.5, 0.5, 1e-4, False, co, packed, strips,
        rf_omega=drv._curv_rf, grav=grav, grav_dt=1e-4, interpret=True)
    assert float(jnp.max(jnp.abs(ug - up))) == 0.0
    assert float(jnp.max(jnp.abs(wg - wpad_out))) == 0.0
    assert float(jnp.max(jnp.abs(jnp.max(dmg) - jnp.max(dmp)))) < 1e-12

    # the f32 driver selects the six-face gather for this layout
    sim32 = Simulation(deck, overrides=[
        "parthenon/time/nlim=0",
        "parthenon/mesh/refinement=none",
        "physics/radiation=false",
        "artemis/precision=float32",
        "parthenon/mesh/nx1=128",
        "parthenon/mesh/nx2=32",
        "parthenon/mesh/nx3=8",
    ], data_dir=str(tmp_path))
    assert sim32.driver._curv_gather6 is not None
