"""Time integration driver.

TPU-native equivalent of ``ArtemisDriver`` + Parthenon's ``EvolutionDriver``/
``LowStorageIntegrator`` (src/artemis_driver.cpp): a two-register low-storage
RK loop where each stage is one fused jitted function — the reference's task
graph collapses into XLA program order (SURVEY.md §7).
"""

from __future__ import annotations

import os
import time as _time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import bc as bc_mod
from .ops.hydro import FluidCfg, Hydro

BIG = 1.0e308

# set by the CLI's SIGTERM handler: evolve() finishes the current chunk,
# returns status "timeout", and the CLI writes a resumable checkpoint
# (the reference relies on Parthenon's signal handling; src/main.cpp)
STOP_REQUESTED = False


@dataclass(frozen=True)
class Integrator:
    """Two-register low-storage coefficients:
    u0 <- gam0*u0 + gam1*u1 + beta*dt*F(u0), per stage (Parthenon
    LowStorageIntegrator family: rk1, rk2, rk3, vl2)."""

    name: str
    gam0: Tuple[float, ...]
    gam1: Tuple[float, ...]
    beta: Tuple[float, ...]

    @property
    def nstages(self) -> int:
        return len(self.beta)

    @classmethod
    def make(cls, name: str) -> "Integrator":
        if name == "rk1":
            return cls(name, (0.0,), (1.0,), (1.0,))
        if name == "rk2":
            return cls(name, (0.0, 0.5), (1.0, 0.5), (1.0, 0.5))
        if name == "rk3":
            return cls(
                name,
                (0.0, 0.25, 2.0 / 3.0),
                (1.0, 0.75, 1.0 / 3.0),
                (1.0, 0.25, 2.0 / 3.0),
            )
        if name == "vl2":
            return cls(name, (0.0, 0.0), (1.0, 1.0), (0.5, 1.0))
        raise ValueError(f"unknown integrator {name!r}")


# A source term: fn(state_w, state_u, time, bdt, hydro) -> state_u
SourceFn = Callable[..., Dict]


def curv_point_grav(grid, s_):
    """Fold spec for a central point-mass Gravity source in the fused
    curvilinear stage kernel: ``(gm, soft2, gmode, pos, tstart, tstop)``,
    or None when the source/geometry falls outside the kernel's gravity
    envelope (cf. the reference's point-mass branches,
    src/pgen/../gravity/point_mass.cpp:70-105)."""
    from .geometry import geometry as _geo
    from .sources import Gravity as _Gravity

    if not (isinstance(s_, _Gravity) and s_.gtype == "point"
            and (s_.sink_rate <= 0.0 or s_.sink_rad <= 0.0)):
        return None
    c_ = grid.coords
    if (_geo.is_spherical(c_) and _geo.is_axisymmetric(c_)) \
            or c_ == "axisymmetric":
        # pure-radial branches (point_mass.cpp:70-105)
        gmode = "sph"
    elif (c_ in ("spherical3D", "cylindrical")
          and grid.nx[1] > 1 and grid.nx[2] > 1
          and s_.pos == (0.0, 0.0, 0.0)):
        # general cartesian branch at the origin
        gmode = "cart"
    elif _geo.is_cartesian(c_):
        # Cartesian grid: r_vec from the coordinate rows directly; any
        # mass position works (the offset folds into constants)
        gmode = "xyz"
    else:
        return None
    return (s_.gm, s_.soft2, gmode, tuple(s_.pos), s_.tstart, s_.tstop)


def nbody_coeffs(integ: Integrator, dt: float):
    """Derived stage-consistent N-body coupling integrator from the hydro
    low-storage coefficients (artemis_driver.cpp:71-87)."""
    n = integ.nstages
    nbeta = [0.0] * n
    nbeta[0] = integ.beta[0]
    for s in range(2, n + 1):
        nbeta[s - 1] = integ.gam0[s - 1] * nbeta[s - 2] + integ.beta[s - 1]
    ngam0, ngam1 = [0.0] * n, [0.0] * n
    for s in range(1, n + 1):
        nbetam1 = nbeta[(s > 1) * (s - 2)]
        nfac = integ.beta[s - 1] / (integ.gam0[s - 1] * nbetam1
                                    + integ.beta[s - 1])
        ngam0[s - 1] = 0.0 if s == 1 else 1.0 - nfac
        ngam1[s - 1] = 1.0 if s == 1 else nfac

    class _C:
        pass

    c = _C()
    c.gam0, c.gam1, c.beta, c.dt = ngam0, ngam1, nbeta, dt
    return c


class Driver:
    """Owns the jitted step function and the outer evolution loop."""

    def __init__(
        self,
        grid,
        integrator: Integrator,
        gas_cfg: Optional[FluidCfg],
        dust_cfg: Optional[FluidCfg] = None,
        sources: Optional[List[SourceFn]] = None,
        bc_custom: Optional[dict] = None,
        omf: float = 0.0,
        diffusion=None,
        nbody=None,
        radiation=None,
    ):
        self.grid = grid
        self.integrator = integrator
        self.hydro = Hydro(grid, gas_cfg, dust_cfg)
        self.gas_cfg = gas_cfg
        self.dust_cfg = dust_cfg
        self.sources = list(sources or [])
        self.bc_custom = bc_custom or {}
        self.omf = omf  # rotating-frame rate for curvilinear flux sources
        self.diffusion = None
        if diffusion is not None:
            # diffusion is a factory fn(hydro) so it can precompute against
            # the (possibly shard-local) grid owned by this driver
            self.diffusion = diffusion(self.hydro)
        self.nbody = nbody  # host-coupled particle system (NBodySystem)
        self.radiation = None
        if radiation is not None:
            self.radiation = radiation(self.hydro)
        # lift big precomputed coefficient fields to device arrays: traced
        # code then captures executable PARAMETERS instead of multi-MB HLO
        # literal constants (keeps compiles fast/small at production sizes)
        from .parallel.mesh import _walk_arrays, _set_path

        for obj in list(self.sources) + [self.diffusion]:
            if obj is None:
                continue
            fields = []
            for k, v in vars(obj).items():
                fields += _walk_arrays(v, (("attr", k),))
            for path, arr in fields:
                if arr.size >= 65536:
                    try:
                        _set_path(obj, path, jax.device_put(arr))
                    except ValueError:
                        pass  # immutable container; keep as numpy
        # fused whole-stage pallas fast path (Cartesian source-free gas)
        from .ops import pallas_stage as _ps

        self._fused_stage = (_ps.supported(grid, gas_cfg)
                             and dust_cfg is None and not self.sources
                             and self.diffusion is None)
        self._fused_periodic = (self._fused_stage and not self.bc_custom
                                and _ps.periodic_supported(grid, gas_cfg))
        # curvilinear fused stage (production disk path): full mode replaces
        # the whole gas stage; partial mode (runs WITH sources) stops after
        # the flux sources and hands off to the jnp source chain.  Sources
        # that consume the stage fluxes (curvilinear RotatingFrame) force
        # the jnp path for now.  Cartesian grids take this kernel too when
        # the source-free Cartesian kernel doesn't apply (e.g. a Cartesian
        # disk with point gravity): the geometry rows degenerate to units,
        # reconstruction uses the uniform limiter, and gravity runs the
        # xyz mode — the Cartesian production configs (incl. the radiation-
        # capable geometry) get a fused path instead of falling to jnp.
        self._curv = None
        from .ops import pallas_stage_curv as _psc
        from .sources import RotatingFrame as _RF

        if _psc.supported_curv(grid, gas_cfg) and not self._fused_stage:
            flux_srcs = [s_ for s_ in self.sources
                         if getattr(s_, "uses_fluxes", False)]
            # the curvilinear RotatingFrame torque is folded INTO the kernel;
            # any other flux-consuming source forces the jnp path
            foldable = all(isinstance(s_, _RF) and not s_.shearing_box
                           for s_ in flux_srcs)
            co = None
            if foldable:
                try:
                    # viscous/thermal diffusion is fused into the kernel
                    # (separable coefficient rows); unsupported coefficient
                    # models raise and fall back to the jnp path
                    co = _psc.CurvCoeffs(grid, self.omf, dtype=np.float32,
                                         diff=self.diffusion)
                except ValueError:
                    co = None
            if co is not None:
                self._curv = (co, co.pack())
                self._curv_rf = flux_srcs[0].omega if flux_srcs else 0.0
                self._curv_srcs = [s_ for s_ in self.sources
                                   if s_ not in flux_srcs]
                # fold a central point-mass gravity into the kernel
                # (sources.Gravity gtype=point at the origin, no sink)
                self._curv_grav = None
                if dust_cfg is None:
                    for s_ in list(self._curv_srcs):
                        spec = curv_point_grav(grid, s_)
                        if spec is None:
                            continue
                        self._curv_grav = spec
                        self._curv_srcs.remove(s_)
                        break
                self._curv_full = dust_cfg is None and not self._curv_srcs
                # in-kernel halo gather (no padded array / ghost-fill pass)
                # for the disk boundary layout: x1/x2 ic strips + periodic x3
                self._curv_gather = None
                self._curv_gather6 = None
                if self._curv_full and _psc.gather_supported(
                        grid, gas_cfg, self.bc_custom):
                    caches = self.bc_custom["ic"].shard_caches[0]
                    self._curv_gather = _psc.prepare_gather_strips(grid,
                                                                   caches)
                elif (self._curv_full and _psc.gather6_supported(grid)
                      and all(grid.bc[d] == ("ic", "ic") for d in range(3))
                      and (self.bc_custom or {}).get("ic") is not None):
                    # all-ic boundary layout (the north-star Cartesian
                    # disk): six-face static strips, no padded array
                    caches = getattr(self.bc_custom["ic"], "shard_caches",
                                     None)
                    if caches and all((d, s_) in caches[0]
                                      for d in (1, 2, 3) for s_ in (0, 1)):
                        strips = _psc.prepare_gather6_root_strips(
                            grid, caches[0])
                        self._curv_gather6 = {
                            k: jax.device_put(np.asarray(v, dtype=np.float32))
                            for k, v in strips.items()}
        self._step = jax.jit(self._build_step())
        self._dt_fn = jax.jit(self._estimate_dt)
        self._advance = jax.jit(self._build_advance())
        if nbody is not None:
            self._stage_jits = [jax.jit(self._make_stage_fn(s))
                                for s in range(1, integrator.nstages + 1)]
            if self.radiation is not None:
                self._rad_jit = jax.jit(lambda st, dt: self.radiation.sync_gas(
                    self.radiation.step(st, dt)))

    @property
    def host_coupled(self) -> bool:
        """True when each step needs host-side work between stages."""
        return self.nbody is not None

    # ------------------------------------------------------------------
    def _fluids(self):
        out = []
        if self.gas_cfg is not None:
            out.append(("gas", self.gas_cfg))
        if self.dust_cfg is not None:
            out.append(("dust", self.dust_cfg))
        return out

    def _estimate_dt(self, state):
        dts = []
        for name, cfg in self._fluids():
            if name == "gas" and "dtden" in state["gas"]:
                dts.append(cfg.cfl / jnp.max(state["gas"]["dtden"]))
                continue
            dt = self.hydro.estimate_dt(state[name]["w"], cfg)
            if name == "gas" and self.diffusion is not None:
                # cfl * min(advective, diffusive) (gas.cpp:435-468)
                dt = jnp.minimum(dt, cfg.cfl * self.diffusion.estimate_dt(
                    state[name]["w"]))
            dts.append(dt)
        dt = jnp.min(jnp.stack(dts))
        if self.radiation is not None:
            dt = jnp.minimum(dt, self.radiation.cfg.dt_rad)
        return dt

    def _sync_prims(self, state):
        """C2P + P2C re-sync on interior arrays, per fluid."""
        hyd = self.hydro
        new = dict(state)
        for name, cfg in self._fluids():
            w = hyd.cons_to_prim(state[name]["u"], cfg)
            u, w = hyd.prim_to_cons(w, cfg)
            new[name] = {"u": u, "w": w}
        return new

    def _stage_body(self, state, u1, dt, time, stage, particles):
        """One RK stage (the reference per-stage task list,
        artemis_driver.cpp:170-268).  Returns (state, pforce-or-None)."""
        hyd = self.hydro
        integ = self.integrator
        fluids = self._fluids()
        gam0 = integ.gam0[stage - 1]
        gam1 = integ.gam1[stage - 1]
        beta = integ.beta[stage - 1]
        bdt = beta * dt
        force_pcm = (integ.name == "vl2") and stage == 1
        if self._curv is not None and state["gas"]["w"].dtype == jnp.float32:
            from .ops import pallas_stage_curv as _psc

            co, packed = self._curv
            grav = None
            grav_dt = 0.0
            if self._curv_grav is not None:
                gm_, soft2_, gmode, gpos, tstart, tstop = self._curv_grav
                grav = (gm_, soft2_, gmode, gpos)
                # clamp the +/-1e300 "always on" sentinels into f32 range
                # (they otherwise cast to inf with a numpy warning)
                tstart = float(np.clip(tstart, -1e38, 1e38))
                tstop = float(np.clip(tstop, -1e38, 1e38))
                grav_dt = jnp.where(
                    jnp.logical_and(time >= tstart, time < tstop), bdt, 0.0)
            if self._curv_full and getattr(self, "_curv_gather", None) \
                    is not None:
                # in-kernel halo gather: no padded array at all
                u, w, dmax = _psc.stage_curv_gather(
                    state["gas"]["w"], state["gas"]["u"], u1["gas"],
                    self.grid, self.gas_cfg, gam0, gam1, bdt, force_pcm,
                    co, packed, self._curv_gather, rf_omega=self._curv_rf,
                    grav=grav, grav_dt=grav_dt)
                new_state = dict(state)
                new_state["gas"] = {"u": u, "w": w, "dtden": dmax}
                return new_state, None
            if self._curv_full and getattr(self, "_curv_gather6", None) \
                    is not None:
                # all-ic six-face strip gather: no padded array at all
                u, w, dmax = _psc.stage_curv_gather6(
                    state["gas"]["w"], state["gas"]["u"], u1["gas"],
                    self.grid, self.gas_cfg, gam0, gam1, bdt, force_pcm,
                    co, packed, self._curv_gather6, rf_omega=self._curv_rf,
                    grav=grav, grav_dt=grav_dt)
                new_state = dict(state)
                new_state["gas"] = {"u": u, "w": w, "dtden": dmax}
                return new_state, None
            w_pad = self.fill_ghosts(state["gas"]["w"], "gas")
            if self._curv_full:
                u, w, dmax = _psc.stage_curv(
                    w_pad, state["gas"]["u"], u1["gas"], self.grid,
                    self.gas_cfg, gam0, gam1, bdt, force_pcm, co, packed,
                    full=True, rf_omega=self._curv_rf,
                    grav=grav, grav_dt=grav_dt)
                new_state = dict(state)
                new_state["gas"] = {"u": u, "w": w, "dtden": dmax}
                return new_state, None
            # partial: fused fluxes/update/flux-sources (+ folded rotating-
            # frame torque + point gravity + diffusion), then the jnp
            # source chain
            u, _, _ = _psc.stage_curv(
                w_pad, state["gas"]["u"], u1["gas"], self.grid, self.gas_cfg,
                gam0, gam1, bdt, force_pcm, co, packed, full=False,
                rf_omega=self._curv_rf, grav=grav, grav_dt=grav_dt)
            w = state["gas"]["w"]
            new_state = dict(state)
            new_state["gas"] = {"u": u, "w": w}
            if self.dust_cfg is not None:
                # dust stays on the jnp path
                ud, wd = state["dust"]["u"], state["dust"]["w"]
                wd_pad = self.fill_ghosts(wd, "dust")
                fxd = hyd.compute_fluxes(wd_pad, self.dust_cfg, force_pcm)
                ud = hyd.apply_update(ud, u1["dust"], fxd, gam0, gam1, bdt)
                ud = hyd.flux_source(ud, wd, fxd, bdt, omf=self.omf)
                new_state["dust"] = {"u": ud, "w": wd}
            ctx = {"particles": particles}
            for src in self._curv_srcs:
                if getattr(src, "needs_ctx", False):
                    new_state = src.apply(new_state, None, time, bdt, hyd,
                                          ctx=ctx)
                else:
                    new_state = src.apply(new_state, None, time, bdt, hyd)
            u = hyd.set_auxiliary(new_state["gas"]["u"], self.gas_cfg)
            new_state["gas"] = {"u": u, "w": new_state["gas"]["w"]}
            return self._sync_prims(new_state), ctx.get("pforce")
        if self._fused_stage and state["gas"]["w"].dtype == jnp.float32:
            from .ops import pallas_stage as _ps

            if self._fused_periodic:
                u, w, dmax = _ps.stage_periodic(
                    state["gas"]["w"], state["gas"]["u"], u1["gas"],
                    self.grid, self.gas_cfg, gam0, gam1, bdt, force_pcm)
            else:
                w_pad = self.fill_ghosts(state["gas"]["w"], "gas")
                u, w, dmax = _ps.stage(w_pad, state["gas"]["u"], u1["gas"],
                                       self.grid, self.gas_cfg, gam0, gam1,
                                       bdt, force_pcm)
            new_state = dict(state)
            # dtden: fused CFL denominator blocks (estimate_dt uses the max,
            # skipping a full extra pass over w each cycle)
            new_state["gas"] = {"u": u, "w": w, "dtden": dmax}
            return new_state, None
        new_state = dict(state)
        fluxes = {}
        for name, cfg in fluids:
            u, w = state[name]["u"], state[name]["w"]
            # ghost fill: physical BCs (+ halo exchange when sharded)
            w_pad = self.fill_ghosts(w, name)
            fx = hyd.compute_fluxes(w_pad, cfg, force_pcm)
            fluxes[name] = fx
            u = hyd.apply_update(u, u1[name], fx, gam0, gam1, bdt)
            u = hyd.flux_source(u, w, fx, bdt, omf=self.omf)
            if name == "gas" and self.diffusion is not None:
                dfx = self.diffusion.fluxes(w_pad)
                u = self.diffusion.update(u, w, dfx, bdt)
            new_state[name] = {"u": u, "w": w}
        # external sources in reference task order
        # (gravity -> rotating frame -> drag -> cooling)
        ctx = {"particles": particles}
        for src in self.sources:
            if getattr(src, "needs_ctx", False):
                new_state = src.apply(new_state, fluxes, time, bdt, hyd, ctx=ctx)
            else:
                new_state = src.apply(new_state, fluxes, time, bdt, hyd)
        # dual-energy sync for gas
        if self.gas_cfg is not None:
            u = hyd.set_auxiliary(new_state["gas"]["u"], self.gas_cfg)
            new_state["gas"] = {"u": u, "w": new_state["gas"]["w"]}
        return self._sync_prims(new_state), ctx.get("pforce")

    def _make_stage_fn(self, stage):
        def stage_fn(state, u1, dt, time, particles):
            return self._stage_body(state, u1, dt, time, stage, particles)

        return stage_fn

    def _build_step(self):
        integ = self.integrator
        fluids = self._fluids()

        def step(state, dt, time):
            # u1 register: deep copy of conserved data
            u1 = {name: state[name]["u"] for name, _ in fluids}
            for stage in range(1, integ.nstages + 1):
                state, _ = self._stage_body(state, u1, dt, time, stage, None)
            # operator-split radiation (artemis_driver.cpp:111)
            if self.radiation is not None:
                state = self.radiation.step(state, dt)
                state = self.radiation.sync_gas(state)
            return state

        return step

    def _nbody_coeffs(self, dt: float):
        return nbody_coeffs(self.integrator, dt)

    def _host_step(self, state, dt, time):
        """Step with host-side particle advances between stages
        (NBody::Advance pattern, nbody_advance.cpp:85-208)."""
        nb = self.nbody
        nstages = self.integrator.nstages
        coeffs = self._nbody_coeffs(float(dt))
        nb.begin_step()
        u1 = {name: state[name]["u"] for name, _ in self._fluids()}
        for stage in range(1, nstages + 1):
            state, pforce = self._stage_jits[stage - 1](
                state, u1, jnp.asarray(dt), jnp.asarray(time),
                nb.particle_pytree())
            pf = np.asarray(pforce) if pforce is not None else np.zeros((nb.npart, 7))
            nb.advance(pf, stage, nstages, float(time), coeffs)
        if self.radiation is not None:
            state = self._rad_jit(state, jnp.asarray(dt))
        return state

    def fill_ghosts(self, w_int, fluid: str):
        """Interior prims -> padded prims.  Overridden by the sharded driver
        to insert ppermute halo exchange."""
        extra = (0, 0)
        if (self._curv is not None and w_int.dtype == jnp.float32
                and os.environ.get("ARTEMIS_ALIGNED_PAD") == "1"):
            # produce the fused kernel's DMA-aligned extents in this same
            # copy instead of a second pad pass.  Measured SLOWER on v5e
            # (edge-mode pad to the aligned extent beats XLA's separate
            # zero pad) — kept behind an env flag for other parts.
            from .ops import pallas_stage_curv as _psc

            nx = self.grid.nx[0]
            g1 = self.grid.ng[0]
            xp_al = -(-(nx + 2 * g1) // 128) * 128
            extra = (_psc.YS - (_psc.TY + 4), xp_al - (nx + 2 * g1))
        return bc_mod.pad_and_fill(w_int, self.grid, fluid, self.bc_custom,
                                   extra=extra)

    def _build_advance(self):
        """Compiled multi-step advance: a lax.while_loop that marches the
        state until crossing ``target`` (or ncycle hits ``nlim``), with the
        Parthenon dt logic (2x growth limit, tlim clamp) on-device — no
        host round-trips per step."""
        step = self._build_step()

        def advance(state, t, dt, ncycle, target, tlim, nlim):
            def cond(carry):
                state, t, dt, nc = carry
                return jnp.logical_and(t < target * (1.0 - 1e-12),
                                       jnp.logical_or(nlim < 0, nc < nlim))

            def body(carry):
                state, t, dt, nc = carry
                state = step(state, dt, t)
                t = t + dt
                new_dt = jnp.minimum(
                    jnp.where(dt < 0.1 * BIG, 2.0 * dt, dt),
                    self._estimate_dt(state))
                new_dt = jnp.where(
                    jnp.logical_and(t < tlim, (tlim - t) < new_dt),
                    tlim - t, new_dt)
                return (state, t, new_dt, nc + 1)

            return lax.while_loop(cond, body, (state, t, dt, ncycle))

        return advance

    # ------------------------------------------------------------------
    def initialize(self, state):
        """PostInitialization: P2C after the problem generator
        (fill_derived.cpp:283-287).  Prims arrive on the interior grid."""
        new = dict(state)
        for name, cfg in self._fluids():
            u, w = self.hydro.prim_to_cons(state[name]["w"], cfg)
            new[name] = {"u": u, "w": w}
        return self.prepare_state(new)

    def prepare_state(self, state):
        """Make the state loop-carry-compatible with the fused fast path:
        seed the dtden blocks so the while_loop carry structure is stable
        (also applied after restart loads)."""
        if state["gas"]["w"].dtype != jnp.float32:
            return state
        curv_full = self._curv is not None and self._curv_full
        if not (self._fused_stage or curv_full):
            return state
        if "dtden" in state["gas"]:
            return state
        cfg = self.gas_cfg
        dt0 = self.hydro.estimate_dt(state["gas"]["w"], cfg)
        if curv_full and self.diffusion is not None:
            # the fused kernel folds the diffusive limit into dtden; the
            # seed must too, or the first restarted/initial dt can exceed it
            dt0 = jnp.minimum(dt0, cfg.cfl * self.diffusion.estimate_dt(
                state["gas"]["w"]))
        if curv_full:
            from .ops import pallas_stage_curv as _psc

            nx, ny, nz = self.grid.nx
            shape = (nz // _psc._pick_tz(nz) if nz > 1 else 1,
                     ny // _psc.TY)
        else:
            from .ops import pallas_stage as _ps

            shape = _ps.dt_block_shape(self.grid, self._fused_periodic)
        state = dict(state)
        state["gas"] = dict(state["gas"])
        state["gas"]["dtden"] = jnp.full(shape, cfg.cfl / dt0,
                                         dtype=state["gas"]["w"].dtype)
        return state

    def step(self, state, dt, time):
        if self.host_coupled:
            return self._host_step(state, dt, time)
        return self._step(state, jnp.asarray(dt), jnp.asarray(time))

    def estimate_dt(self, state):
        return float(self._dt_fn(state))


@dataclass
class SimTime:
    time: float = 0.0
    dt: float = BIG
    ncycle: int = 0
    tlim: float = 1.0
    nlim: int = -1
    # runaway-run guards (<parthenon/time> dt_min / dt_max,
    # doc/src/running.rst:46-56): halt when dt leaves [dt_min, dt_max].
    # Checked at host sync points (per cycle when host-coupled, per
    # compiled chunk otherwise).
    dt_min: float = 0.0
    dt_max: float = BIG
    # True when (time, dt) came from a checkpoint: the stored dt already had
    # the 2x growth limit applied when it was written, so the first resumed
    # cycle must use it as-is (re-applying growth would double it twice
    # across the restart whenever dt is growth-limited)
    restored: bool = False


def evolve(driver: Driver, state, tm: SimTime, observers=None, log_every: int = 0,
           deadline: Optional[float] = None):
    """Outer evolution loop (EvolutionDriver::Execute equivalent).

    ``observers``: list of callables (state, tm) -> None, invoked after each
    cycle (used for history output).  ``deadline``: wall-clock time
    (perf_counter) after which the loop stops with status "timeout"
    (the reference's -t walltime flag, src/main.cpp:108-138).
    Returns (state, tm, zone_cycles_per_sec, status).
    """
    observers = observers or []
    ncells = int(np.prod(driver.grid.nx))
    t0 = _time.perf_counter()
    cycles0 = tm.ncycle

    def set_global_dt(grow: bool = True):
        """Parthenon SetGlobalTimeStep semantics: at most doubles the previous
        dt, takes the global CFL minimum, clamps the next step to tlim."""
        dt = 2.0 * tm.dt if (grow and tm.dt < 0.1 * BIG) else tm.dt
        dt = min(dt, driver.estimate_dt(state))
        if tm.time < tm.tlim and (tm.tlim - tm.time) < dt:
            dt = tm.tlim - tm.time
        tm.dt = dt

    def next_target():
        """Earliest observer event after now (observers fire on crossing)."""
        t = tm.tlim
        for obs in observers:
            ev = getattr(obs, "next_time", getattr(obs, "next", None))
            if ev is not None and ev > tm.time * (1.0 + 1e-14):
                t = min(t, ev)
        return t

    def check_dt_guards():
        """<parthenon/time> dt_min/dt_max runaway guards
        (doc/src/running.rst:46-56): halt with an error outside the
        range.  NaN compares false on both sides and is caught too."""
        if tm.time + tm.dt >= tm.tlim * (1.0 - 1e-12):
            return  # final tlim-clamped step may be arbitrarily small
        ok = tm.dt >= tm.dt_min and tm.dt <= tm.dt_max
        if not ok:
            raise RuntimeError(
                f"timestep dt={tm.dt:.6e} outside [dt_min={tm.dt_min:.6e}, "
                f"dt_max={tm.dt_max:.6e}] at cycle {tm.ncycle}, "
                f"t={tm.time:.6e} — halting (runaway run)")

    # a checkpointed dt was growth-limited at write time — use it as-is for
    # the first resumed cycle (the min/clamp below are idempotent on it)
    set_global_dt(grow=not tm.restored)
    tm.restored = False
    check_dt_guards()
    while tm.time < tm.tlim * (1.0 - 1e-12) and (tm.nlim < 0 or tm.ncycle < tm.nlim):
        if driver.host_coupled:
            # per-step python loop: particle advances interleave the stages
            state = driver.step(state, tm.dt, tm.time)
            tm.time += tm.dt
            tm.ncycle += 1
            set_global_dt()
            check_dt_guards()
        else:
            target = next_target()
            # compiled multi-step march to the next event (no host sync/step).
            # Chunks are bounded to a few hundred cycles so walltime
            # deadlines and SIGTERM are honored promptly (the reference
            # checks per-cycle; per-chunk is the compiled analogue — one
            # host sync per 256 steps is noise).
            chunk = tm.ncycle + 256
            nlim = chunk if tm.nlim < 0 else min(tm.nlim, chunk)
            state, t, dt, nc = driver._advance(
                state, jnp.asarray(tm.time), jnp.asarray(tm.dt),
                jnp.asarray(tm.ncycle), jnp.asarray(target),
                jnp.asarray(tm.tlim), jnp.asarray(nlim))
            tm.time = float(t)
            tm.dt = float(dt)
            tm.ncycle = int(nc)
            check_dt_guards()
        for obs in observers:
            obs(state, tm)
        if log_every:
            print(f"cycle={tm.ncycle} time={tm.time:.6e} dt={tm.dt:.6e}")
        unfinished = (tm.time < tm.tlim * (1.0 - 1e-12)
                      and (tm.nlim < 0 or tm.ncycle < tm.nlim))
        timed_out = (deadline is not None
                     and _time.perf_counter() > deadline)
        if (timed_out or STOP_REQUESTED) and unfinished:
            elapsed = _time.perf_counter() - t0
            zcps = ncells * (tm.ncycle - cycles0) / max(elapsed, 1e-30)
            return state, tm, zcps, "timeout"
    elapsed = _time.perf_counter() - t0
    zcps = ncells * (tm.ncycle - cycles0) / max(elapsed, 1e-30)
    return state, tm, zcps, "complete"
