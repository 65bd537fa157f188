"""Top-level simulation assembly (reference: src/artemis.cpp ProcessPackages
+ src/main.cpp LaunchWorkFlow).

Reads the input deck, wires the enabled physics packages, builds the problem
generator and driver, and runs the evolution loop.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np

from .config import ParameterInput
from .driver import Driver, Integrator, SimTime, evolve
from .eos import eos_from_input
from .grid import grid_from_input
from .ops.hydro import FluidCfg
from .pgen import build_problem
from .units import Constants, Units


def _enable_x64():
    jax.config.update("jax_enable_x64", True)


def _set_precision(pin):
    """<artemis> precision = float64 (default) | float32.  float32 enables
    the fused Pallas fast path on TPU (pallas custom calls have no f64
    lowering) and is the intended production mode on TPU hardware."""
    prec = pin.get_or_add_str("artemis", "precision", "float64")
    if prec == "float64":
        _enable_x64()
    elif prec == "float32":
        # x64 must be OFF or the f64 geometry constants promote every mixed
        # operation (and with it the whole state) back to f64
        jax.config.update("jax_enable_x64", False)
    else:
        raise ValueError(f"unknown precision {prec!r}")
    # debug mode: trap the first NaN with its location (the reference ships
    # ASAN/Kokkos bounds-check presets, CMakeLists.txt:117-120; the JAX
    # equivalent of "which kernel produced the NaN" is jax_debug_nans)
    if os.environ.get("ARTEMIS_DEBUG") == "1":
        jax.config.update("jax_debug_nans", True)
        print("# artemis_tpu: debug mode (jax_debug_nans) enabled")


class _NBodyOutputs:
    """Writes the N-body .reb/.orb files at the <nbody> dt_output cadence
    (cf. NBody::Outputs, nbody_outputs.cpp)."""

    def __init__(self, sim):
        self.sim = sim
        self.dt_out = sim.pin.get_or_add_real("nbody", "dt_output", 1.0e300)
        self.pid = sim.pin.get_or_add_str("parthenon/job", "problem_id", "artemis")
        self.next = 0.0

    def start(self, state, tm):
        self.sim.nbody.write_outputs(self.sim.data_dir, self.pid, tm.time)
        self.next = self.dt_out

    def resume(self, state, tm):
        import numpy as _np

        self.next = (_np.floor(tm.time / self.dt_out * (1.0 + 1e-12)) + 1) * self.dt_out

    def __call__(self, state, tm):
        import numpy as _np

        if tm.time >= self.next * (1.0 - 1e-12):
            self.sim.nbody.write_outputs(self.sim.data_dir, self.pid, tm.time)
            self.next = (_np.floor(tm.time / self.dt_out * (1.0 + 1e-12)) + 1) * self.dt_out

    @property
    def next_time(self):
        return self.next


class Simulation:
    def __init__(
        self,
        deck: str,
        overrides: Sequence[str] = (),
        data_dir: str = ".",
        is_path: Optional[bool] = None,
        nshards: int = 1,
        restart: Optional[str] = None,
    ):
        if is_path is None:
            is_path = os.path.exists(deck)
        pin = ParameterInput.from_file(deck) if is_path else ParameterInput.from_string(deck)
        pin.apply_overrides(overrides)
        _set_precision(pin)
        self.pin = pin
        self.data_dir = data_dir
        os.makedirs(data_dir, exist_ok=True)

        self.units = Units.from_input(pin)
        self.constants = Constants.from_units(self.units)

        # physics selection (artemis.cpp:63-91)
        self.do_gas = pin.get_or_add_bool("physics", "gas", True)
        self.do_dust = pin.get_or_add_bool("physics", "dust", False)

        self.grid = grid_from_input(pin)

        def _check(kind, val, allowed):
            if val not in allowed:
                raise ValueError(f"{kind} {val!r} not recognized (choices: {allowed})")

        gas_cfg = None
        if self.do_gas:
            eos = eos_from_input(pin, self.constants)
            recon = pin.get_or_add_str("gas", "reconstruct", "plm")
            rsolver = pin.get_or_add_str("gas", "riemann", "hllc")
            _check("reconstruction", recon, ("pcm", "plm", "ppm"))
            _check("riemann solver", rsolver, ("hllc", "hlle", "llf"))
            gas_cfg = FluidCfg(
                fluid="gas",
                recon=recon,
                rsolver=rsolver,
                gamma=eos.gamma,
                cv=eos.cv,
                cfl=pin.get_or_add_real("gas", "cfl", 0.8),
                dfloor=pin.get_or_add_real("gas", "dfloor", 1.0e-20),
                siefloor=pin.get_or_add_real("gas", "siefloor", 1.0e-20),
                de_switch=pin.get_or_add_real("gas", "de_switch", 0.0),
                nspecies=pin.get_or_add_int("gas", "nspecies", 1),
            )
            self.eos = eos
        dust_cfg = None
        if self.do_dust:
            drecon = pin.get_or_add_str("dust", "reconstruct", "plm")
            drsolver = pin.get_or_add_str("dust", "riemann", "hlle")
            _check("reconstruction", drecon, ("pcm", "plm", "ppm"))
            _check("riemann solver (dust)", drsolver, ("hlle", "llf"))
            dust_cfg = FluidCfg(
                fluid="dust",
                recon=drecon,
                rsolver=drsolver,
                cfl=pin.get_or_add_real("dust", "cfl", 0.8),
                dfloor=pin.get_or_add_real("dust", "dfloor", 1.0e-20),
                nspecies=pin.get_or_add_int("dust", "nspecies", 1),
            )
        self.gas_cfg = gas_cfg
        self.dust_cfg = dust_cfg

        # problem generator (may reset tlim etc.)
        problem_name = pin.get_str("artemis", "problem")
        self.problem = build_problem(problem_name, pin, self.grid, gas_cfg, dust_cfg)

        # physics source packages (artemis.cpp:63-164 wiring order)
        from .sources import sources_from_input

        omf = 0.0
        if pin.get_or_add_bool("physics", "rotating_frame", False):
            omf = pin.get_or_add_real("rotating_frame", "omega", 0.0)

        # N-body package (replicated deterministic few-body system)
        self.nbody = None
        if pin.get_or_add_bool("physics", "nbody", False):
            from .nbody import NBodySystem

            self.nbody = NBodySystem(pin, self.constants, omf=omf)

        from .sources import Gravity as _Gravity

        srcs = sources_from_input(pin, self.grid, gas_cfg, dust_cfg,
                                  self.constants, nbody_sys=self.nbody)
        srcs += list(self.problem.sources)
        for s in srcs:
            # binary-orbit gravity solves its orbit in the rotating frame
            if isinstance(s, _Gravity) and s.gtype == "binary":
                s.omf = omf

        # diffusion (viscosity / conduction) — gas only (gas.cpp:180-198)
        diffusion_factory = None
        visc = cond = None
        do_visc = pin.get_or_add_bool("physics", "viscosity", False)
        do_cond = pin.get_or_add_bool("physics", "conduction", False)
        if (do_visc or do_cond) and gas_cfg is not None:
            from .ops.diffusion import DiffParams, Diffusion as _Diffusion

            gm = None
            for s in srcs:
                if hasattr(s, "gm"):
                    gm = s.gm
            visc = (DiffParams.from_input("gas/viscosity", "viscosity", pin, gm)
                    if do_visc else None)
            cond = (DiffParams.from_input("gas/conductivity", "conductivity", pin, gm)
                    if do_cond else None)
            diffusion_factory = lambda hyd: _Diffusion(
                hyd.grid, hyd, gas_cfg, visc, cond)
            # damp_to_visc: the drag damping target is the viscous inflow
            # of this viscosity model (drag.cpp:109-121)
            from .sources import Drag as _Drag

            for s in srcs:
                if isinstance(s, _Drag) and s.gasp.damp_to_visc:
                    s.set_viscosity(visc)

        from .sources import Drag as _DragChk

        for s in srcs:
            if isinstance(s, _DragChk) and s.gasp.damp_to_visc \
                    and s.visc_dp is None:
                raise ValueError("damp_to_visc requires gas viscosity "
                                 "(drag.cpp:109-121)")

        # radiation (gray FLD, replacing the reference's jaybenne IMC)
        radiation_factory = None
        self.radiation_cfg = None
        if pin.get_or_add_bool("physics", "radiation", False):
            from .radiation import Radiation as _Radiation, radiation_from_input

            self.radiation_cfg = radiation_from_input(pin, self.constants, gas_cfg)
            rc = self.radiation_cfg
            radiation_factory = lambda hyd: _Radiation(rc, hyd.grid, hyd, gas_cfg)

        integrator = Integrator.make(pin.get_or_add_str("parthenon/time", "integrator", "rk2"))
        refinement = pin.get_or_add_str("parthenon/mesh", "refinement", "none")
        if refinement != "none":
            # deck-driven N-level block refinement with all physics
            # packages on every level (Parthenon AMR equivalent)
            from .amr import SMRDriver
            from .sources import Drag as _DragF

            shard_kw = {}
            if nshards > 1:
                from .parallel.mesh import make_device_mesh

                axis_key = pin.get_or_add_str("parthenon/mesh",
                                              "shard_axis", "auto")
                if axis_key == "auto":
                    shard_axis = None
                    for d in (3, 2, 1):
                        nd = self.grid.nx[d - 1]
                        if (nd > 1 and nd % nshards == 0
                                and nd // nshards >= 2
                                and self.grid.bc[d - 1]
                                == ("periodic", "periodic")):
                            shard_axis = d
                            break
                    if shard_axis is None:
                        raise ValueError(
                            "sharded refinement needs a periodic axis "
                            f"divisible into {nshards} shards")
                else:
                    shard_axis = {"x1": 1, "x2": 2, "x3": 3}[axis_key]
                shard_kw = dict(nshards=nshards, shard_axis=shard_axis,
                                mesh=make_device_mesh(nshards))
                self.problem.bc_custom = self._shard_bc_custom(
                    self.problem.bc_custom, problem_name, pin, gas_cfg,
                    dust_cfg, nshards, shard_axis)

            def src_factory(g):
                if g is self.grid:
                    return srcs
                ss = sources_from_input(pin, g, gas_cfg, dust_cfg,
                                        self.constants, nbody_sys=self.nbody)
                pb = build_problem(problem_name,
                                   ParameterInput.from_string(repr(pin)),
                                   g, gas_cfg, dust_cfg)
                ss += list(pb.sources)
                for s in ss:
                    if isinstance(s, _Gravity) and s.gtype == "binary":
                        s.omf = omf
                    if isinstance(s, _DragF) and s.gasp.damp_to_visc:
                        s.set_viscosity(visc)
                return ss

            self.driver = SMRDriver(
                self.grid, integrator, gas_cfg, pin, dust_cfg=dust_cfg,
                sources_factory=src_factory,
                diffusion_factory=diffusion_factory,
                bc_custom=self.problem.bc_custom, omf=omf, nbody=self.nbody,
                radiation_factory=radiation_factory, **shard_kw)
            # problem-defined refinement criterion (artemis.cpp:149-150)
            if pin.get_or_add_bool("artemis", "amr_user", False):
                if self.problem.amr_criterion is None:
                    raise ValueError(
                        f"{problem_name}: user-defined AMR criterion not "
                        "implemented (amr_user = true needs the problem "
                        "generator to provide Problem.amr_criterion)")
                self.driver.user_criterion = self.problem.amr_criterion
            # fine-level ICs from the problem generator on each patch grid
            # (GLOBAL grids — sharded trees hold local windows in nodes)
            fine = []
            for g_node in self.driver.smr.ic_grids[1:]:
                pb = build_problem(problem_name,
                                   ParameterInput.from_string(repr(pin)),
                                   g_node, gas_cfg, dust_cfg)
                fine.append(dict(pb.prims))
            self.driver._fine_prims = fine
        elif nshards > 1:
            from .geometry import geometry as _geo
            from .parallel.mesh import ShardedDriver, make_device_mesh

            # shard-axis selection: x3 whenever it works (metric is always
            # x3-independent, so geometry stays a shared constant); x1/x2
            # decompose any geometry — curvilinear geometry fields become
            # lazy per-shard views of the global build
            axis_key = pin.get_or_add_str("parthenon/mesh", "shard_axis", "auto")
            if axis_key == "auto":
                shard_axis = None
                for d in (3, 2, 1):
                    nd = self.grid.nx[d - 1]
                    if nd > 1 and nd % nshards == 0 and nd // nshards >= 2:
                        shard_axis = d
                        break
                if shard_axis is None:
                    raise ValueError(
                        f"no grid axis divisible into {nshards} shards")
            else:
                shard_axis = {"x1": 1, "x2": 2, "x3": 3}[axis_key]
            # sources precompute interior-shaped coordinate fields, so the
            # sharded driver rebuilds them against each shard-local grid
            src_factory = lambda g: (sources_from_input(
                pin, g, gas_cfg, dust_cfg, self.constants,
                nbody_sys=self.nbody)
                + list(self.problem.sources))
            # custom BCs close over grid-shaped value caches.  Fills that
            # declare shard_caches (disk ic) use the GLOBAL build with the
            # cache entries swapped for per-shard window views; the rest
            # come from the shard-0 build and must be window-invariant on
            # the transverse boundaries (sharded-axis edge fills receive
            # the edge-local grids at fill time)
            bc_custom = self._shard_bc_custom(
                self.problem.bc_custom, problem_name, pin, gas_cfg, dust_cfg,
                nshards, shard_axis)
            self.driver = ShardedDriver(
                self.grid,
                integrator,
                gas_cfg,
                dust_cfg,
                sources_factory=src_factory,
                bc_custom=bc_custom,
                mesh=make_device_mesh(nshards),
                omf=omf,
                diffusion=diffusion_factory,
                axis=shard_axis,
                radiation=radiation_factory,
                nbody=self.nbody,
            )
        else:
            self.driver = Driver(
                self.grid,
                integrator,
                gas_cfg,
                dust_cfg,
                sources=srcs,
                bc_custom=self.problem.bc_custom,
                omf=omf,
                diffusion=diffusion_factory,
                nbody=self.nbody,
                radiation=radiation_factory,
            )

        # initial state (fresh from the problem generator, or from a restart
        # checkpoint: doc/src/running.rst:198-206, `-r name.final.rst`)
        import jax.numpy as jnp

        self.restarted = restart is not None
        if restart is not None:
            from .io.dumps import load_restart

            arrays, meta, payloads = load_restart(restart)
            self.state = {
                name: {k: jnp.asarray(v) for k, v in kinds.items()}
                for name, kinds in arrays.items()
            }
            if hasattr(self.driver, "prepare_state"):
                self.state = self.driver.prepare_state(self.state)
            self._restart_in_payloads = payloads
            if self.nbody is not None and "nbody" in payloads:
                self.nbody.load_restart(payloads["nbody"])
            amr_pl = {k.removeprefix("amr."): v for k, v in payloads.items()
                      if k.startswith("amr.")}
            if amr_pl and hasattr(self.driver, "load_restart"):
                self.driver.load_restart(amr_pl, self.state)
            if hasattr(self.driver, "_ncycle"):
                # retag/regrid cadence counts GLOBAL cycles: a restarted
                # run must regrid on the same cycles as a straight run
                self.driver._ncycle = meta["ncycle"]
            self.tm = SimTime(
                time=meta["time"],
                dt=meta["dt"],
                ncycle=meta["ncycle"],
                tlim=pin.get_real("parthenon/time", "tlim"),
                nlim=pin.get_or_add_int("parthenon/time", "nlim", -1),
                dt_min=pin.get_or_add_real("parthenon/time", "dt_min", 0.0),
                dt_max=pin.get_or_add_real("parthenon/time", "dt_max",
                                           1.0e300),
                restored=True,
            )
            if self.problem.on_restart is not None:
                self.problem.on_restart(self, payloads)
        else:
            state = {}
            for name, w in self.problem.prims.items():
                state[name] = {"u": None, "w": jnp.asarray(w)}
            self.state = self.driver.initialize(state)
            if self.radiation_cfg is not None:
                rc = self.radiation_cfg
                rad_T = getattr(self.problem, "rad_temp", None)
                if rad_T is not None:
                    Er = jnp.asarray(rc.arad * np.asarray(rad_T)[None] ** 4)
                else:
                    from .radiation import initialize_radiation

                    Er = initialize_radiation(self.state, gas_cfg, rc)["Er"]
                self.state["rad"] = {"Er": Er}
            self.tm = SimTime(
                time=0.0,
                tlim=pin.get_real("parthenon/time", "tlim"),
                nlim=pin.get_or_add_int("parthenon/time", "nlim", -1),
                dt_min=pin.get_or_add_real("parthenon/time", "dt_min", 0.0),
                dt_max=pin.get_or_add_real("parthenon/time", "dt_max",
                                           1.0e300),
            )
        if self.radiation_cfg is not None:
            self._set_radiation_ic_edges()

    def _set_radiation_ic_edges(self):
        """Pin the FLD field outside `ic` boundaries to the IC equilibrium.

        The reference holds ghost zones at the IC for ix/ox*_bc = ic
        (shock.hpp decks); the FLD analogue is a Dirichlet edge at the IC
        radiation energy instead of a zero-flux wall — otherwise the
        precursor flux reflects back into the domain and the steady
        radiative-shock profile diverges from the semi-analytic solution
        (analysis/rad_shock_exact.py).  Values derive from the problem
        generator (not the evolved state) so restarts behave identically."""
        rc = self.radiation_cfg
        rad_T = getattr(self.problem, "rad_temp", None)
        if rad_T is not None:
            Er0 = rc.arad * np.asarray(rad_T) ** 4
        else:
            wg = np.asarray(self.problem.prims["gas"])
            Er0 = rc.arad * (wg[0, 5] / self.gas_cfg.cv) ** 4
        rads = []
        drv = self.driver
        if hasattr(drv, "smr"):
            rads = [n.radiation for n in drv.smr.nodes
                    if n.parent is None and n.radiation is not None]
        elif getattr(drv, "radiation", None) is not None:
            rads = [drv.radiation]
        for d in (1, 2, 3):
            if self.grid.nx[d - 1] <= 1:
                continue
            inner, outer = self.grid.bc[d - 1]
            ax = Er0.ndim - d
            lo = float(np.take(Er0, 0, axis=ax).mean()) \
                if inner == "ic" else None
            hi = float(np.take(Er0, -1, axis=ax).mean()) \
                if outer == "ic" else None
            if lo is None and hi is None:
                continue
            for r in rads:
                r.set_edge_dirichlet(d, lo=lo, hi=hi)

    def print_config(self):
        """Startup configuration banner (cf. PrintArtemisConfiguration,
        src/utils/artemis_utils.cpp:24-87)."""
        pin = self.pin
        lines = [
            "=" * 60,
            f"artemis_tpu  |  problem = {pin.get_str('artemis', 'problem')}"
            f"  |  coords = {self.grid.coords}",
            f"mesh {self.grid.nx[0]}x{self.grid.nx[1]}x{self.grid.nx[2]}"
            f"  nghost={self.grid.nghost}  tlim={self.tm.tlim:g}",
        ]
        if self.gas_cfg:
            c = self.gas_cfg
            lines.append(f"gas: {c.recon}+{c.rsolver} gamma={c.gamma:g} "
                         f"cfl={c.cfl:g} nspecies={c.nspecies}")
        if self.dust_cfg:
            lines.append(f"dust: {self.dust_cfg.recon}+{self.dust_cfg.rsolver} "
                         f"nspecies={self.dust_cfg.nspecies}")
        pkgs = [type(s).__name__ for s in self.driver.sources]
        pkgs += [p for p, on in (
            ("nbody", self.nbody is not None),
            ("radiation", self.radiation_cfg is not None),
            ("diffusion", self.driver.diffusion is not None),
        ) if on]
        if pkgs:
            lines.append("packages: " + ", ".join(pkgs))
        lines.append("=" * 60)
        print("\n".join(lines))

    def _make_observers(self):
        """Attach outputs declared in the deck (<parthenon/outputN> blocks)."""
        from .io.history import HistoryOutput

        from .io.dumps import FieldOutput, RestartOutput

        obs = []
        pid = self.pin.get_or_add_str("parthenon/job", "problem_id", "artemis")
        for block in self.pin.block_names():
            if not block.startswith("parthenon/output"):
                continue
            ftype = self.pin.get_or_add_str(block, "file_type", "hst")
            dt_out = self.pin.get_or_add_real(block, "dt", -1.0)
            n = block.removeprefix("parthenon/output")
            if dt_out <= 0.0:
                continue
            base = os.path.join(self.data_dir, f"{pid}.out{n}")
            if ftype == "hst":
                fname = base + ".hst"
                # restarts append to the existing history (Parthenon
                # behavior); fresh runs start clean
                if not self.restarted and os.path.exists(fname):
                    os.remove(fname)
                obs.append(HistoryOutput(self, dt_out, fname))
            elif ftype == "hdf5":
                variables = (self.pin.get_list(block, "variables")
                             if self.pin.exists(block, "variables") else None)
                obs.append(FieldOutput(self, dt_out, base, variables))
            elif ftype == "rst":
                obs.append(RestartOutput(self, dt_out, base))
        if self.nbody is not None and not self.pin.get_or_add_bool(
                "nbody", "disable_outputs", False):   # nbody_outputs.cpp:35
            obs.append(_NBodyOutputs(self))
        return obs

    def _shard_bc_custom(self, bc_custom, problem_name, pin, gas_cfg,
                         dust_cfg, nshards, shard_axis):
        """Per-shard-localize custom-BC value caches for a sharded run:
        fills declaring ``shard_caches`` get per-shard window views of the
        GLOBAL build; the rest come from the shard-0 build and are checked
        window-invariant on the transverse boundaries."""
        if not bc_custom or nshards <= 1:
            return bc_custom
        from .parallel.mesh import (_local_grid_at, check_bc_x3_independent,
                                    localize_bc_caches)
        from .pgen import build_problem

        n_local = self.grid.nx[shard_axis - 1] // nshards
        loc0 = _local_grid_at(self.grid, nshards, 0, shard_axis)
        p0 = build_problem(problem_name, ParameterInput.from_string(repr(pin)),
                           loc0, gas_cfg, dust_cfg)
        localized = localize_bc_caches(bc_custom, p0.bc_custom,
                                       n_local, shard_axis, nshards)
        rest = {k: v for k, v in p0.bc_custom.items() if k not in localized}
        if rest:
            loc1 = _local_grid_at(self.grid, nshards, 1, shard_axis)
            p1 = build_problem(problem_name,
                               ParameterInput.from_string(repr(pin)),
                               loc1, gas_cfg, dust_cfg)
            check_bc_x3_independent(
                rest, {k: p1.bc_custom[k] for k in rest}, loc0,
                gas_cfg, dust_cfg, skip_d=shard_axis)
        return {k: (bc_custom[k] if k in localized else p0.bc_custom[k])
                for k in bc_custom}

    @property
    def restart_payloads(self):
        """name -> fn() -> np.ndarray restart extras, rebuilt per access:
        tag-driven spawn/destroy regrids change the AMR payload set at
        runtime, so the dump observer must see the CURRENT tree."""
        out = {}
        if self.nbody is not None:
            out["nbody"] = self.nbody.restart_payload
        if hasattr(self.driver, "restart_payloads"):
            # fine-level AMR states (bit-exact restarts incl. refinement)
            for key, fn in self.driver.restart_payloads().items():
                out[f"amr.{key}"] = fn
        return out

    def run(self, log_every: int = 0, extra_observers=(), walltime=None):
        import time as _t

        deadline = (_t.perf_counter() + walltime) if walltime else None
        observers = self._make_observers() + list(extra_observers)
        for ob in observers:
            # restarts resume counters/boundaries instead of re-emitting t=0
            # outputs (which would duplicate the original run's)
            if self.restarted and hasattr(ob, "resume"):
                ob.resume(self.state, self.tm)
            elif hasattr(ob, "start"):
                ob.start(self.state, self.tm)
        self.state, self.tm, zcps, self.status = evolve(
            self.driver, self.state, self.tm, observers=observers,
            log_every=log_every, deadline=deadline
        )
        for ob in observers:
            if hasattr(ob, "finish"):
                ob.finish(self.state, self.tm)
        if self.problem.after_loop is not None and self.status == "complete":
            self.problem.after_loop(self.grid, self.pin, self.state, self.tm, self.data_dir)
        return zcps
