"""Per-phase walltime attribution — the named-kernel profiling analogue.

The reference gets per-kernel timings from Kokkos profiling hooks over
its named kernels ("Gas::FluxSweep", radiation transport, ...;
SURVEY.md §5).  jax.profiler tracing hangs with the axon TPU plugin in
this image, so the equivalent here is explicit: each driver phase (RK
stage, operator-split radiation, CFL reduction) is jitted separately and
timed with a device-sync barrier over a fixed number of fixed-dt cycles.

Activate from the CLI with ``--profile N`` (N instrumented cycles are
timed and the table printed before the normal run) or call
``phase_table(sim)`` directly.  Phase granularity is the driver task
list, not individual XLA kernels — inside one fused stage use
``XLA_FLAGS=--xla_dump_to`` HLO dumps instead.
"""

from __future__ import annotations

import functools
import sys
import time
from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _sync(tree) -> None:
    """Barrier: fetch one scalar from the first array leaf (on the axon
    TPU tunnel ``block_until_ready`` can return before execution
    completes; a scalar fetch is the reliable sync point)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "shape") and getattr(leaf, "size", 0) > 0:
            np.asarray(jax.device_get(leaf.ravel()[0]))
            return


def _driver_phases(drv, state, dt, jit=jax.jit):
    """(ordered phase list, per-cycle runner) for the single-level
    Driver.  Each phase is its own jit; the runner threads the state."""
    integ = drv.integrator
    fluids = drv._fluids()
    stage_fns = [jit(drv._make_stage_fn(s))
                 for s in range(1, integ.nstages + 1)]
    rad_fn = None
    if drv.radiation is not None:
        rad_fn = jit(lambda st, d: drv.radiation.sync_gas(
            drv.radiation.step(st, d)))
    dt_fn = jit(drv._estimate_dt)

    names = [f"stage{s}" for s in range(1, integ.nstages + 1)]
    if rad_fn is not None:
        names.append("radiation")
    names.append("dt_estimate")

    def run_cycle(st, record):
        u1 = {name: st[name]["u"] for name, _ in fluids}
        t = jnp.asarray(0.0, dt.dtype)
        for s, fn in enumerate(stage_fns, start=1):
            with record(f"stage{s}"):
                st, _ = fn(st, u1, dt, t, None)
                _sync(st)
        if rad_fn is not None:
            with record("radiation"):
                st = rad_fn(st, dt)
                _sync(st)
        with record("dt_estimate"):
            d = dt_fn(st)
            _sync(d)
        return st

    return names, run_cycle


def _smr_phases(drv, state, dt, jit=jax.jit):
    """Phases for the SMR/AMR driver: per-RK-stage over the whole node
    tree, the per-level radiation pass, and the global CFL reduction."""
    smr = drv.smr
    drv._ensure_states(state)
    los = drv._los
    integ = smr.integ
    stage_fns = [jit(smr._make_stage(s))
                 for s in range(1, integ.nstages + 1)]
    rad_fn = None
    if smr.nodes[0].radiation is not None:
        rad_fn = jit(lambda sts, d: smr._radiation_pass(sts, d, los))
    dt_fn = jit(smr._estimate_dt)

    names = [f"stage{s}" for s in range(1, integ.nstages + 1)]
    if rad_fn is not None:
        names.append("radiation")
    names.append("dt_estimate")

    def run_cycle(states, record):
        u1s = [{fl: st[fl]["u"] for fl in st if fl != "rad"}
               for st in states]
        t = jnp.asarray(0.0, dt.dtype)
        for s, fn in enumerate(stage_fns, start=1):
            with record(f"stage{s}"):
                states, _ = fn(states, u1s, dt, t, los, None)
                _sync(states)
        if rad_fn is not None:
            with record("radiation"):
                states = rad_fn(states, dt)
                _sync(states)
        with record("dt_estimate"):
            d = dt_fn(states)
            _sync(d)
        return states

    return names, run_cycle, drv._states


class _Recorder:
    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.calls: Dict[str, int] = {}

    def __call__(self, name: str):
        rec = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *exc):
                el = time.perf_counter() - self.t0
                rec.totals[name] = rec.totals.get(name, 0.0) + el
                rec.calls[name] = rec.calls.get(name, 0) + 1
                return False

        return _Ctx()


def phase_table(sim, ncycles: int = 20, out=None) -> Dict[str, float]:
    """Time ``ncycles`` fixed-dt cycles phase-by-phase and print a
    Kokkos-Tools-style table.  Returns {phase: seconds}.  The state is
    NOT advanced in the caller's Simulation (a copy evolves here)."""
    out = out or sys.stderr
    drv = sim.driver
    dtype = (jnp.float32 if jax.tree_util.tree_leaves(sim.state)[0].dtype
             == jnp.float32 else None)
    dt = jnp.asarray(0.5 * float(drv.estimate_dt(sim.state)),
                     dtype=dtype)

    if hasattr(drv, "smr") and drv.smr.nbody is None:
        names, run_cycle, st = _smr_phases(drv, sim.state, dt)
    elif getattr(drv, "host_coupled", False):
        # nbody interleaves host particle advances between stages — time
        # the whole step (the per-stage split would need the particle
        # pytree threading)
        names = ["step"]
        st = sim.state

        def run_cycle(st, record):
            with record("step"):
                st2 = drv.step(st, float(dt), 0.0)
                _sync(st2)
            return st2
    else:
        names, run_cycle = _driver_phases(drv, sim.state, dt)
        st = sim.state

    rec = _Recorder()
    st = run_cycle(st, rec)          # compile warmup (not counted)
    rec.totals.clear()
    rec.calls.clear()
    for _ in range(ncycles):
        st = run_cycle(st, rec)

    total = sum(rec.totals.values()) or 1e-30
    print(f"# phase timings ({ncycles} cycles, per-phase device sync; "
          "granularity = driver task list)", file=out)
    print(f"{'phase':<16}{'calls':>7}{'seconds':>12}{'%':>8}", file=out)
    for name in names:
        s = rec.totals.get(name, 0.0)
        print(f"{name:<16}{rec.calls.get(name, 0):>7}{s:>12.4f}"
              f"{100.0 * s / total:>8.1f}", file=out)
    print(f"{'total':<16}{'':>7}{total:>12.4f}{100.0:>8.1f}", file=out)
    return dict(rec.totals)


def _kern_label(kern) -> str:
    """Human label for a pallas kernel callable (unwrap functools.partial
    down to the named kernel function)."""
    while isinstance(kern, functools.partial):
        kern = kern.func
    return getattr(kern, "__name__", "pallas_kernel").lstrip("_")


def kernel_table(sim, ncycles: int = 3, out=None) -> Dict[str, float]:
    """Per-Pallas-kernel walltime attribution — BELOW phase granularity
    (the per-kernel half of the Kokkos-Tools analogue; jax.profiler traces
    hang with the axon TPU plugin, so this times explicitly instead).

    One driver cycle is run EAGERLY (each op dispatches individually) with
    ``pallas_call`` temporarily wrapped so every fused-kernel launch is
    timed between an input sync and an output sync.  Eager dispatch
    serializes the surrounding jnp ops, so kernel walltimes are meaningful
    against EACH OTHER and as absolute device times; the "other (eager
    jnp)" residual is inflated vs the fused jitted step and is reported
    only as an upper bound.  Returns {kernel: seconds}.

    On a TUNNELED device (the axon TPU plugin) each per-launch sync pays
    the tunnel round-trip (~0.1s), so the devwait column is latency-bound
    for ms-scale kernels: use this table for WHICH kernels launch and how
    often, and ``tools/prof_kern.py`` (jitted 50-launch scan, one sync)
    for their absolute throughput.  On CPU (interpret mode) and locally
    attached devices the devwait column is the kernel time.
    """
    from jax.experimental import pallas as pl_mod

    out = out or sys.stderr
    drv = sim.driver
    dtype = (jnp.float32 if jax.tree_util.tree_leaves(sim.state)[0].dtype
             == jnp.float32 else None)
    dt = jnp.asarray(0.5 * float(drv.estimate_dt(sim.state)), dtype=dtype)

    eager = lambda f: f
    if hasattr(drv, "smr") and drv.smr.nbody is None:
        _, run_cycle, st = _smr_phases(drv, sim.state, dt, jit=eager)
    elif getattr(drv, "host_coupled", False):
        st = sim.state

        def run_cycle(st, record):
            with record("step"):
                return drv.step(st, float(dt), 0.0)
    else:
        _, run_cycle = _driver_phases(drv, sim.state, dt, jit=eager)
        st = sim.state

    rec = _Recorder()
    disp: Dict[str, float] = {}
    orig = pl_mod.pallas_call

    def timing_pallas_call(kern, *cargs, **ckw):
        inner = orig(kern, *cargs, **ckw)
        label = _kern_label(kern)

        def launch(*args, **kwargs):
            leaves = jax.tree_util.tree_leaves(args)
            if any(isinstance(a, jax.core.Tracer) for a in leaves):
                return inner(*args, **kwargs)   # traced: no timing
            for leaf in leaves:                 # drain the input queue
                if hasattr(leaf, "shape") and getattr(leaf, "size", 0) > 0:
                    np.asarray(jax.device_get(leaf.ravel()[0]))
            # each eager launch re-traces the kernel in Python; time the
            # device wait (dispatch -> sync) separately so the Python
            # trace/lower tail doesn't pollute the kernel attribution.
            # Execution overlaps the dispatch tail, so the wait column is
            # a lower bound on device time and dispatch an upper bound.
            t0 = time.perf_counter()
            outs = inner(*args, **kwargs)
            t1 = time.perf_counter()
            _sync(outs)
            t2 = time.perf_counter()
            rec.totals[label] = rec.totals.get(label, 0.0) + (t2 - t1)
            rec.calls[label] = rec.calls.get(label, 0) + 1
            disp[label] = disp.get(label, 0.0) + (t1 - t0)
            return outs

        return launch

    pl_mod.pallas_call = timing_pallas_call
    try:
        st = run_cycle(st, _null_record)   # warmup (kernel compiles)
        rec.totals.clear()
        rec.calls.clear()
        t0 = time.perf_counter()
        for _ in range(ncycles):
            st = run_cycle(st, _null_record)
        wall = time.perf_counter() - t0
    finally:
        pl_mod.pallas_call = orig

    ksum = sum(rec.totals.values())
    print(f"# pallas kernel timings ({ncycles} eager cycles; device wait = "
          "dispatch->sync, lower bound on device time)", file=out)
    print(f"{'kernel':<28}{'calls':>7}{'devwait_s':>12}{'%':>8}"
          f"{'dispatch_s':>12}", file=out)
    for name, s in sorted(rec.totals.items(), key=lambda kv: -kv[1]):
        print(f"{name:<28}{rec.calls.get(name, 0):>7}{s:>12.4f}"
              f"{100.0 * s / (ksum or 1e-30):>8.1f}"
              f"{disp.get(name, 0.0):>12.4f}", file=out)
    print(f"{'all kernels':<28}{'':>7}{ksum:>12.4f}{100.0:>8.1f}", file=out)
    print(f"# eager-cycle walltime {wall:.4f}s; non-kernel residual "
          f"{max(0.0, wall - ksum):.4f}s (UPPER bound — eager dispatch "
          "overhead, fused away under jit)", file=out)
    return dict(rec.totals)


class _NullCtx:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _null_record(name):  # noqa: ARG001 — kernel_table times launches, not phases
    return _NullCtx()
