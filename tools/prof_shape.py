"""North-star shape study: z-c/s of the AMR disk RHD composition as the
root:fine ratio varies.  The headline metric (BASELINE.json) pins the
COMPOSITION (AMR disk RHD), not the grid — in production AMR the refined
level covers a small fraction of the domain, so the glue/restriction
surface amortizes over the root volume.  This tool measures that directly:
the refinement window stays at the reference deck's physical bounds while
the root domain (and grid) grows at fixed cell size.

Usage: python tools/prof_shape.py [NX NY NZ DOMXY [WINXY WINZ]]
  NX NY NZ  — root grid (default 512 512 64)
  DOMXY     — half-width of the x/y domain (default 4.0; z stays +-0.5)
  WINXY/WINZ — half-widths of the static_refinement1 window
               (default 1.0 / 0.25 — the deck values)
"""
import os
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys as _sys
_sys.path.insert(0, _ROOT)
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from artemis_tpu.simulation import Simulation

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ny = int(sys.argv[2]) if len(sys.argv) > 2 else 512
nz = int(sys.argv[3]) if len(sys.argv) > 3 else 64
dom = float(sys.argv[4]) if len(sys.argv) > 4 else 4.0
winxy = float(sys.argv[5]) if len(sys.argv) > 5 else 1.0
winz = float(sys.argv[6]) if len(sys.argv) > 6 else 0.25

overrides = [
    "artemis/precision=float32",
    f"parthenon/mesh/nx1={nx}", f"parthenon/mesh/nx2={ny}",
    f"parthenon/mesh/nx3={nz}",
    f"parthenon/mesh/x1min={-dom}", f"parthenon/mesh/x1max={dom}",
    f"parthenon/mesh/x2min={-dom}", f"parthenon/mesh/x2max={dom}",
    f"parthenon/static_refinement1/x1min={-winxy}",
    f"parthenon/static_refinement1/x1max={winxy}",
    f"parthenon/static_refinement1/x2min={-winxy}",
    f"parthenon/static_refinement1/x2max={winxy}",
    f"parthenon/static_refinement1/x3min={-winz}",
    f"parthenon/static_refinement1/x3max={winz}",
]
sim = Simulation(os.path.join(_ROOT, "inputs", "disk_rhd_amr.in"),
                 overrides=overrides, data_dir="/tmp/prof_shape")
drv = sim.driver
drv._ensure_states(sim.state)
smr, los = drv.smr, drv._los
dt = jnp.asarray(0.3 * float(drv.estimate_dt(sim.state)), dtype=jnp.float32)
zones = sum(int(np.prod(n.grid.nx)) for n in smr.nodes)
for n in smr.nodes:
    print(f"node {n.index}: level {n.level} nx {tuple(n.grid.nx)}",
          file=sys.stderr)
print(f"zones: {zones}  dt: {float(dt):.3e}", file=sys.stderr)

nsteps = int(os.environ.get("BENCH_STEPS", "50"))
reps = int(os.environ.get("BENCH_REPS", "3"))


def multi(states, dt):
    def body(s, _):
        return smr._step(s, dt, jnp.asarray(0.0, dt.dtype), los, None), None
    s, _ = lax.scan(body, states, None, length=nsteps)
    return s


mstep = jax.jit(multi)


def drain(s):
    return float(jnp.sum(s[0]["gas"]["u"][0, 0, 0, 0]))


t0 = time.perf_counter()
states = mstep(drv._states, dt)
drain(states)
print(f"compile+warm: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
best = 0.0
for _ in range(reps):
    t0 = time.perf_counter()
    states = mstep(states, dt)
    drain(states)
    el = time.perf_counter() - t0
    best = max(best, zones * nsteps / el)
    print(f"  rep: {zones * nsteps / el:.4e} z-c/s "
          f"({el / nsteps * 1e3:.2f} ms/cycle)", file=sys.stderr)
d0 = np.asarray(sim.state["gas"]["w"][0, 0], dtype=np.float64)
d = np.asarray(states[0]["gas"]["w"][0, 0], dtype=np.float64)
l2 = float(np.sqrt((d0 * (d - d0) ** 2).sum()) / d0.sum())
print(f"best: {best:.4e} z-c/s  f32 L2 drift {l2:.3e}")
