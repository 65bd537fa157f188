"""RHD-AMR cost-split ablations (TPU). Usage: python tools/prof_rhd.py VARIANT
VARIANT:
  full     — the bench config as-is
  norad    — radiation disabled (isolates the FLD share)
  root     — no refinement patch (isolates the whole AMR overhead:
             prolongation, rim deltas, restriction, re-sync)
  nofused  — ARTEMIS_PALLAS=0 jnp path (kernel win)
Grid via BENCH_RHD_NX/NY/NZ (default 128x128x32).
"""
import os
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))  # repo root
import sys as _sys; _sys.path.insert(0, _ROOT)  # import artemis_tpu without chdir side effects
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
variant = sys.argv[1] if len(sys.argv) > 1 else "full"
if variant == "nofused":
    os.environ["ARTEMIS_PALLAS"] = "0"

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from artemis_tpu.simulation import Simulation

nx = int(os.environ.get("BENCH_RHD_NX", "128"))
ny = int(os.environ.get("BENCH_RHD_NY", "128"))
nz = int(os.environ.get("BENCH_RHD_NZ", "32"))
overrides = ["artemis/precision=float32",
             f"parthenon/mesh/nx1={nx}", f"parthenon/mesh/nx2={ny}",
             f"parthenon/mesh/nx3={nz}"]
if variant == "norad":
    overrides.append("physics/radiation=false")
if variant == "root":
    overrides.append("parthenon/mesh/refinement=none")
sim = Simulation(os.path.join(_ROOT, "inputs", "disk_rhd_amr.in"), overrides=overrides,
                 data_dir="/tmp/prof_rhd")
drv = sim.driver
nsteps = int(os.environ.get("BENCH_STEPS", "50"))

if hasattr(drv, "smr"):
    drv._ensure_states(sim.state)
    smr, los = drv.smr, drv._los
    dt = jnp.asarray(0.3 * float(drv.estimate_dt(sim.state)),
                     dtype=jnp.float32)
    zones = sum(int(np.prod(n.grid.nx)) for n in smr.nodes)
    print(f"fused: {smr._fused is not None}  zones: {zones}",
          file=sys.stderr)

    def multi(states, dt):
        def body(s, _):
            return smr._step(s, dt, jnp.asarray(0.0, dt.dtype), los,
                             None), None
        s, _ = lax.scan(body, states, None, length=nsteps)
        return s

    mstep = jax.jit(multi)
    states0 = drv._states

    def drain(s):
        return float(jnp.sum(s[0]["gas"]["u"][0, 0, 0, 0]))
else:
    smr = None
    dt = jnp.asarray(0.3 * float(drv.estimate_dt(sim.state)),
                     dtype=jnp.float32)
    zones = int(np.prod(sim.grid.nx))
    step = drv._build_step()
    # the fused path's state may carry a dtden CFL entry that the step
    # consumes without returning; scanning needs a structure-stable
    # carry.  Match the carry to the step's OUTPUT structure with a
    # trace-only eval_shape (no extra whole-step compile).
    out_sd = jax.eval_shape(step, sim.state, dt, 0.0)
    if "dtden" in sim.state["gas"] and "dtden" not in out_sd["gas"]:
        g = dict(sim.state["gas"])
        g.pop("dtden")
        sim.state = {**sim.state, "gas": g}

    def multi(state, dt):
        def body(s, _):
            return step(s, dt, 0.0), None
        s, _ = lax.scan(body, state, None, length=nsteps)
        return s

    mstep = jax.jit(multi)
    states0 = sim.state

    def drain(s):
        return float(jnp.sum(s["gas"]["u"][0, 0, 0, 0]))

states = mstep(states0, dt)
drain(states)
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    states = mstep(states, dt)
    drain(states)
    best = max(best, zones * nsteps / (time.perf_counter() - t0))
print(f"{variant} {nx}x{ny}x{nz}: {best:.4e} z-c/s")
