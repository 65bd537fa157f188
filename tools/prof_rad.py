"""FLD CG iteration-count profiler for the north-star rhd config.

Jits the hydro step and a with_iters radiation solve on the ROOT node of
the AMR disk RHD composition and reports the per-Newton-outer CG
iteration counts over several cycles — the radiation pass costs
coupled_iters x CG(7-pt matvec) full-grid passes per node per step, so
these counts ARE the radiation cost model (see bench.py rhd leg).
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, _ROOT)

import jax                   # noqa: E402
import jax.numpy as jnp      # noqa: E402

from artemis_tpu.simulation import Simulation  # noqa: E402


def main():
    nx = int(os.environ.get("BENCH_RHD_NX", "256"))
    ny = int(os.environ.get("BENCH_RHD_NY", "256"))
    nz = int(os.environ.get("BENCH_RHD_NZ", "64"))
    nsteps = int(os.environ.get("PROF_RAD_STEPS", "20"))
    deck = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "inputs", "disk_rhd_amr.in")
    sim = Simulation(deck, overrides=[
        "artemis/precision=float32",
        f"parthenon/mesh/nx1={nx}",
        f"parthenon/mesh/nx2={ny}",
        f"parthenon/mesh/nx3={nz}",
    ], data_dir="/tmp/prof_rad")
    drv = sim.driver
    drv._ensure_states(sim.state)
    smr, los = drv.smr, drv._los
    root = smr.nodes[0]
    dt = jnp.asarray(0.3 * float(drv.estimate_dt(sim.state)),
                     dtype=jnp.float32)

    @jax.jit
    def hydro_step(states):
        return smr._step(states, dt, jnp.asarray(0.0, jnp.float32), los,
                         None)

    @jax.jit
    def root_rad_iters(states):
        _, iters = root.radiation.step(states[0], dt, with_iters=True)
        return iters

    states = drv._states
    for s in range(nsteps):
        states = hydro_step(states)
        if s % 5 == 4 or s == 0:
            iters = [int(v) for v in root_rad_iters(states)]
            print(f"step {s}: root cg iters per Newton outer {iters} "
                  f"(sum {sum(iters)})", flush=True)


if __name__ == "__main__":
    main()
