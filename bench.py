"""Performance benchmark: zone-cycles/sec/chip on the flagship config.

Current flagship: 3-D single-species gas hydro (rk2 + plm + hllc, periodic
box) in float32 — the hot path of every artemis_tpu run (flux sweeps +
update + c2p/p2c fused by XLA).  As subsystems land (AMR disk RHD), this
bench switches to the full north-star deck (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 5e8 zone-cycles/sec/chip (BASELINE.md north star).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from artemis_tpu.config import ParameterInput
    from artemis_tpu.driver import Driver, Integrator
    from artemis_tpu.grid import grid_from_input
    from artemis_tpu.ops.hydro import FluidCfg
    from artemis_tpu.pgen import build_problem

    nx = int(os.environ.get("BENCH_NX", "256"))
    ny = int(os.environ.get("BENCH_NY", "256"))
    nz = int(os.environ.get("BENCH_NZ", "128"))
    nsteps = int(os.environ.get("BENCH_STEPS", "10"))

    deck = os.path.join(os.path.dirname(os.path.abspath(__file__)), "inputs", "linwave.in")
    pin = ParameterInput.from_file(deck)
    pin.apply_overrides([
        f"parthenon/mesh/nx1={nx}",
        f"parthenon/mesh/nx2={ny}",
        f"parthenon/mesh/nx3={nz}",
        "parthenon/mesh/nghost=2",
        "problem/amp=1.0e-3",
    ])
    grid = grid_from_input(pin)
    gas_cfg = FluidCfg(fluid="gas", recon="plm", rsolver="hllc",
                       gamma=pin.get_real("gas", "gamma"),
                       cfl=pin.get_real("gas", "cfl"))
    problem = build_problem("linear_wave", pin, grid, gas_cfg)
    driver = Driver(grid, Integrator.make("rk2"), gas_cfg)

    w0 = jnp.asarray(np.asarray(problem.prims["gas"], dtype=np.float32))
    state = driver.initialize({"gas": {"u": None, "w": w0}})
    dt = jnp.asarray(driver._dt_fn(state), dtype=w0.dtype)

    step = driver._build_step()

    def multi(state, dt):
        def body(s, _):
            return step(s, dt, 0.0), None

        s, _ = lax.scan(body, state, None, length=nsteps)
        return s

    mstep = jax.jit(multi)

    def drain(s):
        # NOTE: on the axon TPU tunnel block_until_ready can return before
        # execution completes; fetching a scalar is the reliable sync point.
        return float(jnp.sum(s["gas"]["u"][0, 0, 0, 0]))

    # compile + warmup, fully drained
    state = mstep(state, dt)
    drain(state)

    reps = int(os.environ.get("BENCH_REPS", "3"))
    t0 = time.perf_counter()
    out = state
    for _ in range(reps):
        out = mstep(out, dt)
    drain(out)
    elapsed = (time.perf_counter() - t0) / reps

    zones = nx * ny * nz
    zcps = zones * nsteps / elapsed
    rho = np.asarray(out["gas"]["u"][0, 0])
    assert np.all(np.isfinite(rho)), "bench produced non-finite density"

    baseline = 5.0e8
    print(json.dumps({
        "metric": "zone-cycles/sec/chip (3D gas hydro rk2+plm+hllc f32)",
        "value": zcps,
        "unit": "zone-cycles/s",
        "vs_baseline": zcps / baseline,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
