import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/artemis_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
variant = sys.argv[1]
if variant == "nofused":
    os.environ["ARTEMIS_PALLAS"] = "0"
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from artemis_tpu.simulation import Simulation

overrides = ["artemis/precision=float32",
             "parthenon/mesh/nx1=128", "parthenon/mesh/nx2=128",
             "parthenon/mesh/nx3=32"]
if variant in ("norad", "nofused"):
    overrides.append("physics/radiation=false")
sim = Simulation("inputs/disk_rhd_amr.in", overrides=overrides,
                 data_dir="/tmp/prof_rhd")
drv = sim.driver
drv._ensure_states(sim.state)
smr, los = drv.smr, drv._los
dt = jnp.asarray(0.3 * float(drv.estimate_dt(sim.state)), dtype=jnp.float32)
zones = sum(int(np.prod(n.grid.nx)) for n in smr.nodes)
print("fused:", smr._fused is not None, "zones:", zones, file=sys.stderr)

nsteps = 50
def multi(states, dt):
    def body(s, _):
        return smr._step(s, dt, jnp.asarray(0.0, dt.dtype), los, None), None
    s, _ = lax.scan(body, states, None, length=nsteps)
    return s
mstep = jax.jit(multi)
def drain(s):
    return float(jnp.sum(s[0]["gas"]["u"][0, 0, 0, 0]))
states = mstep(drv._states, dt); drain(states)
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    states = mstep(states, dt); drain(states)
    best = max(best, zones * nsteps / (time.perf_counter() - t0))
print(f"{variant}: {best:.4e} z-c/s")
