"""Tiled-adaptivity cost split: device step segments vs the host regrid
pass, on the bench's rhd_tiled configuration.  Reuses the exact bench
topology so the compiled programs come from the warm cache.

Usage: python tools/prof_tiled.py [NSEG]
Env: BENCH_RHD_NX/NY/NZ, BENCH_TILED_CK, BENCH_TILE_NX1/2/3 as bench.py.
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

nx = int(os.environ.get("BENCH_RHD_NX", "256"))
ny = int(os.environ.get("BENCH_RHD_NY", "256"))
nz = int(os.environ.get("BENCH_RHD_NZ", "64"))
ck = int(os.environ.get("BENCH_TILED_CK", "25"))
nseg = int(sys.argv[1]) if len(sys.argv) > 1 else 6
sim = Simulation(os.path.join(_ROOT, "inputs", "disk_rhd_amr.in"), overrides=[
    "artemis/precision=float32",
    f"parthenon/mesh/nx1={nx}", f"parthenon/mesh/nx2={ny}",
    f"parthenon/mesh/nx3={nz}",
    "parthenon/mesh/refinement=adaptive",
    "gas/refine_field=density",
    "gas/refine_type=magnitude",
    "gas/refine_thr=0.3",
    f"parthenon/refinement/check_interval={ck}",
    f"parthenon/refinement/tile_nx1={os.environ.get('BENCH_TILE_NX1', 64)}",
    f"parthenon/refinement/tile_nx2={os.environ.get('BENCH_TILE_NX2', 64)}",
    f"parthenon/refinement/tile_nx3={os.environ.get('BENCH_TILE_NX3', 32)}",
], data_dir="/tmp/prof_tiled")
drv = sim.driver
assert drv.tiled
drv._ensure_states(sim.state)
smr = drv.smr
dt = jnp.asarray(0.3 * float(drv.estimate_dt(sim.state)), dtype=jnp.float32)


def make_seg():
    def seg(states, dt):
        def body(s, _):
            return smr._step(s, dt, jnp.asarray(0.0, dt.dtype), drv._los,
                             None), None
        s, _ = lax.scan(body, states, None, length=ck)
        return s
    return jax.jit(seg)


seg = make_seg()


def drain(s):
    return float(jnp.sum(s[0]["gas"]["u"][0, 0, 0, 0]))


drv._states = seg(drv._states, dt)
drain(drv._states)
n0 = len(smr.nodes)
drv._states, drv._los = drv._regrid()
if len(smr.nodes) != n0:
    seg = make_seg()
    drv._states = seg(drv._states, dt)
    drain(drv._states)
    drv._states, drv._los = drv._regrid()
zones = sum(int(np.prod(n.grid.nx)) for n in smr.nodes)
print(f"nodes: {len(smr.nodes)}  zones: {zones}", file=sys.stderr)

t_seg = t_rg = 0.0
for k in range(nseg):
    t0 = time.perf_counter()
    drv._states = seg(drv._states, dt)
    drain(drv._states)
    t1 = time.perf_counter()
    n0 = len(smr.nodes)
    drv._states, drv._los = drv._regrid()
    t2 = time.perf_counter()
    t_seg += t1 - t0
    t_rg += t2 - t1
    if len(smr.nodes) != n0:
        print(f"  topology changed at seg {k}: {n0} -> {len(smr.nodes)}",
              file=sys.stderr)
        seg = make_seg()
print(f"device step: {t_seg / nseg * 1e3:.1f} ms/seg "
      f"({t_seg / (nseg * ck) * 1e3:.2f} ms/cycle, "
      f"{zones * ck * nseg / t_seg:.3e} z-c/s pure-step)")
print(f"regrid pass: {t_rg / nseg * 1e3:.1f} ms/seg "
      f"({t_rg / (nseg * ck) * 1e3:.2f} ms/cycle amortized)")
tot = t_seg + t_rg
print(f"combined:    {zones * ck * nseg / tot:.3e} z-c/s "
      f"(regrid share {t_rg / tot * 100:.0f}%)")
