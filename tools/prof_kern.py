"""Microbenchmark individual fused stage kernels on the TPU.

Usage: python tools/prof_kern.py VARIANT [nx ny nz]
VARIANT:
  periodic   — lean Cartesian periodic kernel (pallas_stage.stage_periodic)
  padded     — curv padded frontend, Cartesian lean body (stage_curv)
  gather6    — six-face strip gather, Cartesian lean body (stage_curv_gather6)
  gather6_ng — gather6 without the point-gravity fold
Reports per-stage zone rate (one RK stage per iteration, scanned).
Grid via argv (default 128 128 32); tiles via ARTEMIS_CURV_TZ/TY.
"""
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from artemis_tpu.simulation import Simulation
from artemis_tpu.ops import pallas_stage as ps
from artemis_tpu.ops import pallas_stage_curv as psc

variant = sys.argv[1] if len(sys.argv) > 1 else "gather6"
nx = int(sys.argv[2]) if len(sys.argv) > 2 else 128
ny = int(sys.argv[3]) if len(sys.argv) > 3 else 128
nz = int(sys.argv[4]) if len(sys.argv) > 4 else 32

sim = Simulation(os.path.join(_ROOT, "inputs", "disk_rhd_amr.in"), overrides=[
    "artemis/precision=float32",
    "parthenon/mesh/refinement=none",
    "physics/radiation=false",
    f"parthenon/mesh/nx1={nx}",
    f"parthenon/mesh/nx2={ny}",
    f"parthenon/mesh/nx3={nz}",
], data_dir="/tmp/prof_kern")
drv = sim.driver
grid, cfg = sim.grid, sim.gas_cfg
u = sim.state["gas"]["u"].astype(jnp.float32)
w = sim.state["gas"]["w"].astype(jnp.float32)
co, packed = drv._curv
gm_, soft2_, gmode, gpos, _, _ = drv._curv_grav
grav = (gm_, soft2_, gmode, gpos)
caches = drv.bc_custom["ic"].shard_caches[0]
bdt = jnp.float32(1e-5)

if variant == "periodic":
    from artemis_tpu.config import ParameterInput
    from artemis_tpu.driver import Driver, Integrator
    from artemis_tpu.grid import grid_from_input
    from artemis_tpu.ops.hydro import FluidCfg
    pin = ParameterInput.from_file(os.path.join(_ROOT, "inputs", "linwave.in"))
    pin.apply_overrides([f"parthenon/mesh/nx1={nx}", f"parthenon/mesh/nx2={ny}",
                         f"parthenon/mesh/nx3={nz}", "parthenon/mesh/nghost=2"])
    pgrid = grid_from_input(pin)
    pcfg = FluidCfg(fluid="gas", recon="plm", rsolver="hllc", gamma=1.4, cfl=0.3)

    def one(w_, u_):
        un, wn, dm = ps.stage_periodic(w_, u_, u_, pgrid, pcfg, 0.0, 1.0, bdt,
                                       False)
        return un, wn
elif variant == "padded":
    from artemis_tpu import bc as bc_mod

    def one(w_, u_):
        wp = bc_mod.pad_and_fill(w_, grid, "gas", drv.bc_custom)
        un, wn, dm = psc.stage_curv(wp, u_, u_, grid, cfg, 0.0, 1.0, bdt,
                                    False, co, packed, full=True,
                                    grav=grav, grav_dt=bdt)
        return un, wn
elif variant == "gather6_batched":
    # the production north-star launch: N=2 same-shaped nodes in ONE
    # kernel (root + level-1 patch both 128x128x32 on the rhd deck)
    strips = {k: jax.device_put(np.asarray(v, np.float32))
              for k, v in psc.prepare_gather6_root_strips(grid, caches).items()}
    NB = int(os.environ.get("PROF_KERN_NODES", "2"))

    w = jnp.concatenate([w] * NB)   # [NB,6,nz,ny,nx] node-stacked carry
    u = jnp.concatenate([u] * NB)

    def one(w_, u_):
        # dxs_list engages the lean SMEM 1/dx body — the path production
        # runs (amr.py MultiLevelSMR._stage_fused); without it this would
        # profile the row-geometry body instead
        ua, wa, dm = psc.stage_curv_gather6_batched(
            [w_[i][None] for i in range(NB)], [u_[i][None] for i in range(NB)],
            [u_[i][None] for i in range(NB)], grid, cfg, 0.0, 1.0, bdt,
            False, [co] * NB, [packed] * NB, [strips] * NB,
            grav=grav, grav_dt=bdt,
            dxs_list=[psc._uniform_dxs(grid, co)] * NB)
        # ua/wa are already stacked [NB,6,nz,ny,nx]; keep the carry's
        # (w, u) order and dtypes
        return wa.astype(w_.dtype), ua.astype(u_.dtype)
else:
    strips = {k: jax.device_put(np.asarray(v, np.float32))
              for k, v in psc.prepare_gather6_root_strips(grid, caches).items()}
    g = None if variant == "gather6_ng" else grav
    gdt = 0.0 if variant == "gather6_ng" else bdt

    def one(w_, u_):
        un, wn, dm = psc.stage_curv_gather6(w_, u_, u_, grid, cfg, 0.0, 1.0,
                                            bdt, False, co, packed, strips,
                                            grav=g, grav_dt=gdt)
        return un, wn


def many(w_, u_):
    def body(c, _):
        return one(*c), None
    c, _ = lax.scan(body, (w_, u_), None, length=50)
    return c


m = jax.jit(many)
wc, uc = m(w, u)
float(jnp.sum(wc[0, 0, 0, 0, 0]))
zones = int(w.shape[0]) * nx * ny * nz
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    wc, uc = m(wc, uc)
    float(jnp.sum(wc[0, 0, 0, 0, 0]))
    best = max(best, zones * 50 / (time.perf_counter() - t0))
print(f"{variant} {int(w.shape[0])}x[{nx}x{ny}x{nz}] tz={psc._pick_tz(nz)} "
      f"ty={psc.TY}: {best:.4e} zone-stages/s")
