"""Ablate the north-star AMR RHD cycle into kernel / glue / prolongation
/ radiation shares on the REAL device (jitted 50-cycle scan, one sync).

Usage: python tools/prof_glue.py VARIANT [nsteps]
VARIANT:
  full      — the production step (what bench.py times)
  noglue    — _stage_fused_glue skipped (rim deltas, block set_aux,
              restriction, block resync all elided; prolongation stays)
  noprolong — child ghost strips frozen at step entry (prolongation
              gather elided from the cycle; glue stays)
  norad     — radiation pass skipped
Each variant is its own process/compile; compare the printed z-c/s.
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
from artemis_tpu import amr as amr_mod

variant = sys.argv[1] if len(sys.argv) > 1 else "full"
nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

_NX = os.environ.get("BENCH_RHD_NX", "128")
_NY = os.environ.get("BENCH_RHD_NY", "128")
_NZ = os.environ.get("BENCH_RHD_NZ", "32")
sim = Simulation(os.path.join(_ROOT, "inputs", "disk_rhd_amr.in"), overrides=[
    "artemis/precision=float32",
    f"parthenon/mesh/nx1={_NX}", f"parthenon/mesh/nx2={_NY}",
    f"parthenon/mesh/nx3={_NZ}",
] + (["physics/radiation=false"] if variant == "norad" else []),
    data_dir="/tmp/prof_glue")
drv = sim.driver
drv._ensure_states(sim.state)
smr, los = drv.smr, drv._los
dt = jnp.asarray(0.3 * float(drv.estimate_dt(sim.state)), dtype=jnp.float32)
zones = sum(int(np.prod(n.grid.nx)) for n in smr.nodes)

if variant == "noglue":
    def _skip_glue(self, states, new_states, los, wpads, slabs, bdt,
                   force_pcm, g6, final=True):
        return new_states, None
    amr_mod.MultiLevelSMR._stage_fused_glue = _skip_glue
elif variant == "norim":
    amr_mod.MultiLevelSMR._apply_rim_delta_g6 = (
        lambda self, u_p, node, los, w_par, w_fine, slabs, bdt,
        force_pcm: u_p)
elif variant == "norestrict":
    # rim deltas stay; block set_aux + restriction + block resync skipped
    amr_mod.MultiLevelSMR._block_set_auxiliary = (
        lambda self, u_p, child, los: u_p)
    amr_mod.MultiLevelSMR._restrict_into = (
        lambda self, node, u_p, avg, lo: u_p)
    amr_mod.MultiLevelSMR._block_resync = (
        lambda self, u, w, child, los: (u, w))
elif variant == "norimflux":
    # rim windows/fluxes elided but the 2-row updates still applied with
    # zero deltas: separates the window-flux op chains from _rim_apply
    _orig_rim = amr_mod.MultiLevelSMR._rim_apply
    def _zero_rim_g6(self, u_p, node, los, w_par, w_fine, slabs, bdt,
                     force_pcm):
        hc = self._ic_hydro(node.parent)
        lo = los[node.index]
        for d in hc.dims:
            for side in (0, 1):
                fi_c = lo[d - 1] + side * node.n[d - 1]
                shp = []
                for i in range(3):
                    dd = 3 - i
                    if dd == d:
                        shp.append(1)
                    elif node.active[dd - 1]:
                        shp.append(node.n[dd - 1])
                    else:
                        shp.append(1)
                dF = jnp.zeros((1, 6, *shp), u_p.dtype)
                u_p = _orig_rim(self, u_p, hc, node, lo, d, side, fi_c,
                                dF, bdt)
        return u_p
    amr_mod.MultiLevelSMR._apply_rim_delta_g6 = _zero_rim_g6
elif variant == "noaux":
    amr_mod.MultiLevelSMR._block_set_auxiliary = (
        lambda self, u_p, child, los: u_p)
elif variant == "noresync":
    amr_mod.MultiLevelSMR._block_resync = (
        lambda self, u, w, child, los: (u, w))
elif variant == "norestronly":
    amr_mod.MultiLevelSMR._restrict_into = (
        lambda self, node, u_p, avg, lo: u_p)
    amr_mod.MultiLevelSMR._restrict_band_into = (
        lambda self, child, u_p, u_f, lo: u_p)
elif variant == "noprolong":
    # freeze each child's strips/slabs at their step-entry values
    # (compute ALL before replacing the class attribute: the replacement
    # is type-wide and the root shares the class)
    frozen = {}
    for node in smr.nodes:
        if node.parent is not None:
            frozen[node.index] = node.ghost_strips(
                smr._parent_arr(drv._states, node, "gas", "w"),
                los[node.index],
                sib_links=smr._sib_links[node.index],
                sib_arrs=[st["gas"]["w"] for st in drv._states])
            frozen[node.index] = jax.tree_util.tree_map(
                jax.device_put, frozen[node.index])
    type(smr.nodes[0]).ghost_strips = (
        lambda self, wp, lo, _f=frozen, **kw: _f[self.index])

step = smr._step


def multi(states, dt):
    def body(s, _):
        return step(s, dt, jnp.asarray(0.0, dt.dtype), los, None), None
    s, _ = lax.scan(body, states, None, length=nsteps)
    return s


mstep = jax.jit(multi)
states = mstep(drv._states, dt)
float(jnp.sum(states[0]["gas"]["u"][0, 0, 0, 0]))
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    states = mstep(states, dt)
    float(jnp.sum(states[0]["gas"]["u"][0, 0, 0, 0]))
    el = time.perf_counter() - t0
    best = max(best, zones * nsteps / el)
print(f"{variant} nsteps={nsteps}: {best:.4e} z-c/s "
      f"({zones * nsteps / best * 1e3 / nsteps:.3f} ms/cycle)")
