import os, sys, time
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))  # repo root
import sys as _sys; _sys.path.insert(0, _ROOT)  # import artemis_tpu without chdir side effects
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from artemis_tpu.simulation import Simulation
from artemis_tpu.ops import pallas_stage_curv as _psc

sim = Simulation(os.path.join(_ROOT, "inputs", "disk_rhd_amr.in"), overrides=[
    "artemis/precision=float32", "physics/radiation=false",
    f"parthenon/mesh/nx1={os.environ.get('BENCH_RHD_NX', 128)}",
    f"parthenon/mesh/nx2={os.environ.get('BENCH_RHD_NY', 128)}",
    f"parthenon/mesh/nx3={os.environ.get('BENCH_RHD_NZ', 32)}"], data_dir="/tmp/prof_scan")
drv = sim.driver
drv._ensure_states(sim.state)
smr, los = drv.smr, drv._los
states = drv._states
integ = smr.integ
dt = jnp.asarray(0.3 * float(drv.estimate_dt(sim.state)), dtype=jnp.float32)
zones = sum(int(np.prod(n.grid.nx)) for n in smr.nodes)
N = 50

def scan_rate(name, stepfn, init):
    def multi(c):
        def body(s, _):
            return stepfn(s), None
        s, _ = lax.scan(body, c, None, length=N)
        return s
    m = jax.jit(multi)
    out = m(init)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.ravel()[0]))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        out = m(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.ravel()[0]))
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"{name}: {best*1e3:.3f} ms/iter ({zones/best:.3e} z/s)")

# 1. full step (2 stages + glue)
scan_rate("full step", lambda s: smr._step(s, dt, jnp.asarray(0.0, jnp.float32), los, None), states)

# 2. kernels only: fills + 2 kernels, no rim/restrict/resync
fused = smr._fused
def kernels_only(sts):
    u1s = [{"gas": st["gas"]["u"]} for st in sts]
    wpads = []
    for node in smr.nodes:
        w = sts[node.index]["gas"]["w"]
        if node.parent is None:
            wpads.append(smr._root_fill(w, node, "gas"))
        else:
            wpads.append(node.fill_fine_ghosts(w, sts[0]["gas"]["w"], los[node.index]))
    out = []
    for node, (co, packed, rfo, gspec) in zip(smr.nodes, fused):
        i = node.index
        grav = (gspec[0], gspec[1], gspec[2], gspec[3]) if gspec else None
        u, w, _ = _psc.stage_curv(wpads[i], sts[i]["gas"]["u"], u1s[i]["gas"],
                                  smr.nodes[i].grid, smr.cfg, integ.gam0[0],
                                  integ.gam1[0], dt, False, co, packed,
                                  full=True, rf_omega=rfo, grav=grav,
                                  grav_dt=dt)
        out.append({"gas": {"u": u, "w": w}})
    return out
st32 = [{"gas": {k: v.astype(jnp.float32) for k, v in s["gas"].items()}} for s in states]
scan_rate("fill+2kernels (1 stage)", kernels_only, st32)

# 3. fills only
def fills_only(sts):
    out = []
    for node in smr.nodes:
        w = sts[node.index]["gas"]["w"]
        if node.parent is None:
            wp = smr._root_fill(w, node, "gas")
        else:
            wp = node.fill_fine_ghosts(w, sts[0]["gas"]["w"], los[node.index])
        ng = node.grid.nghost
        sl = tuple([slice(None)] * 2 + [slice(ng, -ng) if node.grid.active(3-i) else slice(None) for i in range(3)])
        out.append({"gas": {"u": sts[node.index]["gas"]["u"], "w": wp[sl]}})
    return out
scan_rate("fills only", fills_only, st32)
