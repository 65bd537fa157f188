import os, sys, time
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))  # repo root
import sys as _sys; _sys.path.insert(0, _ROOT)  # import artemis_tpu without chdir side effects
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from artemis_tpu.simulation import Simulation

sim = Simulation(os.path.join(_ROOT, "inputs", "disk_rhd_amr.in"), overrides=[
    "artemis/precision=float32", "physics/radiation=false",
    f"parthenon/mesh/nx1={os.environ.get('BENCH_RHD_NX', 128)}",
    f"parthenon/mesh/nx2={os.environ.get('BENCH_RHD_NY', 128)}",
    f"parthenon/mesh/nx3={os.environ.get('BENCH_RHD_NZ', 32)}"], data_dir="/tmp/prof_parts")
drv = sim.driver
drv._ensure_states(sim.state)
smr, los = drv.smr, drv._los
states = drv._states
dt = jnp.asarray(0.3 * float(drv.estimate_dt(sim.state)), dtype=jnp.float32)

def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    # scalar-fetch sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.ravel()[0]))
    el = (time.perf_counter() - t0) / n
    print(f"{name}: {el*1e3:.3f} ms")
    return el

from artemis_tpu.ops import pallas_stage_curv as _psc

# full stage 1
st1 = jax.jit(lambda s, u1, dt: smr._stage(s, u1, dt, jnp.asarray(0.0, jnp.float32), 1, los, None)[0])
u1s = [{fl: st[fl]["u"] for fl in st if fl != "rad"} for st in states]
timeit("full stage", st1, states, u1s, dt)

# ghost fills
rootfill = jax.jit(lambda w: smr._root_fill(w, smr.root, "gas"))
timeit("root fill", rootfill, states[0]["gas"]["w"])
node1 = smr.nodes[1]
finefill = jax.jit(lambda w, wp: node1.fill_fine_ghosts(w, wp, los[1]))
timeit("fine fill", finefill, states[1]["gas"]["w"], states[0]["gas"]["w"])

# kernel per node
integ = smr.integ
co, packed, rfo, gspec = smr._fused[0]
wpad0 = rootfill(states[0]["gas"]["w"])
k0 = jax.jit(lambda wp, u0, u1, bdt: _psc.stage_curv(
    wp, u0, u1, smr.root.grid, smr.cfg, integ.gam0[0], integ.gam1[0], bdt,
    False, co, packed, full=True, rf_omega=rfo,
    grav=(gspec[0], gspec[1], gspec[2], gspec[3]) if gspec else None,
    grav_dt=bdt))
timeit("kernel node0", k0, wpad0, states[0]["gas"]["u"].astype(jnp.float32),
       u1s[0]["gas"].astype(jnp.float32), dt)
co1, packed1, rfo1, gspec1 = smr._fused[1]
wpad1 = finefill(states[1]["gas"]["w"], states[0]["gas"]["w"])
k1 = jax.jit(lambda wp, u0, u1, bdt: _psc.stage_curv(
    wp, u0, u1, node1.grid, smr.cfg, integ.gam0[0], integ.gam1[0], bdt,
    False, co1, packed1, full=True, rf_omega=rfo1,
    grav=(gspec1[0], gspec1[1], gspec1[2], gspec1[3]) if gspec1 else None,
    grav_dt=bdt))
timeit("kernel node1", k1, wpad1, states[1]["gas"]["u"].astype(jnp.float32),
       u1s[1]["gas"].astype(jnp.float32), dt)

# rim delta
u_p = states[0]["gas"]["u"].astype(jnp.float32)
rim = jax.jit(lambda u, wp, wf, bdt: smr._apply_rim_delta(u, node1, los, wp, wf, bdt, False))
timeit("rim delta", rim, u_p, wpad0, wpad1, dt)

# restriction
from artemis_tpu.amr import restrict_average
restr = jax.jit(lambda u, uf: smr._restrict_into(
    node1, u, restrict_average(uf, node1.active, volf=node1.volf).astype(u.dtype), los[1]))
timeit("restrict", restr, u_p, states[1]["gas"]["u"].astype(jnp.float32))

# parent resync
def resync(u):
    w = smr.root.hydro.cons_to_prim(u, smr.cfg)
    u2, w2 = smr.root.hydro.prim_to_cons(w, smr.cfg)
    return u2, w2
timeit("parent resync", jax.jit(resync), u_p)
sa = jax.jit(lambda u: smr.root.hydro.set_auxiliary(u, smr.cfg))
timeit("set_aux", sa, u_p)
