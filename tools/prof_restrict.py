"""Micro-benchmark the AMR glue primitives in isolation on the device.

Times 50-iteration jitted scans of each primitive on the north-star
bench composition (256x256x64 root + same-shape level-1 patch by
default) and prints ms/iteration:

  restrict  — restrict_average(full fine u) + deposit into the parent
  band      — _restrict_band_into (the intermediate-stage band form)
  strips    — child.ghost_strips (six MinMod-prolonged gather6 strips)
  aux       — _block_set_auxiliary + _block_resync on the child block
  rim       — _apply_rim_delta_g6 (batched window fluxes + rim apply)

The numbers decide which glue primitive deserves a Pallas path; see
prof_glue.py for the whole-cycle ablations these must add up to.
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from artemis_tpu import amr as amr_mod
from artemis_tpu.simulation import Simulation

nx = int(os.environ.get("BENCH_RHD_NX", "256"))
ny = int(os.environ.get("BENCH_RHD_NY", "256"))
nz = int(os.environ.get("BENCH_RHD_NZ", "64"))
which = sys.argv[1:] or ["restrict", "band", "strips", "aux", "rim"]

sim = Simulation(os.path.join(_ROOT, "inputs", "disk_rhd_amr.in"),
                 overrides=["artemis/precision=float32",
                            f"parthenon/mesh/nx1={nx}",
                            f"parthenon/mesh/nx2={ny}",
                            f"parthenon/mesh/nx3={nz}"],
                 data_dir="/tmp/prof_restrict")
drv = sim.driver
drv._ensure_states(sim.state)
smr, los = drv.smr, drv._los
los = smr._static_los(los)
child = next(nd for nd in smr.nodes if nd.parent is not None)
ci, pi = child.index, child.parent.index
states = drv._states
u_f = states[ci]["gas"]["u"]
u_p = states[pi]["gas"]["u"]
w_f = states[ci]["gas"]["w"]
w_p = states[pi]["gas"]["w"]
lo = los[ci]


def bench(name, fn, *args):
    def body(c, _):
        return fn(c, *args[1:]), None

    f = jax.jit(lambda a0: lax.scan(body, a0, None, length=50)[0])
    out = f(args[0])
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(args[0])
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 50)
    print(f"{name}: {best * 1e3:.3f} ms/iter", flush=True)


if "restrict" in which:
    def full_restrict(u_p_, u_f_):
        res = amr_mod.restrict_average(u_f_, child.active,
                                       volf=child.volf).astype(u_p_.dtype)
        return smr._restrict_into(child, u_p_, res, lo)
    bench("restrict(full u6 + deposit)", full_restrict, u_p, u_f)

    def ravg_only(u_p_, u_f_):
        res = amr_mod.restrict_average(u_f_, child.active, volf=child.volf)
        return u_p_ + 0 * res[..., :1, :1, :1]
    bench("restrict_average only", ravg_only, u_p, u_f)

    os.environ["ARTEMIS_RESTRICT"] = "window"
    bench("restrict window (full u6 + deposit)", full_restrict, u_p, u_f)
    bench("restrict_average window only", ravg_only, u_p, u_f)
    os.environ["ARTEMIS_RESTRICT"] = "reshape"

if "band" in which:
    def band(u_p_, u_f_):
        return smr._restrict_band_into(child, u_p_, u_f_, lo)
    bench("band restrict", band, u_p, u_f)

if "strips" in which:
    def strips_fn(w_p_):
        st, sl = child.ghost_strips(w_p_, lo,
                                    sib_links=smr._sib_links[ci],
                                    sib_arrs=[w_p_, w_f])
        # reduce to a carry-shaped output so scan can iterate
        acc = w_p_
        for v in st.values():
            acc = acc + 0 * jnp.sum(v).astype(acc.dtype)
        return acc
    bench("ghost_strips(6 faces)", strips_fn, w_p)

if "aux" in which:
    def auxres(u_p_):
        u2 = smr._block_set_auxiliary(u_p_, child, los)
        u2, _ = smr._block_resync(u2.astype(w_p.dtype), w_p, child, los)
        return u2
    bench("block aux+resync", auxres, u_p)

if "rim" in which:
    _, slabs = child.ghost_strips(w_p, lo, sib_links=smr._sib_links[ci],
                                  sib_arrs=[w_p, w_f])
    slabs = jax.tree_util.tree_map(jax.device_put, slabs)
    bdt = jnp.asarray(1e-6, jnp.float32)

    def rim(u_p_, w_p_, w_f_):
        return smr._apply_rim_delta_g6(u_p_, child, los, w_p_, w_f_,
                                       slabs, bdt, False)
    bench("rim deltas (6 faces)", rim, u_p, w_p, w_f)
