"""Same-level sibling ghost exchange (Parthenon same-level boundary
buffers; cf. SendBoundBufs): ghost cells of a patch that fall inside an
adjacent sibling's interior take the sibling's FINE values.  With
nghost=2 and PLM, every stencil that touches the seam then sees exactly
the data a single union patch would — so two adjacent patches must
reproduce the union patch bit-for-bit (jnp path) / to f32 roundoff
(fused interpret path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from artemis_tpu.amr import MultiLevelSMR
from artemis_tpu.config import ParameterInput
from artemis_tpu.driver import Integrator
from artemis_tpu.grid import grid_from_input
from artemis_tpu.ops.hydro import FluidCfg

BOX = """
<artemis>
problem = constant
coordinates = cartesian
<parthenon/time>
tlim = 1.0
<parthenon/mesh>
nghost = 2
nx1 = 32
x1min = -1.0
x1max = 1.0
ix1_bc = periodic
ox1_bc = periodic
nx2 = 32
x2min = -1.0
x2max = 1.0
ix2_bc = periodic
ox2_bc = periodic
nx3 = 8
x3min = -0.25
x3max = 0.25
ix3_bc = periodic
ox3_bc = periodic
<gas>
gamma = 1.4
<problem>
rho = 1.0
pres = 1.0
"""

UNION = [dict(level=1, lo=(4, 8, 2), n=(24, 16, 4))]
PAIR = [dict(level=1, lo=(4, 8, 2), n=(12, 16, 4)),
        dict(level=1, lo=(16, 8, 2), n=(12, 16, 4))]


def _bump_ic(g, dtype):
    x1, x2, x3 = g.cell_centers()
    nz, ny, nx = tuple(reversed(g.nx))
    w = np.zeros((1, 6, nz, ny, nx), dtype=dtype)
    r2 = np.broadcast_to(x1 ** 2 + x2 ** 2 + x3 ** 2, (nz, ny, nx))
    w[:, 0] = 1.0 + 0.5 * np.exp(-r2 / 0.05)
    w[:, 1] = 0.3
    w[:, 2] = -0.2
    w[:, 4] = 1.0
    w[:, 5] = w[:, 4] / (0.4 * w[:, 0])
    return w


def _run(patches, nsteps=6):
    pin = ParameterInput.from_string(BOX)
    grid = grid_from_input(pin)
    cfg = FluidCfg(fluid="gas", recon="plm", rsolver="hllc", gamma=1.4,
                   cfl=0.4)
    ml = MultiLevelSMR(grid, Integrator.make("rk2"), cfg,
                       patches=[dict(p) for p in patches])
    states = ml.initialize(
        [{"gas": _bump_ic(nd.grid, np.float32)} for nd in ml.nodes])
    los = [None] + [jnp.asarray(np.array(nd.lo, dtype=np.int32))
                    for nd in ml.nodes[1:]]
    dt = 0.8 * float(ml._dt(states))
    for _ in range(nsteps):
        states = ml._step(states, jnp.asarray(dt), jnp.asarray(0.0), los,
                          None)
    return ml, states


def _compare(union_states, pair_states, tol):
    # root level
    for key in ("u", "w"):
        a = np.asarray(union_states[0]["gas"][key], dtype=np.float64)
        b = np.asarray(pair_states[0]["gas"][key], dtype=np.float64)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30)
        assert err <= tol, f"root {key} mismatch {err:g}"
    # fine level: union array vs the two patches side by side along x
    for key in ("u", "w"):
        a = np.asarray(union_states[1]["gas"][key], dtype=np.float64)
        b0 = np.asarray(pair_states[1]["gas"][key], dtype=np.float64)
        b1 = np.asarray(pair_states[2]["gas"][key], dtype=np.float64)
        b = np.concatenate([b0, b1], axis=-1)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30)
        assert err <= tol, f"fine {key} mismatch {err:g}"


def test_adjacent_siblings_match_union_jnp(monkeypatch):
    monkeypatch.setenv("ARTEMIS_PALLAS", "0")
    ml_u, union_states = _run(UNION)
    ml_p, pair_states = _run(PAIR)
    assert not any(ml_u._sib_links.values())
    assert ml_p._sib_links[1] and ml_p._sib_links[2]
    _compare(union_states, pair_states, 1e-12)


def test_adjacent_siblings_match_union_fused(monkeypatch):
    monkeypatch.delenv("ARTEMIS_PALLAS", raising=False)
    monkeypatch.setenv("ARTEMIS_PALLAS_INTERPRET", "1")
    ml_u, union_states = _run(UNION)
    ml_p, pair_states = _run(PAIR)
    assert ml_p._fused is not None
    _compare(union_states, pair_states, 2e-5)


def test_adjacent_siblings_sharded_replicated(monkeypatch):
    """REPLICATED sibling patches on the sharded tree exchange ghosts
    exactly like serial siblings (their frames are global on every
    shard): the x3-decomposed PAIR run matches the serial UNION run."""
    monkeypatch.setenv("ARTEMIS_PALLAS", "0")
    from artemis_tpu.parallel.amr import ShardedSMR
    from artemis_tpu.parallel.mesh import make_device_mesh

    _, union_states = _run(UNION)

    pin = ParameterInput.from_string(BOX)
    grid = grid_from_input(pin)
    cfg = FluidCfg(fluid="gas", recon="plm", rsolver="hllc", gamma=1.4,
                   cfl=0.4)
    sml = ShardedSMR(grid, Integrator.make("rk2"), cfg,
                     patches=[dict(p) for p in PAIR],
                     mesh=make_device_mesh(4), axis=3)
    assert sml.nodes[1].replicated and sml.nodes[2].replicated
    assert sml._sib_links[1] and sml._sib_links[2], \
        "replicated sibling pairs must exchange ghosts"
    states = sml.initialize(
        [{"gas": _bump_ic(g, np.float32)} for g in sml.ic_grids])
    los = [None] + [jnp.asarray(np.array(nd.lo, dtype=np.int32))
                    for nd in sml.nodes[1:]]
    # match _run's dt: the serial tree's CFL estimate
    pin2 = ParameterInput.from_string(BOX)
    grid2 = grid_from_input(pin2)
    ml = MultiLevelSMR(grid2, Integrator.make("rk2"), cfg,
                       patches=[dict(p) for p in PAIR])
    st_ml = ml.initialize(
        [{"gas": _bump_ic(nd.grid, np.float32)} for nd in ml.nodes])
    dt = 0.8 * float(ml._dt(st_ml))
    for _ in range(6):
        states = sml._step(states, jnp.asarray(dt), jnp.asarray(0.0), los,
                           None)
    # 5e-7: the sharded root's collectives reorder f32 sums (measured
    # ~8e-8 vs serial); with exchange OFF the seam ghosts are prolonged
    # coarse data and the union mismatch is O((dx_coarse)^2) ~ 1e-3.
    _compare(union_states, list(states), 5e-7)
