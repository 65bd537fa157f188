"""gather6 fused AMR stage (six-face strip gather, no padded arrays)
vs the padded fused stage: the strips carry exactly the values the
padded arrays held (static ic caches on the root, the same prolonged
ghost slabs on the patch), so the two paths must agree to float32
roundoff.  (Reference analogue: Parthenon boundary buffers move only
O(surface) ghost data, never a padded copy of the state.)"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from artemis_tpu.simulation import Simulation

INP = os.path.join(os.path.dirname(__file__), "..", "inputs")

OVR = [
    "artemis/precision=float32",
    "physics/radiation=false",
    "parthenon/mesh/nx1=128",
    "parthenon/mesh/nx2=32",
    "parthenon/mesh/nx3=8",
]


def _run(tmp_path, tag, nsteps=3):
    sim = Simulation(os.path.join(INP, "disk_rhd_amr.in"), overrides=OVR,
                     data_dir=str(tmp_path / tag))
    drv = sim.driver
    drv._ensure_states(sim.state)
    smr, los = drv.smr, drv._los
    dt = jnp.asarray(0.3 * float(drv.estimate_dt(sim.state)),
                     dtype=jnp.float32)
    states = drv._states
    for _ in range(nsteps):
        states = smr._step(states, dt, jnp.asarray(0.0, jnp.float32), los,
                           None)
    return smr, states


def test_gather6_matches_padded_fused(tmp_path, monkeypatch):
    monkeypatch.setenv("ARTEMIS_PALLAS_INTERPRET", "1")

    monkeypatch.setenv("ARTEMIS_AMR_GATHER", "0")
    smr_ref, ref = _run(tmp_path, "padded")
    assert smr_ref._fused is not None and smr_ref._gather6 is None

    monkeypatch.setenv("ARTEMIS_AMR_GATHER", "1")
    smr_g6, out = _run(tmp_path, "gather6")
    assert smr_g6._gather6 is not None, "gather6 gate rejected the deck"

    for i in range(len(ref)):
        for key in ("u", "w"):
            a = np.asarray(ref[i]["gas"][key], dtype=np.float64)
            b = np.asarray(out[i]["gas"][key], dtype=np.float64)
            scale = np.max(np.abs(a)) + 1e-30
            err = np.max(np.abs(a - b)) / scale
            # the node-batched kernel reads per-node SMEM 1/dx scalars
            # (all-Cartesian uniform nodes) while the padded kernel folds
            # its single node's 1/dx as compile-time constants —
            # algebraically identical, so agreement is f32-ulp
            # accumulation over the stepped window
            assert err < 4e-6, f"node {i} {key} mismatch {err:g}"
    rho = np.asarray(out[0]["gas"]["w"][0, 0])
    assert np.isfinite(rho).all() and rho.min() > 0


def test_gather6_gate_rejects_moving_trees(tmp_path, monkeypatch):
    """MOVE-style adaptive decks keep the padded path (patch positions
    are traced, so gather6's static lo-margin guarantee cannot hold).
    Tiled spawn/destroy trees are lattice-static between regrids and DO
    keep the fast path (moving_patches=False there)."""
    monkeypatch.setenv("ARTEMIS_PALLAS_INTERPRET", "1")
    sim = Simulation(os.path.join(INP, "disk_rhd_amr.in"), overrides=OVR + [
        "parthenon/mesh/refinement=adaptive",
        "parthenon/refinement/style=move",
        "gas/refine_field=density",
        "gas/refine_type=magnitude",
        "gas/refine_thr=0.5",
    ], data_dir=str(tmp_path))
    assert sim.driver.smr.moving_patches
    assert sim.driver.smr._gather6 is None


def test_gather6_folds_sibling_links(tmp_path, monkeypatch):
    """Adjacent same-level patches keep the gather6 fast path: the
    sibling fine-ghost links fold into the prolonged slabs
    (_fold_sib_into_slab), so the strip stage sees exactly the ghosts
    the padded stage's _apply_sib_links produced — the two paths must
    agree to f32 roundoff at the seam as everywhere else."""
    monkeypatch.setenv("ARTEMIS_PALLAS_INTERPRET", "1")
    pair = [
        # split the deck's half-domain refinement into two ADJACENT
        # x2-halves (same parent, shared seam at x2=0; x1 keeps the full
        # [-1,1] span so each patch's fine nx1 stays a 128 multiple, and
        # nx2=64 keeps each half's fine ny at the TY=32 tile —
        # gather6_supported)
        "parthenon/mesh/nx2=64",
        "parthenon/static_refinement1/x2min=-1.0",
        "parthenon/static_refinement1/x2max=0.0",
        "parthenon/static_refinement2/level=1",
        "parthenon/static_refinement2/x1min=-1.0",
        "parthenon/static_refinement2/x1max=1.0",
        "parthenon/static_refinement2/x2min=0.0",
        "parthenon/static_refinement2/x2max=1.0",
        "parthenon/static_refinement2/x3min=-0.25",
        "parthenon/static_refinement2/x3max=0.25",
    ]

    def run(tag):
        sim = Simulation(os.path.join(INP, "disk_rhd_amr.in"),
                         overrides=OVR + pair,
                         data_dir=str(tmp_path / tag))
        drv = sim.driver
        drv._ensure_states(sim.state)
        smr, los = drv.smr, drv._los
        assert len(smr.nodes) == 3
        assert any(smr._sib_links.values()), "no sibling links built"
        dt = jnp.asarray(0.3 * float(drv.estimate_dt(sim.state)),
                         dtype=jnp.float32)
        states = drv._states
        for _ in range(3):
            states = smr._step(states, dt, jnp.asarray(0.0, jnp.float32),
                               los, None)
        return smr, states

    monkeypatch.setenv("ARTEMIS_AMR_GATHER", "0")
    smr_ref, ref = run("padded")
    assert smr_ref._gather6 is None

    monkeypatch.setenv("ARTEMIS_AMR_GATHER", "1")
    smr_g6, out = run("gather6")
    assert smr_g6._gather6 is not None, \
        "gather6 gate rejected the sibling-pair deck"

    for i in range(len(ref)):
        for key in ("u", "w"):
            a = np.asarray(ref[i]["gas"][key], dtype=np.float64)
            b = np.asarray(out[i]["gas"][key], dtype=np.float64)
            scale = np.max(np.abs(a)) + 1e-30
            err = np.max(np.abs(a - b)) / scale
            assert err < 4e-6, f"node {i} {key} mismatch {err:g}"
