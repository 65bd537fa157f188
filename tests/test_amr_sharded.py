"""Mesh refinement composed with multi-chip domain decomposition
(ShardedSMR): every level block-sharded along one periodic axis, the
whole multi-level step under one shard_map, ppermute halo exchange at
the wrap seams (reference: Parthenon distributing AMR meshblocks over
MPI ranks, artemis_driver.cpp boundary exchange)."""

import os

import numpy as np
import pytest

from artemis_tpu.simulation import Simulation

HERE = os.path.dirname(__file__)
INP = os.path.join(HERE, "..", "inputs")


def test_sharded_amr_cartesian_matches_serial(tmp_path):
    """4-way x3-sharded static refinement reproduces the single-device
    run to roundoff (Cartesian: identical geometry constants on every
    shard, so the only differences are collective reduction orders)."""
    deck = os.path.join(INP, "linwave.in")
    args = ["parthenon/time/nlim=20", "parthenon/mesh/nghost=2",
            "parthenon/mesh/nx1=32", "parthenon/mesh/nx2=8",
            "parthenon/mesh/nx3=16", "problem/amp=1.0e-6",
            "gas/reconstruct=plm",
            "parthenon/mesh/refinement=static",
            "parthenon/refinement/patch_nx1=16",
            "parthenon/refinement/patch_nx2=4",
            "parthenon/refinement/patch_nx3=16"]
    s0 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "serial"))
    s0.run()
    s1 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "shard"),
                    nshards=4)
    from artemis_tpu.parallel.amr import ShardedSMR

    assert isinstance(s1.driver.smr, ShardedSMR)
    assert s1.driver.smr.nodes[1].wrap[2]
    s1.run()
    a = np.asarray(s0.state["gas"]["w"])
    b = np.asarray(s1.state["gas"]["w"])
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() < 1e-13


def test_sharded_amr_disk_phi(tmp_path):
    """Production shape: ring refinement in a 3-D spherical viscous disk
    (alpha viscosity + gravity + rotating frame + custom ic boundaries),
    phi-decomposed over 4 shards.  Fine-level geometry varies between
    shard windows only at the ulp level, so the sharded run tracks the
    serial one to accumulated-roundoff accuracy."""
    deck = os.path.join(INP, "disk_sph.in")
    args = ["parthenon/time/nlim=10",
            "parthenon/mesh/nx1=64", "parthenon/mesh/nx2=16",
            "parthenon/mesh/nx3=16",
            "parthenon/mesh/refinement=static",
            "parthenon/refinement/patch_nx1=32",
            "parthenon/refinement/patch_nx2=8",
            "parthenon/refinement/patch_nx3=16"]
    s0 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "serial"))
    s0.run()
    s1 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "shard"),
                    nshards=4)
    s1.run()
    a = np.asarray(s0.state["gas"]["w"])
    b = np.asarray(s1.state["gas"]["w"])
    assert np.isfinite(b).all()
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 1e-9, rel


def test_sharded_amr_nonwrap_patch_replicated(tmp_path):
    """A patch that does NOT span the sharded periodic axis runs as a
    REPLICATED node: every shard computes the patch identically, ghost
    prolongation all-gathers the sharded parent, and restriction / flux
    correction land through masked global-frame scatters.  The sharded
    run matches the serial refined run to roundoff (coarse-fine faces
    across shard boundaries, ref Parthenon block distribution)."""
    deck = os.path.join(INP, "linwave.in")
    args = ["parthenon/time/nlim=20", "parthenon/mesh/nghost=2",
            "parthenon/mesh/nx1=32", "parthenon/mesh/nx2=8",
            "parthenon/mesh/nx3=16", "problem/amp=1.0e-6",
            "gas/reconstruct=plm",
            "parthenon/mesh/refinement=static",
            "parthenon/refinement/patch_nx1=16",
            "parthenon/refinement/patch_nx2=4",
            "parthenon/refinement/patch_nx3=8"]
    s0 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "serial"))
    s0.run()
    s1 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "shard"),
                    nshards=4)
    assert s1.driver.smr.nodes[1].replicated
    assert not s1.driver.smr.nodes[1].wrap[2]
    s1.run()
    for lvl in (0, 1):
        a = np.asarray(s0.driver._states[lvl]["gas"]["w"])
        b = np.asarray(s1.driver._states[lvl]["gas"]["w"])
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() < 1e-13, (lvl, np.abs(a - b).max())


def test_sharded_amr_radiation(tmp_path):
    """Gray FLD under sharded refinement: per-level CG solves with psum
    dot products + ppermute stencil halos, Dirichlet ghost coupling at
    the (exchanged) wrap seams.  Matches the serial refined run."""
    deck = os.path.join(INP, "rad_shock.in")
    args = ["parthenon/time/nlim=10",
            "parthenon/mesh/nx1=64", "parthenon/mesh/nx2=1",
            "parthenon/mesh/nx3=8",
            "parthenon/mesh/ix3_bc=periodic", "parthenon/mesh/ox3_bc=periodic",
            "parthenon/mesh/x3min=0.0", "parthenon/mesh/x3max=1.0",
            "parthenon/mesh/refinement=static",
            "parthenon/refinement/patch_nx1=32",
            "parthenon/refinement/patch_nx3=8"]
    s0 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "serial"))
    s0.run()
    s1 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "shard"),
                    nshards=4)
    assert s1.driver.smr.nodes[1].radiation is not None
    s1.run()
    for key, kind in (("gas", "w"), ("rad", "Er")):
        a = np.asarray(s0.state[key][kind])
        b = np.asarray(s1.state[key][kind])
        assert np.isfinite(b).all()
        rel = np.abs(a - b).max() / np.abs(a).max()
        assert rel < 1e-11, (key, kind, rel)


def test_sharded_amr_nbody(tmp_path):
    """Live planets under sharded refinement: per-shard grid-force rows
    psum across the mesh, the replicated host particle system advances
    identically, and the gas matches the serial refined run (2-D
    cylindrical planet disk, phi-decomposed full-span ring patch)."""
    deck = os.path.join(INP, "disk_nbody_cyl.in")
    args = ["parthenon/time/nlim=10",
            "parthenon/mesh/nx1=64", "parthenon/mesh/nx2=64",
            "parthenon/mesh/nx3=1",
            "parthenon/mesh/refinement=static",
            "parthenon/refinement/patch_nx1=32",
            "parthenon/refinement/patch_nx2=64"]
    s0 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "serial"))
    s0.run()
    s1 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "shard"),
                    nshards=4)
    s1.run()
    a = np.asarray(s0.state["gas"]["w"])
    b = np.asarray(s1.state["gas"]["w"])
    assert np.isfinite(b).all()
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 1e-11, rel
    assert np.abs(np.asarray(s0.nbody.pos) - np.asarray(s1.nbody.pos)).max() \
        < 1e-14


def test_sharded_amr_restart_bitexact(tmp_path):
    """Restart of a sharded refined run restores every level bit-exactly
    (payloads gather the sharded fine states; reload reshards them)."""
    deck = os.path.join(INP, "linwave.in")
    args = ["parthenon/mesh/nghost=2",
            "parthenon/mesh/nx1=32", "parthenon/mesh/nx2=8",
            "parthenon/mesh/nx3=16", "problem/amp=1.0e-6",
            "gas/reconstruct=plm", "parthenon/time/tlim=0.3",
            "parthenon/mesh/refinement=static",
            "parthenon/refinement/patch_nx1=16",
            "parthenon/refinement/patch_nx2=4",
            "parthenon/refinement/patch_nx3=16"]
    d1 = str(tmp_path / "straight")
    s1 = Simulation(deck, overrides=args, data_dir=d1, nshards=4)
    s1.run()

    d2 = str(tmp_path / "chunked")
    s2 = Simulation(deck, overrides=args + [
        "parthenon/output9/file_type=rst",
        "parthenon/output9/dt=0.1",
        "parthenon/time/nlim=10"], data_dir=d2, nshards=4)
    s2.run()
    rst = os.path.join(d2, [f for f in os.listdir(d2)
                            if f.endswith("final.rst.npz")][0])
    s3 = Simulation(deck, overrides=args, data_dir=d2, restart=rst,
                    nshards=4)
    assert s3.driver._states is not None, "fine level not restored"
    s3.run()

    assert s3.tm.ncycle == s1.tm.ncycle
    for lvl in (0, 1):
        a = np.asarray(s1.driver._states[lvl]["gas"]["u"])
        b = np.asarray(s3.driver._states[lvl]["gas"]["u"])
        assert np.array_equal(a, b), \
            f"level-{lvl} restart mismatch: {np.abs(a - b).max():g}"


def test_sharded_adaptive_move_matches_serial(tmp_path):
    """Adaptive patch moves under sharding: the host-side retag gathers
    the sharded parent, re-prolongs at the new spot (wrap axes keep the
    full span with wrapped slope stencils), and the next sharded step is
    identical to the serial tree's."""
    import jax.numpy as jnp

    from artemis_tpu.amr import MultiLevelSMR
    from artemis_tpu.config import ParameterInput
    from artemis_tpu.driver import Integrator
    from artemis_tpu.grid import grid_from_input
    from artemis_tpu.ops.hydro import FluidCfg
    from artemis_tpu.parallel.amr import ShardedSMR
    from artemis_tpu.parallel.mesh import make_device_mesh

    box = """
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
nx2 = 16
x2min = -0.5
x2max = 0.5
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

    def bump(g):
        x1, x2, x3 = g.cell_centers()
        nz, ny, nx = tuple(reversed(g.nx))
        w = np.zeros((1, 6, nz, ny, nx))
        r2 = np.broadcast_to(x1**2 + x2**2 + x3**2, (nz, ny, nx))
        w[:, 0] = 1.0 + 0.5 * np.exp(-r2 / 0.05)
        w[:, 4] = 1.0
        w[:, 5] = w[:, 4] / (0.4 * w[:, 0])
        return w

    pin = ParameterInput.from_string(box)
    grid = grid_from_input(pin)
    cfg = FluidCfg(fluid="gas", recon="plm", rsolver="hllc", gamma=1.4,
                   cfl=0.4)
    patches = [dict(level=1, lo=(16, 6, 0), n=(8, 4, 8))]  # wraps x3
    ml = MultiLevelSMR(grid, Integrator.make("rk2"), cfg, patches=patches)
    sml = ShardedSMR(grid, Integrator.make("rk2"), cfg, patches=patches,
                     mesh=make_device_mesh(4), axis=3)
    prims = [{"gas": bump(g)} for g in ml.ic_grids]
    st0 = ml.initialize(prims)
    st1 = sml.initialize(prims)
    los0 = [None, jnp.asarray(np.array(ml.nodes[1].lo, np.int32))]
    los1 = [None, jnp.asarray(np.array(sml.nodes[1].lo, np.int32))]
    new_lo = [10, 4, 0]
    st0, los0 = ml._move_patch(list(st0), list(los0), ml.nodes[1], new_lo)
    st1, los1 = sml._move_patch(list(st1), list(los1), sml.nodes[1], new_lo)
    a = np.asarray(st0[1]["gas"]["w"])
    b = np.asarray(st1[1]["gas"]["w"])
    assert np.array_equal(a, b), np.abs(a - b).max()
    dt = jnp.asarray(0.01)
    st0 = ml._step(st0, dt, jnp.asarray(0.0), los0, None)
    st1 = sml._step(st1, dt, jnp.asarray(0.0), los1, None)
    a = np.asarray(st0[0]["gas"]["w"])
    b = np.asarray(st1[0]["gas"]["w"])
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() < 1e-13


def test_sharded_refine_distance_tracking(tmp_path):
    """nbody ``refine_distance`` tracking patches under domain
    decomposition (ref nbody.cpp:276-312 + Parthenon block
    distribution): the planet's patch is a small (r,phi) box that does
    NOT wrap the sharded phi axis, so it runs as a replicated node —
    ghosts prolonged from the all-gathered parent, restriction and
    area-weighted flux correction scattered back into each shard's
    window.  Matches the serial tracked run to roundoff."""
    deck = os.path.join(INP, "disk_nbody_cyl.in")
    args = ["parthenon/time/nlim=10",
            "parthenon/mesh/nx1=64", "parthenon/mesh/nx2=64",
            "parthenon/mesh/nx3=1",
            "parthenon/mesh/refinement=static",
            "parthenon/mesh/numlevel=1",
            "nbody/planet1/mass=1.0e-4",
            "nbody/planet1/a=2.0",
            "nbody/planet1/f=0.0",
            "nbody/planet1/refine_distance=0.3"]
    s0 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "serial"))
    assert s0.driver._particle_nodes, "no tracking patch (serial)"
    s0.run()
    s1 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "shard"),
                    nshards=4)
    assert s1.driver._particle_nodes, "no tracking patch (sharded)"
    ni = next(iter(s1.driver._particle_nodes))
    node = s1.driver.smr.nodes[ni]
    assert node.replicated and not any(node.wrap)
    s1.run()
    for idx in (0, ni):
        a = np.asarray(s0.driver._states[idx]["gas"]["w"])
        b = np.asarray(s1.driver._states[idx]["gas"]["w"])
        assert np.isfinite(b).all()
        rel = np.abs(a - b).max() / np.abs(a).max()
        assert rel < 1e-11, (idx, rel)
    assert np.abs(np.asarray(s0.nbody.pos) - np.asarray(s1.nbody.pos)).max() \
        < 1e-14


def test_sharded_tracking_restart_bitexact(tmp_path):
    """Restart of a sharded run with a replicated tracking patch restores
    the patch (and the particle system) bit-exactly."""
    deck = os.path.join(INP, "disk_nbody_cyl.in")
    args = ["parthenon/mesh/nx1=32", "parthenon/mesh/nx2=32",
            "parthenon/mesh/nx3=1", "parthenon/time/tlim=0.2",
            "parthenon/mesh/refinement=static",
            "parthenon/mesh/numlevel=1",
            "nbody/planet1/mass=1.0e-4",
            "nbody/planet1/a=2.0",
            "nbody/planet1/f=0.0",
            "nbody/planet1/refine_distance=0.3"]
    d1 = str(tmp_path / "straight")
    s1 = Simulation(deck, overrides=args, data_dir=d1, nshards=4)
    s1.run()

    d2 = str(tmp_path / "chunked")
    s2 = Simulation(deck, overrides=args + [
        "parthenon/output9/file_type=rst",
        "parthenon/output9/dt=0.05",
        "parthenon/time/nlim=8"], data_dir=d2, nshards=4)
    s2.run()
    rst = os.path.join(d2, [f for f in os.listdir(d2)
                            if f.endswith("final.rst.npz")][0])
    s3 = Simulation(deck, overrides=args, data_dir=d2, restart=rst,
                    nshards=4)
    assert s3.driver._states is not None, "fine level not restored"
    s3.run()

    assert s3.tm.ncycle == s1.tm.ncycle
    ni = next(iter(s1.driver._particle_nodes))
    for lvl in (0, ni):
        a = np.asarray(s1.driver._states[lvl]["gas"]["u"])
        b = np.asarray(s3.driver._states[lvl]["gas"]["u"])
        assert np.array_equal(a, b), \
            f"node-{lvl} restart mismatch: {np.abs(a - b).max():g}"
    assert np.array_equal(np.asarray(s1.nbody.pos), np.asarray(s3.nbody.pos))


def test_sharded_adaptive_deck(tmp_path):
    """Deck-driven adaptive refinement under sharding (blast_amr with a
    periodic x3).  With tiled the DEFAULT for criterion decks, this now
    exercises spawn/destroy regrids on a 4-shard tree end-to-end: the
    host-side tag pass gathers the sharded root, spawned tiles run as
    replicated nodes, and the tile SET matches serial exactly.  State
    tolerance 1e-11: the block-sharded root's psum/ppermute orders
    differ from serial at the ulp level and ~500 blast cycles over 8
    tiles amplify to a few e-13 (measured 4.0e-13)."""
    deck = os.path.join(INP, "blast_amr.in")
    args = ["parthenon/time/tlim=0.02",
            "parthenon/mesh/nx3=8", "parthenon/mesh/x3min=-0.5",
            "parthenon/mesh/x3max=0.5",
            "parthenon/mesh/ix3_bc=periodic", "parthenon/mesh/ox3_bc=periodic",
            "parthenon/refinement/patch_nx3=8",
            "parthenon/refinement/check_interval=5"]
    s0 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "serial"))
    assert s0.driver.tiled
    s0.run()
    s1 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "shard"),
                    nshards=4)
    assert s1.driver.tiled
    s1.run()
    pool0 = sorted(nd.lo for nd in s0.driver.smr.nodes
                   if getattr(nd, "pool", False))
    pool1 = sorted(nd.lo for nd in s1.driver.smr.nodes
                   if getattr(nd, "pool", False))
    assert pool0 and pool0 == pool1, (pool0, pool1)
    a = np.asarray(s0.state["gas"]["w"])
    b = np.asarray(s1.state["gas"]["w"])
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() < 1e-11


def test_sharded_amr_distributed_fine_level(tmp_path):
    """<artemis> amr_distribute=true: a non-wrap patch BLOCK-SHARDS along
    the decomposition axis — each shard computes 1/nshards of the fine
    level (the reference's rank-distributed MeshBlocks,
    src/artemis.cpp:51-54) with fine-fine ppermute ghosts at the
    internal seams, parent prolongation at the two global ends, and
    masked global-frame scatters for restriction/flux correction.  The
    sharded run reproduces the serial refined run to roundoff."""
    deck = os.path.join(INP, "linwave.in")
    args = ["parthenon/time/nlim=20", "parthenon/mesh/nghost=2",
            "parthenon/mesh/nx1=32", "parthenon/mesh/nx2=8",
            "parthenon/mesh/nx3=16", "problem/amp=1.0e-6",
            "gas/reconstruct=plm",
            "parthenon/mesh/refinement=static",
            "parthenon/refinement/patch_nx1=16",
            "parthenon/refinement/patch_nx2=4",
            "parthenon/refinement/patch_nx3=8"]
    s0 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "serial"))
    s0.run()
    s1 = Simulation(deck, overrides=args + ["artemis/amr_distribute=true"],
                    data_dir=str(tmp_path / "shard"), nshards=4)
    node = s1.driver.smr.nodes[1]
    assert getattr(node, "distributed", False)
    assert not node.replicated and not node.wrap[2]
    # the fine level is genuinely split: the local node carries 1/4 of
    # the patch along x3 (refined work scales out with shards)
    assert node.grid.nx[2] == s0.driver.smr.nodes[1].grid.nx[2] // 4
    s1.run()
    for lvl in (0, 1):
        a = np.asarray(s0.driver._states[lvl]["gas"]["w"])
        b = np.asarray(s1.driver._states[lvl]["gas"]["w"])
        assert a.shape == b.shape  # sharded output reassembles globally
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() < 1e-12, (lvl, np.abs(a - b).max())


def test_sharded_amr_distributed_radiation(tmp_path):
    """Distributed fine level WITH gray FLD (the north-star composition):
    the patch's CG matvec block-shards along the decomposition axis —
    ppermute stencil halos at internal fine-fine seams, psum dot
    products, prolonged-parent Dirichlet planes applied only at the
    shard-0 / shard-(S-1) global end faces (Radiation._edge_masks).
    Matches the serial refined RHD run to roundoff (reference: every
    MeshBlock at every level is rank-distributed and jaybenne photons
    migrate across rank boundaries, src/artemis.cpp:51-54)."""
    deck = os.path.join(INP, "rad_shock.in")
    args = ["parthenon/time/nlim=10",
            "parthenon/mesh/nx1=64", "parthenon/mesh/nx2=1",
            "parthenon/mesh/nx3=16",
            "parthenon/mesh/ix3_bc=periodic", "parthenon/mesh/ox3_bc=periodic",
            "parthenon/mesh/x3min=0.0", "parthenon/mesh/x3max=1.0",
            "parthenon/mesh/refinement=static",
            "parthenon/refinement/patch_nx1=32",
            "parthenon/refinement/patch_nx3=8"]
    s0 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "serial"))
    s0.run()
    s1 = Simulation(deck, overrides=args + ["artemis/amr_distribute=true"],
                    data_dir=str(tmp_path / "shard"), nshards=4)
    node = s1.driver.smr.nodes[1]
    assert getattr(node, "distributed", False)
    assert node.radiation is not None
    assert node.radiation._nshards == 4
    s1.run()
    for key, kind in (("gas", "w"), ("rad", "Er")):
        a = np.asarray(s0.state[key][kind])
        b = np.asarray(s1.state[key][kind])
        assert np.isfinite(b).all()
        rel = np.abs(a - b).max() / np.abs(a).max()
        assert rel < 1e-11, (key, kind, rel)


def test_sharded_amr_distributed_curvilinear(tmp_path):
    """Distributed fine level on a CURVILINEAR disk: a phi-partial ring
    patch block-shards along phi (the geometry is ignorable there —
    x3dep — so shard windows are translation-invariant and the shard-0
    volf/spacings hold everywhere).  Matches the serial refined run."""
    deck = os.path.join(INP, "disk_sph.in")
    args = ["parthenon/time/nlim=10",
            "parthenon/mesh/nx1=64", "parthenon/mesh/nx2=16",
            "parthenon/mesh/nx3=16",
            "parthenon/mesh/refinement=static",
            "parthenon/refinement/patch_nx1=32",
            "parthenon/refinement/patch_nx2=8",
            "parthenon/refinement/patch_nx3=8"]
    s0 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "serial"))
    s0.run()
    s1 = Simulation(deck, overrides=args + ["artemis/amr_distribute=true"],
                    data_dir=str(tmp_path / "shard"), nshards=4)
    node = s1.driver.smr.nodes[1]
    assert getattr(node, "distributed", False) and node.curv
    assert node.grid.nx[2] == s0.driver.smr.nodes[1].grid.nx[2] // 4
    s1.run()
    for lvl in (0, 1):
        a = np.asarray(s0.driver._states[lvl]["gas"]["w"])
        b = np.asarray(s1.driver._states[lvl]["gas"]["w"])
        assert a.shape == b.shape
        assert np.isfinite(b).all()
        rel = np.abs(a - b).max() / np.abs(a).max()
        assert rel < 1e-11, (lvl, rel)


def test_sharded_distribute_uneven_falls_back(tmp_path):
    """A patch extent that does not split evenly over the shards
    REPLICATES instead of raising (deck portability: Parthenon
    redistributes any block count over ranks)."""
    deck = os.path.join(INP, "linwave.in")
    args = ["parthenon/time/nlim=2", "parthenon/mesh/nghost=2",
            "parthenon/mesh/nx1=32", "parthenon/mesh/nx2=8",
            "parthenon/mesh/nx3=16", "problem/amp=1.0e-6",
            "gas/reconstruct=plm",
            "parthenon/mesh/refinement=static",
            "parthenon/refinement/patch_nx1=16",
            "parthenon/refinement/patch_nx2=4",
            # 6 does not split into even slices over 4 shards
            "parthenon/refinement/patch_nx3=6",
            "artemis/amr_distribute=true"]
    s1 = Simulation(deck, overrides=args, data_dir=str(tmp_path / "shard"),
                    nshards=4)
    node = s1.driver.smr.nodes[1]
    assert not getattr(node, "distributed", False)
    assert node.replicated
    s1.run()
    assert np.isfinite(np.asarray(s1.state["gas"]["w"])).all()
