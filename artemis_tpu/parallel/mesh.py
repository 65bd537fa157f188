"""Multi-chip domain decomposition over a ``jax.sharding.Mesh``.

TPU-native replacement for the reference's MPI rank decomposition + Parthenon
ghost-buffer exchange (SURVEY.md §2.7): the global grid is block-sharded
along x3 over the device mesh; each step runs under ``shard_map`` and fills
its ghost slabs with ``lax.ppermute`` neighbor collectives over ICI
(vs. ``StartReceiveBoundBufs``/``SendBoundBufs``, artemis_driver.cpp:177-261).
Global reductions (CFL dt) use ``lax.pmin`` (vs. MPI allreduce).

Geometry note: in every supported coordinate system the metric is
x3-independent (``geometry::x3dep() == false``), and x3 spacing is uniform,
so all shards share identical geometry constants — the local Hydro is built
once and closed over (no per-shard geometry arrays needed).  Sharding along
x1/x2 (x-dependent metrics) will pass geometry as sharded arguments instead.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import bc as bc_mod
from ..driver import Driver, Integrator
from ..geometry import geometry as geo
from ..grid import Grid

AXIS = "x3"


def make_device_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _local_grid_at(grid: Grid, nshards: int, shard: int) -> Grid:
    """Shard-local Grid with the x3 window of the given shard."""
    nx3 = grid.nx[2]
    if nx3 % nshards != 0:
        raise ValueError(f"nx3={nx3} not divisible by {nshards} shards")
    nz_l = nx3 // nshards
    dz = (grid.xmax[2] - grid.xmin[2]) / nx3
    ng3 = grid.nghost if nx3 > 1 else 0
    if nz_l == 1 and nshards > 1:
        raise ValueError("need >= 2 x3 cells per shard")
    z0 = grid.xmin[2] + dz * nz_l * shard
    xf3 = z0 + dz * np.arange(-ng3, nz_l + ng3 + 1, dtype=np.float64)
    geom = geo.build_geometry(grid.coords, grid.geom.xf1, grid.geom.xf2, xf3)
    return dataclasses.replace(
        grid,
        nx=(grid.nx[0], grid.nx[1], nz_l),
        xmin=(grid.xmin[0], grid.xmin[1], z0),
        xmax=(grid.xmax[0], grid.xmax[1], z0 + dz * nz_l),
        geom=geom,
    )


def _local_grid(grid: Grid, nshards: int) -> Grid:
    """Shard-local Grid: x3 interior split evenly (metric is x3-independent,
    so shard 0's coordinates stand in for every shard)."""
    return _local_grid_at(grid, nshards, 0)


class ShardedZField:
    """Lazy per-shard view of a global interior [z, y, x]-shaped field.

    Sources read precomputed fields with ``jnp.asarray(field)``; inside the
    shard_map trace this resolves (via ``__jax_array__``) to the local z
    window selected by ``lax.axis_index`` — the TPU equivalent of each MPI
    rank holding its own block of a global coefficient array."""

    def __init__(self, global_arr: np.ndarray, nz_local: int):
        self.g = np.ascontiguousarray(global_arr)
        self.nzl = nz_local
        self.zax = self.g.ndim - 3

    def __jax_array__(self):
        idx = lax.axis_index(AXIS)
        return lax.dynamic_slice_in_dim(
            jnp.asarray(self.g), idx * self.nzl, self.nzl, axis=self.zax)


def _walk_arrays(obj, path=()):
    """(path, array) pairs for nested ndarray fields; path items are
    ('attr', name) / ('idx', i) / ('key', k)."""
    out = []
    if isinstance(obj, np.ndarray):
        out.append((path, obj))
    elif isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            out += _walk_arrays(v, path + (("idx", i),))
    elif isinstance(obj, dict):
        for k, v in obj.items():
            out += _walk_arrays(v, path + (("key", k),))
    return out


def _get_path(src, path):
    obj = src
    for kind, k in path:
        obj = getattr(obj, k) if kind == "attr" else obj[k]
    return obj


def _set_path(src, path, value):
    kind, k = path[-1]
    parent = _get_path(src, path[:-1]) if len(path) > 1 else src
    if kind == "attr":
        setattr(parent, k, value)
    elif isinstance(parent, tuple):
        new = tuple(value if i == k else v for i, v in enumerate(parent))
        _set_path(src, path[:-1], new)
    else:
        parent[k] = value


def _localize_x3_fields(sources, srcs_shard1, srcs_global, nz_local):
    """Replace interior-[z,y,x]-shaped precomputed fields with ShardedZField
    views of the global-grid build.  This is unconditionally correct (the
    per-shard dynamic slice of the global field IS the shard's field,
    whether or not it varies with x3); each device then holds the global
    coefficient array once — the same footprint the reference pays when a
    rank-count-independent coefficient table is stored per rank."""
    del srcs_shard1  # kept in the signature for the factory-consistency call
    for s0, sg in zip(sources, srcs_global):
        fields0 = []
        for k, v in vars(s0).items():
            fields0 += _walk_arrays(v, (("attr", k),))
        for path, a0 in fields0:
            try:
                ag = _get_path(sg, path)
            except (AttributeError, KeyError, IndexError, TypeError):
                continue
            if not isinstance(ag, np.ndarray) or ag.ndim < 3:
                continue
            # interior-shaped along z on both builds -> localize
            if (a0.ndim == ag.ndim and a0.shape[-3] == nz_local
                    and ag.shape[-3] != a0.shape[-3]
                    and ag.shape[-2:] == a0.shape[-2:]):
                _set_path(s0, path, ShardedZField(ag, nz_local))


class ShardedDriver(Driver):
    """Driver whose step runs under shard_map over a 1-D device mesh."""

    def __init__(
        self,
        grid: Grid,
        integrator: Integrator,
        gas_cfg,
        dust_cfg=None,
        sources=None,
        bc_custom=None,
        mesh: Optional[Mesh] = None,
        omf: float = 0.0,
        diffusion=None,
        sources_factory=None,
    ):
        self.mesh = mesh if mesh is not None else make_device_mesh()
        self.nshards = self.mesh.devices.size
        self.global_grid = grid
        local = _local_grid(grid, self.nshards)
        if sources_factory is not None:
            if sources:
                raise ValueError("pass sources or sources_factory, not both")
            # Rebuild the sources against the shard-local grid.  shard_map
            # traces ONE program, so precomputed fields that vary with the
            # shard's x3 window cannot be closed over as constants: those
            # are detected (shard-0 vs shard-1 build) and replaced by
            # ShardedZField views of the global-grid build, which lazily
            # dynamic-slice by lax.axis_index at trace time (sources read
            # fields via jnp.asarray -> __jax_array__).
            sources = sources_factory(local)
            if self.nshards > 1:
                _localize_x3_fields(
                    sources,
                    sources_factory(_local_grid_at(grid, self.nshards, 1)),
                    sources_factory(grid),
                    grid.nx[2] // self.nshards)
        super().__init__(local, integrator, gas_cfg, dust_cfg, sources, bc_custom,
                         omf, diffusion)
        # the periodic no-pad fused kernel wraps halos locally, which is
        # wrong under domain decomposition (halos come from ppermute)
        if self.nshards > 1:
            self._fused_periodic = False

    # -- sharding specs --------------------------------------------------
    def state_spec(self):
        spec_arr = P(None, None, AXIS, None, None)  # [ns, C, z, y, x]
        return {name: {"u": spec_arr, "w": spec_arr} for name, _ in self._fluids()}

    def shard_state(self, state):
        """Place a host/global state onto the device mesh."""
        out = {}
        for name, _ in self._fluids():
            sh = NamedSharding(self.mesh, P(None, None, AXIS, None, None))
            out[name] = {
                k: jax.device_put(jnp.asarray(v), sh) for k, v in state[name].items()
            }
        return out

    def initialize(self, state):
        """Shard the pgen's global primitive arrays, then run P2C under
        shard_map (PostInitialization equivalent)."""
        sh = NamedSharding(self.mesh, P(None, None, AXIS, None, None))
        ws = {
            name: jax.device_put(jnp.asarray(state[name]["w"]), sh)
            for name, _ in self._fluids()
        }

        def init_local(ws):
            out = {}
            for name, cfg in self._fluids():
                u, w = self.hydro.prim_to_cons(ws[name], cfg)
                out[name] = {"u": u, "w": w}
            return out

        spec_w = {name: P(None, None, AXIS, None, None) for name, _ in self._fluids()}
        return jax.jit(
            jax.shard_map(
                init_local,
                mesh=self.mesh,
                in_specs=(spec_w,),
                out_specs=self.state_spec(),
                check_vma=False,
            )
        )(ws)

    # -- ghost fill with halo exchange ----------------------------------
    def fill_ghosts(self, w_int, fluid: str):
        grid = self.grid  # local grid
        if self.nshards == 1:
            return bc_mod.pad_and_fill(w_int, grid, fluid, self.bc_custom)
        g3 = grid.ng[2]
        w_pad = bc_mod.pad_prims(w_int, grid)
        n = self.nshards
        if g3 > 0 and n > 1:
            up = [(i, (i + 1) % n) for i in range(n)]
            down = [(i, (i - 1) % n) for i in range(n)]
            # my top interior slab -> neighbor above's lower ghosts
            top = w_int[..., -g3:, :, :]
            bot = w_int[..., :g3, :, :]
            from_below = lax.ppermute(top, AXIS, up)
            from_above = lax.ppermute(bot, AXIS, down)
            nz_l = grid.nx[2]
            s2 = slice(grid.ng[1], grid.ng[1] + grid.nx[1])
            s1 = slice(grid.ng[0], grid.ng[0] + grid.nx[0])
            w_pad = w_pad.at[..., 0:g3, s2, s1].set(from_below)
            w_pad = w_pad.at[..., g3 + nz_l:, s2, s1].set(from_above)

        # physical BCs: unsharded dims normally; x3 edges masked per shard
        inner3, outer3 = grid.bc[2]
        grid_no3 = dataclasses.replace(grid, bc=(grid.bc[0], grid.bc[1], ("none", "none")))
        w_pad = bc_mod.fill_ghosts(w_pad, grid_no3, fluid, self.bc_custom)
        if grid.active(3) and inner3 != "periodic":
            idx = lax.axis_index(AXIS)
            lo = bc_mod.fill_ghosts(
                w_pad, _only3(grid, inner=True), fluid, self.bc_custom)
            hi = bc_mod.fill_ghosts(
                w_pad, _only3(grid, inner=False), fluid, self.bc_custom)
            w_pad = jnp.where(idx == 0, lo, w_pad)
            w_pad = jnp.where(idx == self.nshards - 1, hi, w_pad)
        return w_pad

    # -- jit wrappers ----------------------------------------------------
    def _build_step(self):
        step_local = super()._build_step()
        spec = self.state_spec()
        return jax.shard_map(
            step_local,
            mesh=self.mesh,
            in_specs=(spec, P(), P()),
            out_specs=spec,
            check_vma=False,
        )

    def _estimate_dt(self, state):
        def dt_local(state):
            dts = []
            for n, c in self._fluids():
                if n == "gas" and "dtden" in state["gas"]:
                    dts.append(c.cfl / jnp.max(state["gas"]["dtden"]))
                else:
                    dts.append(self.hydro.estimate_dt(state[n]["w"], c))
            return lax.pmin(jnp.min(jnp.stack(dts)), AXIS)

        return jax.shard_map(
            dt_local,
            mesh=self.mesh,
            in_specs=(self.state_spec(),),
            out_specs=P(),
            check_vma=False,
        )(state)


def _only3(grid: Grid, inner: bool) -> Grid:
    """Grid with only the requested x3 physical boundary active."""
    b3 = grid.bc[2]
    bc3 = (b3[0], "none") if inner else ("none", b3[1])
    return dataclasses.replace(
        grid, bc=(("none", "none"), ("none", "none"), bc3)
    )


def check_bc_x3_independent(bc0, bc1, local_grid, gas_cfg, dust_cfg):
    """Verify custom BC fills don't depend on the shard's x3 window by
    applying the shard-0 and shard-1 builds to the same sample state."""
    rng = np.random.default_rng(7)
    shape = tuple(local_grid.shape_entire)
    samples = {}
    if gas_cfg is not None:
        w = 1.0 + 0.1 * rng.random((gas_cfg.nspecies, 6) + shape)
        samples["gas"] = jnp.asarray(w)
    if dust_cfg is not None:
        w = 1.0 + 0.1 * rng.random((dust_cfg.nspecies, 4) + shape)
        samples["dust"] = jnp.asarray(w)
    for d in (1, 2, 3):
        if not local_grid.active(d):
            continue
        for side in (0, 1):
            name = local_grid.bc[d - 1][side]
            if name not in bc0:
                continue
            for fluid, w in samples.items():
                a = bc0[name](w, local_grid, fluid, d, side)
                b = bc1[name](w, local_grid, fluid, d, side)
                # corner-ghost cells may hold NaNs that a later BC pass in
                # another direction overwrites (e.g. theta-ghosts of an ic
                # fill past the pole) — compare them as equal
                if not np.allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-13, atol=1e-300, equal_nan=True):
                    raise ValueError(
                        f"custom BC {name!r} ({fluid}, d={d}, side={side}) "
                        "varies along x3; x3-dependent custom boundaries "
                        "are not supported in sharded runs yet")
