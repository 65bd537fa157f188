"""Multi-chip domain decomposition over a ``jax.sharding.Mesh``.

TPU-native replacement for the reference's MPI rank decomposition + Parthenon
ghost-buffer exchange (SURVEY.md §2.7): the global grid is block-sharded
along one axis over the device mesh; each step runs under ``shard_map`` and
fills its ghost slabs with ``lax.ppermute`` neighbor collectives over ICI
(vs. ``StartReceiveBoundBufs``/``SendBoundBufs``, artemis_driver.cpp:177-261).
Global reductions (CFL dt) use ``lax.pmin`` (vs. MPI allreduce).

Shard-axis choice: x3 works in EVERY coordinate system (the metric is
x3-independent, ``geometry::x3dep() == false``, so all shards share the
same geometry constants); x1/x2 sharding is supported for Cartesian grids
(translation-invariant metric).  Curvilinear x1/x2 sharding would need the
geometry passed as sharded arguments — planned.  Precomputed source /
coefficient fields that vary along the sharded axis are handled by lazy
per-shard views (``ShardedZField``).
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

AXIS = "shard"


def make_device_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _local_grid_at(grid: Grid, nshards: int, shard: int, d: int = 3) -> Grid:
    """Shard-local Grid with the x_d window of the given shard."""
    nd = grid.nx[d - 1]
    if nd % nshards != 0:
        raise ValueError(f"nx{d}={nd} not divisible by {nshards} shards")
    n_l = nd // nshards
    dxd = (grid.xmax[d - 1] - grid.xmin[d - 1]) / nd
    ngd = grid.nghost if nd > 1 else 0
    if nshards > 1 and n_l < max(2, ngd):
        raise ValueError(
            f"need >= max(2, nghost)={max(2, ngd)} x{d} cells per shard for "
            f"single-hop halo exchange, got {n_l}")
    x0 = grid.xmin[d - 1] + dxd * n_l * shard
    xf = x0 + dxd * np.arange(-ngd, n_l + ngd + 1, dtype=np.float64)
    faces = [grid.geom.xf1, grid.geom.xf2, grid.geom.xf3]
    faces[d - 1] = xf
    geom = geo.build_geometry(grid.coords, *faces)
    nx = list(grid.nx)
    nx[d - 1] = n_l
    xmin = list(grid.xmin)
    xmax = list(grid.xmax)
    xmin[d - 1] = x0
    xmax[d - 1] = x0 + dxd * n_l
    return dataclasses.replace(
        grid, nx=tuple(nx), xmin=tuple(xmin), xmax=tuple(xmax), geom=geom)


def _local_grid(grid: Grid, nshards: int, d: int = 3) -> Grid:
    """Shard-local Grid: x_d interior split evenly (shard 0's coordinates
    stand in for every shard; per-shard-varying fields are localized)."""
    return _local_grid_at(grid, nshards, 0, d)


class ShardedZField:
    """Lazy per-shard view of a global [.., z, y, x]-shaped field.

    Sources/Hydro read precomputed fields with ``jnp.asarray(field)``;
    inside the shard_map trace this resolves (via ``__jax_array__``) to the
    local window along the sharded axis, selected by ``lax.axis_index`` —
    the TPU equivalent of each MPI rank holding its block of a global
    table.  ``size`` is the local window extent: n_local for cell-shaped
    fields, n_local+1 for face-shaped ones, n_local+2*ng for padded ones
    (windows overlap; the stride is always n_local)."""

    def __init__(self, global_arr: np.ndarray, n_local: int, d: int = 3,
                 size: Optional[int] = None):
        self.g = np.ascontiguousarray(global_arr)
        self.nzl = n_local
        self.size = n_local if size is None else size
        self.zax = self.g.ndim - d

    def __jax_array__(self):
        idx = lax.axis_index(AXIS)
        return lax.dynamic_slice_in_dim(
            jnp.asarray(self.g), idx * self.nzl, self.size, axis=self.zax)


def _walk_arrays(obj, path=(), with_jax=False):
    """(path, array) pairs for nested ndarray fields; path items are
    ('attr', name) / ('idx', i) / ('key', k)."""
    out = []
    if isinstance(obj, np.ndarray) or (with_jax and isinstance(obj, jax.Array)):
        out.append((path, obj))
    elif isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            out += _walk_arrays(v, path + (("idx", i),), with_jax)
    elif isinstance(obj, dict):
        for k, v in obj.items():
            out += _walk_arrays(v, path + (("key", k),), with_jax)
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


def _localize_obj_fields(obj0, obj_global, nshards, n_local, d=3, obj1=None):
    """Replace per-shard-varying precomputed fields of ``obj0`` (built on
    shard 0's local grid) with ShardedZField views of the global-grid build
    ``obj_global``.  The per-shard dynamic slice of the global field IS the
    shard's field whether or not it varies along the sharded axis, so
    localizing is unconditionally correct; when ``obj1`` (a shard-1 build)
    is given, fields whose values agree between the two builds keep the
    cheaper closed-over constant.

    The window rule covers cell- (n_l), face- (n_l+1) and ghost-padded-
    (n_l+2ng) shaped fields uniformly: a field is localizable when its
    global extent exceeds the local one by (nshards-1)*n_local along the
    sharded axis (windows stride by n_local and may overlap)."""
    fields0 = []
    for k, v in vars(obj0).items():
        fields0 += _walk_arrays(v, (("attr", k),), with_jax=True)
    for path, a0 in fields0:
        try:
            ag = _get_path(obj_global, path)
        except (AttributeError, KeyError, IndexError, TypeError):
            continue
        if not isinstance(ag, (np.ndarray, jax.Array)) or np.ndim(ag) < 3:
            continue
        ax = -d
        others = [a for a in (-3, -2, -1) if a != ax]
        a0s, ags = np.shape(a0), np.shape(ag)
        if not (len(a0s) == len(ags)
                and ags[ax] - a0s[ax] == (nshards - 1) * n_local
                and all(ags[a] == a0s[a] for a in others)):
            continue
        if obj1 is not None:
            try:
                a1 = _get_path(obj1, path)
            except (AttributeError, KeyError, IndexError, TypeError):
                a1 = None
            if a1 is not None and np.shape(a1) == a0s \
                    and np.array_equal(np.asarray(a0), np.asarray(a1)):
                continue  # shard-invariant: keep the constant
        _set_path(obj0, path, ShardedZField(np.asarray(ag), n_local, d,
                                            size=a0s[ax]))


def _localize_x3_fields(sources, srcs_shard1, srcs_global, nz_local, d,
                        nshards):
    """Per-shard localization of source-package coefficient fields."""
    for s0, s1, sg in zip(sources, srcs_shard1, srcs_global):
        _localize_obj_fields(s0, sg, nshards, nz_local, d, obj1=s1)


def localize_bc_caches(bc_global, bc_local0, n_local, d, nshards):
    """Per-shard-localize custom-BC value caches.

    Fills that declare ``shard_caches`` (dicts of precomputed ghost-slab
    values read through jnp.asarray, e.g. the disk ``ic`` boundary) get the
    GLOBAL build's entries swapped for per-shard window views; entries
    whose global shape already equals the local one (boundaries ALONG the
    sharded axis) keep the global values — correct on the edge shards
    where those masked fills apply.  Returns the set of names made
    shard-safe this way."""
    done = set()
    for name, fg in bc_global.items():
        cg_all = getattr(fg, "shard_caches", None)
        fl = bc_local0.get(name)
        cl_all = getattr(fl, "shard_caches", None)
        if cg_all is None or cl_all is None:
            continue
        ok = True
        repl = []
        for cg, cl in zip(cg_all, cl_all):
            for key, ag in list(cg.items()):
                if key not in cl:
                    ok = False
                    break
                ag = np.asarray(ag)
                al = np.asarray(cl[key])
                if ag.shape == al.shape:
                    continue
                ax = ag.ndim - d
                others = [a for a in range(ag.ndim) if a != ax]
                if (ag.ndim == al.ndim
                        and ag.shape[ax] - al.shape[ax]
                        == (nshards - 1) * n_local
                        and all(ag.shape[a] == al.shape[a] for a in others)):
                    repl.append((cg, key,
                                 ShardedZField(ag, n_local, d,
                                               size=al.shape[ax])))
                else:
                    ok = False
                    break
            if not ok:
                break
        if ok:
            for cg, key, v in repl:
                cg[key] = v
            done.add(name)
    return done


class ShardedDriver(Driver):
    """Driver whose step runs under shard_map over a 1-D device mesh.

    ``axis``: the sharded grid dimension (1..3).  x3 is valid in every
    coordinate system; x1/x2 require a Cartesian grid (the local Hydro's
    geometry constants must be shard-independent)."""

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
        axis: int = 3,
        radiation=None,
        nbody=None,
    ):
        self.mesh = mesh if mesh is not None else make_device_mesh()
        self.nshards = self.mesh.devices.size
        self.global_grid = grid
        self.axis_d = int(axis)
        if self.axis_d not in (1, 2, 3):
            raise ValueError(f"shard axis {axis} not in 1..3")
        local = _local_grid(grid, self.nshards, self.axis_d)
        self._hi_grid = (_local_grid_at(grid, self.nshards, self.nshards - 1,
                                        self.axis_d)
                         if self.nshards > 1 else None)
        if sources_factory is not None:
            if sources:
                raise ValueError("pass sources or sources_factory, not both")
            # Rebuild the sources against the shard-local grid.  shard_map
            # traces ONE program, so precomputed fields that vary with the
            # shard's window cannot be closed over as constants: interior-
            # shaped fields become ShardedZField views of the global-grid
            # build, which lazily dynamic-slice by lax.axis_index at trace
            # time (sources read fields via jnp.asarray -> __jax_array__).
            sources = sources_factory(local)
            if self.nshards > 1:
                _localize_x3_fields(
                    sources,
                    sources_factory(_local_grid_at(grid, self.nshards, 1,
                                                   self.axis_d)),
                    sources_factory(grid),
                    grid.nx[self.axis_d - 1] // self.nshards,
                    self.axis_d, self.nshards)
        super().__init__(local, integrator, gas_cfg, dust_cfg, sources, bc_custom,
                         omf, diffusion, radiation=radiation, nbody=nbody)
        if self.nshards > 1 and self.axis_d != 3 \
                and not geo.is_cartesian(grid.coords):
            # curvilinear x1/x2 decomposition: the Hydro/diffusion geometry
            # constants vary with the shard's window — replace them with
            # per-shard views of the global-grid build (sliced by
            # lax.axis_index at trace time; cf. Parthenon distributing
            # geometry with the blocks)
            from ..ops.hydro import Hydro as _Hydro

            n_local = grid.nx[self.axis_d - 1] // self.nshards
            local1 = _local_grid_at(grid, self.nshards, 1, self.axis_d)
            h_g = _Hydro(grid, gas_cfg, dust_cfg)
            h_1 = _Hydro(local1, gas_cfg, dust_cfg)
            _localize_obj_fields(self.hydro, h_g, self.nshards, n_local,
                                 self.axis_d, obj1=h_1)
            if self.diffusion is not None and diffusion is not None:
                _localize_obj_fields(self.diffusion, diffusion(h_g),
                                     self.nshards, n_local, self.axis_d,
                                     obj1=diffusion(h_1))
        if self.nbody is not None:
            # particle force rows reduce across shards; the particle system
            # itself is replicated (one host process drives all devices)
            from ..sources import NBodyGravity

            for src in self.sources:
                if isinstance(src, NBodyGravity):
                    src.psum = lambda x: lax.psum(x, AXIS)
            spec = self.state_spec()
            u1_spec = {name: self._arr_spec() for name, _ in self._fluids()}
            self._stage_jits = [
                jax.jit(jax.shard_map(
                    self._make_stage_fn(s_),
                    mesh=self.mesh,
                    in_specs=(spec, u1_spec, P(), P(), P()),
                    out_specs=(spec, P()),
                    check_vma=False,
                ))
                for s_ in range(1, integrator.nstages + 1)
            ]
            if self.radiation is not None:
                self._rad_jit = jax.jit(jax.shard_map(
                    lambda st, dt: self.radiation.sync_gas(
                        self.radiation.step(st, dt)),
                    mesh=self.mesh,
                    in_specs=(spec, P()),
                    out_specs=spec,
                    check_vma=False,
                ))
        if self.radiation is not None:
            # CG dot products -> psum; stencil shifts -> ppermute halos
            self.radiation.enable_sharding(self.axis_d, AXIS, self.nshards)
        # The padded-array fused kernels run per shard on the halo-exchanged
        # local state (fill_ghosts supplies the slab; the dtden carry is
        # stacked across shards in state_spec).  Only the PERIODIC whole-
        # stage kernel must stay off: it wraps halos locally in-kernel,
        # which is wrong under decomposition.
        if self.nshards > 1:
            self._fused_periodic = False
            # the gather kernel's strips/wraps are single-device
            self._curv_gather = None
            # curvilinear fused stage: the kernel closes over shard-0's
            # coefficient rows; keep it only when every packed row is
            # identical on all shards (true for x3 decomposition of grids
            # whose x3-dependent rows are translation-invariant, e.g. the
            # uniform-phi spherical disk)
            if self._curv is not None:
                co1 = None
                try:
                    from ..ops import pallas_stage_curv as _psc

                    local1 = _local_grid_at(grid, self.nshards, 1, self.axis_d)
                    diff1 = None
                    if diffusion is not None:
                        from ..ops.hydro import Hydro as _Hydro

                        diff1 = diffusion(_Hydro(local1, gas_cfg, dust_cfg))
                    co1 = _psc.CurvCoeffs(local1, self.omf, dtype=np.float32,
                                          diff=diff1)
                except (ValueError, AssertionError):
                    co1 = None
                same = False
                if co1 is not None:
                    p0 = self._curv[1]
                    p1 = co1.pack()
                    same = all(np.array_equal(a, b)
                               for a, b in zip(p0[:3], p1[:3]))
                if not same:
                    self._curv = None

    # -- sharding specs --------------------------------------------------
    def _arr_spec(self):
        # [ns, C, z, y, x]: sharded dim d sits at array axis 2 + (3 - d)
        parts = [None, None, None, None, None]
        parts[2 + (3 - self.axis_d)] = AXIS
        return P(*parts)

    def state_spec(self, dtden: bool = False):
        spec_arr = self._arr_spec()
        spec = {name: {"u": spec_arr, "w": spec_arr} for name, _ in self._fluids()}
        if dtden:
            # per-shard CFL-denominator blocks, stacked along axis 0
            spec["gas"]["dtden"] = P(AXIS, None)
        if self.radiation is not None:
            # Er: [ns, z, y, x] -> sharded dim at axis 1 + (3 - d)
            parts = [None, None, None, None]
            parts[1 + (3 - self.axis_d)] = AXIS
            spec["rad"] = {"Er": P(*parts)}
        return spec

    def shard_state(self, state):
        """Place a host/global state onto the device mesh."""
        out = {}
        for name, _ in self._fluids():
            sh = NamedSharding(self.mesh, self._arr_spec())
            out[name] = {
                k: jax.device_put(jnp.asarray(v), sh) for k, v in state[name].items()
            }
        return out

    def initialize(self, state):
        """Shard the pgen's global primitive arrays, then run P2C under
        shard_map (PostInitialization equivalent)."""
        sh = NamedSharding(self.mesh, self._arr_spec())
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

        spec_w = {name: self._arr_spec() for name, _ in self._fluids()}
        spec_arr = self._arr_spec()
        fluid_spec = {name: {"u": spec_arr, "w": spec_arr}
                      for name, _ in self._fluids()}
        out = jax.jit(
            jax.shard_map(
                init_local,
                mesh=self.mesh,
                in_specs=(spec_w,),
                out_specs=fluid_spec,
                check_vma=False,
            )
        )(ws)
        return self.prepare_state(out)

    # -- ghost fill with halo exchange ----------------------------------
    def fill_ghosts(self, w_int, fluid: str):
        grid = self.grid  # local grid
        d = self.axis_d
        if self.nshards == 1:
            return bc_mod.pad_and_fill(w_int, grid, fluid, self.bc_custom)
        gd = grid.ng[d - 1]
        w_pad = bc_mod.pad_prims(w_int, grid)
        n = self.nshards
        if gd > 0 and n > 1:
            up = [(i, (i + 1) % n) for i in range(n)]
            down = [(i, (i - 1) % n) for i in range(n)]

            def axsl(a, sl_d):
                sl = [slice(None)] * a.ndim
                sl[a.ndim - d] = sl_d
                return tuple(sl)

            # my top interior slab -> neighbor above's lower ghosts
            top = w_int[axsl(w_int, slice(-gd, None))]
            bot = w_int[axsl(w_int, slice(0, gd))]
            from_below = lax.ppermute(top, AXIS, up)
            from_above = lax.ppermute(bot, AXIS, down)
            n_l = grid.nx[d - 1]
            # interior slices of the two unsharded dims
            sl = [slice(None)] * w_pad.ndim
            for c in (1, 2, 3):
                if c == d:
                    continue
                sl[w_pad.ndim - c] = slice(grid.ng[c - 1],
                                           grid.ng[c - 1] + grid.nx[c - 1])
            lo_sl = list(sl)
            lo_sl[w_pad.ndim - d] = slice(0, gd)
            hi_sl = list(sl)
            hi_sl[w_pad.ndim - d] = slice(gd + n_l, None)
            w_pad = w_pad.at[tuple(lo_sl)].set(from_below)
            w_pad = w_pad.at[tuple(hi_sl)].set(from_above)

        # physical BCs: unsharded dims normally; sharded-axis edges masked.
        # The outer-edge fill gets the LAST shard's local grid so lazily
        # geometry-deriving custom fills (disk extrap/visc) bake the right
        # window's values; the fill itself is masked to that shard.
        inner_d, outer_d = grid.bc[d - 1]
        bc = list(grid.bc)
        bc[d - 1] = ("none", "none")
        grid_nod = dataclasses.replace(grid, bc=tuple(bc))
        w_pad = bc_mod.fill_ghosts(w_pad, grid_nod, fluid, self.bc_custom)
        if grid.active(d) and inner_d != "periodic":
            idx = lax.axis_index(AXIS)
            hi_grid = getattr(self, "_hi_grid", None) or grid
            lo = bc_mod.fill_ghosts(
                w_pad, _only_d(grid, d, inner=True), fluid, self.bc_custom)
            hi = bc_mod.fill_ghosts(
                w_pad, _only_d(hi_grid, d, inner=False), fluid, self.bc_custom)
            w_pad = jnp.where(idx == 0, lo, w_pad)
            w_pad = jnp.where(idx == self.nshards - 1, hi, w_pad)
        return w_pad

    # -- jit wrappers ----------------------------------------------------
    def prepare_state(self, state):
        """Seed the fused-kernel dtden carry (globally stacked per-shard
        blocks, P(AXIS, None))."""
        if state["gas"]["w"].dtype != jnp.float32:
            return state
        curv_full = self._curv is not None and self._curv_full
        if not (self._fused_stage or curv_full) or "dtden" in state["gas"]:
            return state
        cfg = self.gas_cfg
        dt0 = float(self._estimate_dt(state))
        if curv_full:
            from ..ops import pallas_stage_curv as _psc

            nx, ny, nz = self.grid.nx
            shape_l = (nz // _psc._pick_tz(nz) if nz > 1 else 1,
                       ny // _psc.TY)
        else:
            from ..ops import pallas_stage as _ps

            shape_l = _ps.dt_block_shape(self.grid, False)
        shape_g = (self.nshards * shape_l[0], shape_l[1])
        sh = NamedSharding(self.mesh, P(AXIS, None))
        state = dict(state)
        state["gas"] = dict(state["gas"])
        state["gas"]["dtden"] = jax.device_put(
            jnp.full(shape_g, cfg.cfl / dt0, dtype=state["gas"]["w"].dtype),
            sh)
        return state

    def _build_step(self):
        step_local = super()._build_step()

        def stepper(state, dt, time):
            spec = self.state_spec(dtden="dtden" in state["gas"])
            return jax.shard_map(
                step_local,
                mesh=self.mesh,
                in_specs=(spec, P(), P()),
                out_specs=spec,
                check_vma=False,
            )(state, dt, time)

        return stepper

    def _estimate_dt(self, state):
        def dt_local(state):
            dts = []
            for n, c in self._fluids():
                if n == "gas" and "dtden" in state["gas"]:
                    dts.append(c.cfl / jnp.max(state["gas"]["dtden"]))
                    continue
                dt = self.hydro.estimate_dt(state[n]["w"], c)
                if n == "gas" and self.diffusion is not None:
                    dt = jnp.minimum(dt, c.cfl * self.diffusion.estimate_dt(
                        state[n]["w"]))
                dts.append(dt)
            dt = jnp.min(jnp.stack(dts))
            if self.radiation is not None:
                dt = jnp.minimum(dt, self.radiation.cfg.dt_rad)
            return lax.pmin(dt, AXIS)

        return jax.shard_map(
            dt_local,
            mesh=self.mesh,
            in_specs=(self.state_spec(dtden="dtden" in state["gas"]),),
            out_specs=P(),
            check_vma=False,
        )(state)


def _only_d(grid: Grid, d: int, inner: bool) -> Grid:
    """Grid with only the requested x_d physical boundary active."""
    bd = grid.bc[d - 1]
    bcd = (bd[0], "none") if inner else ("none", bd[1])
    bc = [("none", "none")] * 3
    bc[d - 1] = bcd
    return dataclasses.replace(grid, bc=tuple(bc))


def check_bc_x3_independent(bc0, bc1, local_grid, gas_cfg, dust_cfg,
                            skip_d: int = 0):
    """Verify custom BC fills don't depend on the shard's window along the
    sharded axis by applying the shard-0 and shard-1 builds to the same
    sample state.  ``skip_d``: the sharded axis itself — its physical
    boundaries only apply on the edge shards (masked fills receive the
    edge-local grids), so per-window variation there is expected."""
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
        if not local_grid.active(d) or d == skip_d:
            continue
        for side in (0, 1):
            name = local_grid.bc[d - 1][side]
            if name not in bc0 or name not in bc1:
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
                        "varies with the shard window; such transverse "
                        "custom boundaries are not supported in sharded "
                        "runs (declare shard_caches for per-shard views)")
