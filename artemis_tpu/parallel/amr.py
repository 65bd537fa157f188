"""Mesh refinement composed with multi-chip domain decomposition.

TPU-native analogue of Parthenon distributing AMR meshblocks over MPI
ranks (SURVEY.md §2.7): every refinement level is block-sharded along ONE
periodic grid axis over the device mesh and the whole multi-level step
runs under a single ``shard_map``.  The composition requires each patch
to span the full extent of the sharded axis (a "wrap" patch, see
``amr._Node.wrap``): then every level splits into the same per-shard
windows, restriction / prolongation / flux correction stay shard-local,
and the only communication is ``lax.ppermute`` halo exchange at the
periodic seams (fine-fine and the prolongation stencil rim) plus the
``lax.pmin`` CFL reduction — all riding ICI.

This matches the production shapes: ring refinement in a planet-forming
disk decomposed in phi, or a refined slab in a periodic box.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import bc as bc_mod
from ..amr import MultiLevelSMR
from ..driver import Integrator
from ..grid import Grid
from .mesh import (AXIS, _local_grid, _local_grid_at, _localize_obj_fields,
                   _localize_x3_fields, make_device_mesh)


class ShardedSMR(MultiLevelSMR):
    """MultiLevelSMR whose step runs under shard_map over a 1-D device
    mesh; every node (root + patches) is sharded along ``axis``."""

    def __init__(self, global_grid: Grid, integrator: Integrator, gas_cfg,
                 dust_cfg=None, sources_factory=None, diffusion_factory=None,
                 bc_custom=None, omf: float = 0.0,
                 patches: Optional[List[dict]] = None,
                 mesh: Optional[Mesh] = None, axis: int = 3, nbody=None,
                 radiation_factory=None):
        self.mesh_dev = mesh if mesh is not None else make_device_mesh()
        self.nshards = int(self.mesh_dev.devices.size)
        d = int(axis)
        if d not in (1, 2, 3):
            raise ValueError(f"shard axis {axis} not in 1..3")
        self._shard_axis = d
        if global_grid.bc[d - 1] != ("periodic", "periodic"):
            raise ValueError(
                "sharded refinement needs a periodic sharded axis (patches "
                "wrap there; coarse-fine faces across shards are not "
                "supported)")
        # geometry-only global tree: IC grids + per-node field localization
        self._gtree = MultiLevelSMR(global_grid, integrator, gas_cfg,
                                    dust_cfg=dust_cfg, patches=patches)
        n = self.nshards
        local_patches = []
        for gn in self._gtree.nodes[1:]:
            if not gn.wrap[d - 1]:
                raise ValueError(
                    f"sharded refinement requires every patch to span the "
                    f"full sharded axis x{d} (got lo={gn.lo} n={gn.n})")
            nn = list(gn.n)
            if nn[d - 1] % n:
                raise ValueError(
                    f"patch x{d} extent {nn[d - 1]} not divisible by "
                    f"{n} shards")
            nn[d - 1] //= n
            local_patches.append(dict(level=gn.level, lo=tuple(gn.lo),
                                      n=tuple(nn)))
        local_root = _local_grid(global_grid, n, d)
        super().__init__(local_root, integrator, gas_cfg, dust_cfg=dust_cfg,
                         sources_factory=sources_factory,
                         diffusion_factory=diffusion_factory,
                         bc_custom=bc_custom, omf=omf, patches=local_patches,
                         radiation_factory=radiation_factory, nbody=nbody)
        from ..sources import NBodyGravity as _NBG

        for node in self.nodes:
            if node.radiation is not None:
                # per-level FLD: ppermute stencil halos + psum CG dots
                node.radiation.enable_sharding(d, AXIS, n)
            for src in node.sources:
                if isinstance(src, _NBG):
                    # particle force rows reduce across shards (the
                    # particle system itself is replicated on the host)
                    src.psum = lambda x: lax.psum(x, AXIS)
        for node in self.nodes:
            rim = node.rim[d - 1] if node.parent is not None else 0
            need = max(node.grid.ng[d - 1], rim)
            if n > 1 and node.grid.nx[d - 1] < need:
                raise ValueError(
                    f"level-{node.level} node has {node.grid.nx[d - 1]} "
                    f"x{d} cells per shard; single-hop halo exchange needs "
                    f">= {need}")
        if n > 1:
            # per-node localization: any precomputed Hydro / diffusion /
            # source field that varies with the shard's window becomes a
            # lazy per-shard view of the global-node build
            from ..ops.hydro import Hydro as _Hydro

            for node, gn in zip(self.nodes, self._gtree.nodes):
                gg = gn.grid
                n_loc = gg.nx[d - 1] // n
                g1 = _local_grid_at(gg, n, 1, d)
                _localize_obj_fields(node.hydro,
                                     _Hydro(gg, gas_cfg, dust_cfg), n, n_loc,
                                     d, obj1=_Hydro(g1, gas_cfg, dust_cfg))
                if sources_factory is not None and node.sources:
                    _localize_x3_fields(node.sources, sources_factory(g1),
                                        sources_factory(gg), n_loc, d, n)
                if node.diffusion is not None and diffusion_factory is not None:
                    _localize_obj_fields(
                        node.diffusion,
                        diffusion_factory(_Hydro(gg, gas_cfg, dust_cfg)),
                        n, n_loc, d,
                        obj1=diffusion_factory(_Hydro(g1, gas_cfg, dust_cfg)))

    # global-grid nodes for problem-generator ICs (pgens must see the full
    # domain, not shard 0's window)
    @property
    def ic_grids(self):
        return [gn.grid for gn in self._gtree.nodes]

    def _ic_hydro(self, node):
        return self._gtree.nodes[node.index].hydro

    # -- sharding hooks ---------------------------------------------------
    def _exchange(self, tail, head, d):
        if self.nshards == 1 or d != self._shard_axis - 1:
            return tail, head
        n = self.nshards
        up = [(i, (i + 1) % n) for i in range(n)]
        down = [(i, (i - 1) % n) for i in range(n)]
        return (lax.ppermute(tail, AXIS, up),
                lax.ppermute(head, AXIS, down))

    def _root_fill(self, w, node, fluid):
        if self.nshards == 1:
            return bc_mod.pad_and_fill(w, node.grid, fluid, self.bc_custom)
        grid = node.grid
        d = self._shard_axis
        gd = grid.ng[d - 1]
        w_pad = bc_mod.pad_prims(w, grid)

        def axsl(a, sl_d):
            sl = [slice(None)] * a.ndim
            sl[a.ndim - d] = sl_d
            return tuple(sl)

        top = w[axsl(w, slice(-gd, None))]
        bot = w[axsl(w, slice(0, gd))]
        from_below, from_above = self._exchange(top, bot, d - 1)
        sl = [slice(None)] * w_pad.ndim
        for c in (1, 2, 3):
            if c == d:
                continue
            sl[w_pad.ndim - c] = slice(grid.ng[c - 1],
                                       grid.ng[c - 1] + grid.nx[c - 1])
        lo_sl = list(sl)
        lo_sl[w_pad.ndim - d] = slice(0, gd)
        hi_sl = list(sl)
        hi_sl[w_pad.ndim - d] = slice(gd + grid.nx[d - 1], None)
        w_pad = w_pad.at[tuple(lo_sl)].set(from_below)
        w_pad = w_pad.at[tuple(hi_sl)].set(from_above)
        # physical BCs on the unsharded axes (corners included)
        import dataclasses

        bc = list(grid.bc)
        bc[d - 1] = ("none", "none")
        grid_nod = dataclasses.replace(grid, bc=tuple(bc))
        return bc_mod.fill_ghosts(w_pad, grid_nod, fluid, self.bc_custom)

    # -- compiled step ----------------------------------------------------
    def _spec(self):
        """Per-node state spec pytree ([ns,C,z,y,x] fluids + [ns,z,y,x]
        rad Er, sharded along the decomposition axis)."""
        parts = [None, None, None, None, None]
        parts[2 + (3 - self._shard_axis)] = AXIS
        arr5 = P(*parts)
        parts4 = [None, None, None, None]
        parts4[1 + (3 - self._shard_axis)] = AXIS
        arr4 = P(*parts4)
        spec = []
        for node in self.nodes:
            st = {fl: {"u": arr5, "w": arr5} for fl, _ in node.fluids()}
            if node.radiation is not None:
                st["rad"] = {"Er": arr4}
            spec.append(st)
        return spec

    def _compile(self):
        spec = self._spec()
        self._stage_jits = None
        if self.nbody is not None:
            parts = [None, None, None, None, None]
            parts[2 + (3 - self._shard_axis)] = AXIS
            arr5 = P(*parts)
            self._stage_jits = [jax.jit(jax.shard_map(
                self._make_stage(s_), mesh=self.mesh_dev,
                in_specs=(spec, arr5, P(), P(), P(), P()),
                out_specs=(spec, P()), check_vma=False))
                for s_ in range(1, self.integ.nstages + 1)]
        base_step = MultiLevelSMR._build_step(self)
        self._step = jax.jit(jax.shard_map(
            base_step, mesh=self.mesh_dev,
            in_specs=(spec, P(), P(), P(), P()), out_specs=spec,
            check_vma=False))

        def dt_local(states):
            return lax.pmin(MultiLevelSMR._estimate_dt(self, states), AXIS)

        self._dt = jax.jit(jax.shard_map(
            dt_local, mesh=self.mesh_dev, in_specs=(spec,), out_specs=P(),
            check_vma=False))

    # -- state ------------------------------------------------------------
    def initialize(self, prims_per_node):
        """Shard each node's GLOBAL primitive arrays over the mesh, then
        run P2C under shard_map."""
        spec = self._spec()
        parts = [None, None, None, None, None]
        parts[2 + (3 - self._shard_axis)] = AXIS
        sh = NamedSharding(self.mesh_dev, P(*parts))
        ws = []
        for node, pr in zip(self.nodes, prims_per_node):
            if pr is None:
                raise ValueError("sharded refinement needs explicit ICs for "
                                 "every node (pgen per patch grid)")
            ws.append({fl: jax.device_put(jnp.asarray(pr[fl]), sh)
                       for fl, _ in node.fluids()})

        def init_local(ws):
            out = []
            for node, wd in zip(self.nodes, ws):
                st = {}
                for fl, cfg in node.fluids():
                    u, w = node.hydro.prim_to_cons(wd[fl], cfg)
                    st[fl] = {"u": u, "w": w}
                if node.radiation is not None:
                    from ..radiation import initialize_radiation

                    st["rad"] = {"Er": initialize_radiation(
                        st, self.cfg, node.radiation.cfg)["Er"]}
                out.append(st)
            return out

        ws_spec = [{fl: P(*parts) for fl, _ in node.fluids()}
                   for node in self.nodes]
        return jax.jit(jax.shard_map(
            init_local, mesh=self.mesh_dev, in_specs=(ws_spec,),
            out_specs=spec, check_vma=False))(ws)
