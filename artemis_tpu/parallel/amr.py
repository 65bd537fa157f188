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

    _fused_ok = False  # fused whole-stage kernel + replicated-patch global
    #                    scatters under shard_map: separate composition,
    #                    the sharded tree runs the jnp stage
    _sibling_exchange = True  # replicated<->replicated sibling pairs only
    #                    (_sib_pair_ok): both frames are global on every
    #                    shard, so the serial links apply verbatim.  Pairs
    #                    involving a wrap (block-sharded) node keep
    #                    prolonged ghosts — their frames are shard-local.

    def __init__(self, global_grid: Grid, integrator: Integrator, gas_cfg,
                 dust_cfg=None, sources_factory=None, diffusion_factory=None,
                 bc_custom=None, omf: float = 0.0,
                 patches: Optional[List[dict]] = None,
                 mesh: Optional[Mesh] = None, axis: int = 3, nbody=None,
                 radiation_factory=None, moving_patches: bool = False,
                 distribute: bool = False):
        # distribute=True: non-wrap patches BLOCK-SHARD along the
        # decomposition axis (each shard computes 1/nshards of the fine
        # level) instead of replicating — refined work then scales out
        # like the reference's rank-distributed MeshBlocks
        # (src/artemis.cpp:51-54).  Cartesian, radiation-free trees.
        self._distribute = bool(distribute)
        self.mesh_dev = mesh if mesh is not None else make_device_mesh()
        self.nshards = int(self.mesh_dev.devices.size)
        d = int(axis)
        if d not in (1, 2, 3):
            raise ValueError(f"shard axis {axis} not in 1..3")
        self._shard_axis = d
        if global_grid.bc[d - 1] != ("periodic", "periodic"):
            raise ValueError(
                "sharded refinement needs a periodic sharded axis")
        # global tree, built patch-by-patch in LOCKSTEP with the local tree
        # (add_patch appends to both): IC grids, field localization, and
        # the global-frame geometry of replicated (non-wrap) patches
        self._gtree = MultiLevelSMR(global_grid, integrator, gas_cfg,
                                    dust_cfg=dust_cfg, patches=None)
        n = self.nshards
        local_root = _local_grid(global_grid, n, d)
        super().__init__(local_root, integrator, gas_cfg, dust_cfg=dust_cfg,
                         sources_factory=sources_factory,
                         diffusion_factory=diffusion_factory,
                         bc_custom=bc_custom, omf=omf, patches=patches,
                         radiation_factory=radiation_factory, nbody=nbody,
                         moving_patches=moving_patches)
        from ..sources import NBodyGravity as _NBG

        for node in self.nodes:
            if self._is_rep(node):
                # replicated patches compute identically on every shard:
                # unsharded radiation solve, identity force-row reduction
                continue
            if node.radiation is not None:
                # per-level FLD: ppermute stencil halos + psum CG dots
                node.radiation.enable_sharding(d, AXIS, n)
            for src in node.sources:
                if isinstance(src, _NBG):
                    # particle force rows reduce across shards (the
                    # particle system itself is replicated on the host)
                    src.psum = lambda x: lax.psum(x, AXIS)
        for node in self.nodes:
            if self._is_rep(node):
                continue
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
            # lazy per-shard view of the global-node build (replicated
            # nodes are already built on their global patch geometry)
            from ..ops.hydro import Hydro as _Hydro

            for node, gn in zip(self.nodes, self._gtree.nodes):
                if self._is_rep(node):
                    continue
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

    @staticmethod
    def _is_rep(node):
        return getattr(node, "replicated", False)

    def _sib_pair_ok(self, a, b) -> bool:
        # both replicated: global frames on every shard, serial links apply
        return self._is_rep(a) and self._is_rep(b)

    def add_patch(self, level: int, lo, n, parent=None):
        """Register a patch in BOTH trees (global + local, same index).

        A patch that spans the full sharded axis ("wrap") is block-sharded
        like the root.  Any OTHER patch becomes a REPLICATED node: it keeps
        its global geometry and every shard computes it identically; the
        parent coupling goes through an all-gather (ghost prolongation)
        and masked global-frame scatters (restriction, flux correction).
        This is what makes nbody ``refine_distance`` tracking patches —
        small boxes around planets — work under domain decomposition
        (ref nbody.cpp:276-312)."""
        from ..amr import _Node
        from ..ops.hydro import Hydro

        d = self._shard_axis
        gparent = (self._gtree.nodes[parent.index]
                   if parent is not None else None)
        gn = self._gtree.add_patch(level, lo, n, parent=gparent)
        parent = self.nodes[gn.parent.index]
        S = self.nshards
        from ..geometry import geometry as geo

        # curvilinear patches distribute when the geometry is IGNORABLE
        # along the sharded axis (grids are uniform-spaced per axis by
        # construction, so shard windows are then translation-invariant:
        # volf/spacings/face factors identical on every shard; any
        # coordinate-dependent hydro/source field is localized lazily in
        # __init__).  phi decomposition of a disk (x3dep == False) is the
        # production case; spherical theta (x2dep) keeps replication.
        dep = {1: geo.x1dep, 2: geo.x2dep, 3: geo.x3dep}[d]
        dist_ok = (self._distribute and not gn.wrap[d - 1]
                   and not (gn.curv and dep(gn.grid.coords))
                   and gn.active[d - 1] and not self._is_rep(parent)
                   # uneven splits fall back to replication below (a deck
                   # portability guarantee, not an error: Parthenon
                   # redistributes any block count over ranks)
                   and gn.n[d - 1] % S == 0 and (gn.n[d - 1] // S) % 2 == 0)
        if dist_ok:
            # DISTRIBUTED non-wrap patch: shard k owns parent cells
            # [lo + k*n/S, lo + (k+1)*n/S) of the patch window; ghosts at
            # internal seams come from the neighbor shard's fine data
            # (ppermute), the two global ends from parent prolongation,
            # restriction/flux correction land through masked
            # global-frame scatters at shard-offset starts.
            from ..amr import _Node, _refine_grid
            from ..ops.hydro import Hydro

            nn = list(gn.n)
            nn[d - 1] //= S
            node = _Node.__new__(_Node)
            for k_, v_ in gn.__dict__.items():
                if k_ not in ("ml", "parent", "children", "index", "hydro",
                              "sources", "diffusion", "radiation", "grid",
                              "n"):
                    setattr(node, k_, v_)
            node.ml = self
            node.parent = parent
            node.children = []
            node.index = len(self.nodes)
            self.nodes.append(node)
            parent.children.append(node)
            node.n = tuple(nn)
            # shard-0 window geometry; Cartesian grids are translation-
            # invariant, and the per-shard Hydro fields are localized
            # lazily from the GLOBAL patch build in __init__
            node.grid = _refine_grid(self._gtree.nodes[parent.index].grid,
                                     gn.lo, tuple(nn))
            if node.curv:
                # the copied volf/ghost_spacings are the GLOBAL patch's;
                # rebuild them on the shard-0 window (valid on every
                # shard: the geometry is ignorable along d) against the
                # GLOBAL parent frame (node.lo indexes global parent
                # cells — the local root window would be out of range)
                real_parent = node.parent
                node.parent = self._gtree.nodes[parent.index]
                node._set_curv_weights()
                node.parent = real_parent
            node.hydro = Hydro(node.grid, self.cfg, self.dust_cfg)
            node.sources = (list(self.sources_factory(node.grid))
                            if self.sources_factory else [])
            node.diffusion = (self.diffusion_factory(node.hydro)
                              if self.diffusion_factory else None)
            # distributed FLD: the CG is matrix-free, so the matvec
            # shards with the SAME single-hop ppermute halo the hydro
            # uses (Radiation._shift), dots psum, and the Dirichlet
            # parent coupling applies only at the shard-0 / shard-(S-1)
            # global end planes (Radiation._edge_masks).  enable_sharding
            # is wired in __init__'s non-replicated loop.
            node.radiation = (self.radiation_factory(node.hydro)
                              if self.radiation_factory else None)
            node.replicated = False
            node.distributed = True
            return node
        if gn.wrap[d - 1]:
            if self._is_rep(parent):
                raise ValueError("a wrap patch cannot nest inside a "
                                 "replicated (non-wrap) patch")
            nn = list(gn.n)
            if nn[d - 1] % self.nshards:
                raise ValueError(
                    f"patch x{d} extent {nn[d - 1]} not divisible by "
                    f"{self.nshards} shards")
            nn[d - 1] //= self.nshards
            node = MultiLevelSMR.add_patch(self, level, lo, tuple(nn),
                                           parent=parent)
            node.replicated = False
            return node
        node = _Node.__new__(_Node)
        for k_, v_ in gn.__dict__.items():
            if k_ not in ("ml", "parent", "children", "index", "hydro",
                          "sources", "diffusion", "radiation"):
                setattr(node, k_, v_)
        node.ml = self
        node.parent = parent
        node.children = []
        node.index = len(self.nodes)
        self.nodes.append(node)
        parent.children.append(node)
        node.hydro = Hydro(gn.grid, self.cfg, self.dust_cfg)
        node.sources = (list(self.sources_factory(gn.grid))
                        if self.sources_factory else [])
        node.diffusion = (self.diffusion_factory(node.hydro)
                          if self.diffusion_factory else None)
        node.radiation = (self.radiation_factory(node.hydro)
                          if self.radiation_factory else None)
        node.replicated = True
        return node

    def remove_patch(self, node):
        """Drop a leaf in BOTH trees (global stays in lockstep with
        local: same indices)."""
        self._gtree.remove_patch(self._gtree.nodes[node.index])
        MultiLevelSMR.remove_patch(self, node)

    def _place_fresh(self, node, st):
        """Spawned (replicated) node states were prolonged host-side from
        the device-sharded root; pin them to a fully-replicated sharding
        so they match the compiled step's in_specs."""
        if not self._is_rep(node):
            return st
        sh = NamedSharding(self.mesh_dev, P())
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sh), st)

    # -- replicated-patch <-> sharded-parent coupling ---------------------
    def _gather_axis(self, a):
        """Reassemble the GLOBAL array along the decomposition axis."""
        return lax.all_gather(a, AXIS, axis=a.ndim - self._shard_axis,
                              tiled=True)

    def _scatter_axis(self, A, upd, starts, face=False, apply=None,
                      route=False):
        """Masked scatter of ``upd`` at GLOBAL-frame ``starts`` into the
        shard-local window of ``A``: place into a global-extent zero
        buffer, slice this shard's window (``axis_index``), blend where
        touched.  ``face=True`` for arrays with face extent (n+1) along
        the sharded axis — a seam face is updated on BOTH shards that
        carry a copy of it.  ``apply`` (traced bool): gate the whole
        scatter off on shards where it is False.  ``route=True``
        (distributed patches): every shard contributes a DIFFERENT slab
        at a different global offset — psum the global buffers first so
        each contribution reaches whichever shard's window it lands in
        (the slabs are disjoint along the axis, so the sum is a union)."""
        d = self._shard_axis
        axg = A.ndim - d
        ncell = A.shape[axg] - (1 if face else 0)
        shape = list(A.shape)
        shape[axg] = ncell * self.nshards + (1 if face else 0)
        starts = tuple(jnp.asarray(s, jnp.int32) for s in starts)
        B = lax.dynamic_update_slice(jnp.zeros(shape, A.dtype),
                                     upd.astype(A.dtype), starts)
        M = lax.dynamic_update_slice(jnp.zeros(shape, jnp.bool_),
                                     jnp.ones(upd.shape, jnp.bool_), starts)
        if apply is not None:
            M = jnp.logical_and(M, apply)
        if route and self.nshards > 1:
            B = lax.psum(jnp.where(M, B, jnp.zeros_like(B)), AXIS)
            M = lax.psum(M.astype(jnp.int32), AXIS) > 0
        k = lax.axis_index(AXIS)
        ls = [jnp.int32(0)] * A.ndim
        ls[axg] = jnp.int32(k * ncell)
        Bw = lax.dynamic_slice(B, tuple(ls), A.shape)
        Mw = lax.dynamic_slice(M, tuple(ls), A.shape)
        return jnp.where(Mw, Bw, A)

    @staticmethod
    def _is_dist(node):
        return getattr(node, "distributed", False)

    def _node_lo(self, node, los):
        lo = los[node.index]
        if self._is_dist(node) and self.nshards > 1:
            d = self._shard_axis
            k = lax.axis_index(AXIS)
            off = jnp.zeros(3, lo.dtype).at[d - 1].set(
                (k * node.n[d - 1]).astype(lo.dtype))
            lo = lo + off
        return lo

    def _post_fine_ghosts(self, wp, node, fl, states):
        """Distributed patches: internal-seam ghosts along the sharded
        axis take the neighbor shard's FINE edge data (fine-fine seams,
        exactly conservative); the two global ends keep the prolonged
        parent slabs the fill produced."""
        if not (self._is_dist(node) and self.nshards > 1):
            return wp
        d = self._shard_axis
        S = self.nshards
        ng = node.grid.ng[d - 1]
        nloc = node.grid.nx[d - 1]
        ax = wp.ndim - d

        def axsl(s0, s1):
            sl = [slice(None)] * wp.ndim
            sl[ax] = slice(s0, s1)
            return tuple(sl)

        head = wp[axsl(ng, 2 * ng)]
        tail = wp[axsl(nloc, ng + nloc)]
        from_left = lax.ppermute(tail, AXIS,
                                 [(i, i + 1) for i in range(S - 1)])
        from_right = lax.ppermute(head, AXIS,
                                  [(i + 1, i) for i in range(S - 1)])
        k = lax.axis_index(AXIS)
        lo_slab = jnp.where(k > 0, from_left, wp[axsl(0, ng)])
        hi_slab = jnp.where(k < S - 1, from_right,
                            wp[axsl(ng + nloc, 2 * ng + nloc)])
        wp = wp.at[axsl(0, ng)].set(lo_slab)
        wp = wp.at[axsl(ng + nloc, 2 * ng + nloc)].set(hi_slab)
        return wp

    def _parent_arr(self, states, node, key, kind):
        w = states[node.parent.index][key][kind]
        if (self.nshards > 1
                and (self._is_rep(node) or self._is_dist(node))
                and not self._is_rep(node.parent)):
            w = self._gather_axis(w)
        return w

    def _parent_grid(self, node):
        if (self._is_rep(node) or self._is_dist(node)) \
                and not self._is_rep(node.parent):
            return self._gtree.nodes[node.parent.index].grid
        return node.parent.grid

    def _flux_correct(self, node, fx_c, fx_f, lo):
        if (self.nshards == 1
                or not (self._is_rep(node) or self._is_dist(node))
                or self._is_rep(node.parent)):
            return node.flux_correct(fx_c, fx_f, lo)
        hc = self._gtree.nodes[node.parent.index].hydro  # global face areas
        dist = self._is_dist(node)

        def scatter(A, upd, starts, d, side):
            apply = None
            if dist and d == self._shard_axis:
                # only the patch's GLOBAL end faces are coarse-fine:
                # the end shards apply their own end-face delta, the
                # internal seam faces are fine-fine and must not correct
                k = lax.axis_index(AXIS)
                apply = (k == 0) if side == 0 else (k == self.nshards - 1)
            return self._scatter_axis(A, upd, starts,
                                      face=(d == self._shard_axis),
                                      apply=apply, route=dist)

        return node.flux_correct(fx_c, fx_f, lo, hc=hc, scatter=scatter)

    def _restrict_into(self, node, arr, res, lo):
        if (self.nshards == 1
                or not (self._is_rep(node) or self._is_dist(node))
                or self._is_rep(node.parent)):
            return MultiLevelSMR._restrict_into(self, node, arr, res, lo)
        starts = [0] * (arr.ndim - 3) + [lo[2], lo[1], lo[0]]
        return self._scatter_axis(arr, res, starts,
                                  route=self._is_dist(node))

    def _cover_mask(self, node, los):
        if not node.children:
            return None
        glob = [ch for ch in node.children
                if (self._is_rep(ch) or self._is_dist(ch))
                and not self._is_rep(node)]
        if self.nshards == 1 or not glob:
            return MultiLevelSMR._cover_mask(self, node, los)
        d = self._shard_axis
        mask = jnp.ones(tuple(reversed(node.grid.nx)))
        for ch in node.children:
            lo = los[ch.index]
            # distributed children cover their GLOBAL footprint (every
            # shard zeroes the window that falls inside its slice)
            n_g = list(ch.n)
            if self._is_dist(ch):
                n_g[d - 1] *= self.nshards
            zeros = jnp.zeros(tuple(n_g[2 - i] if node.grid.nx[2 - i] > 1
                                    else 1 for i in range(3)))
            starts = [jnp.asarray(lo[2 - i] if node.grid.nx[2 - i] > 1
                                  else 0, jnp.int32) for i in range(3)]
            if ch in glob:
                mask = self._scatter_axis(mask, zeros, starts)
            else:
                mask = jax.lax.dynamic_update_slice(mask, zeros,
                                                    tuple(starts))
        return mask

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
        rad Er, sharded along the decomposition axis; replicated patches
        are fully replicated)."""
        parts = [None, None, None, None, None]
        parts[2 + (3 - self._shard_axis)] = AXIS
        arr5 = P(*parts)
        parts4 = [None, None, None, None]
        parts4[1 + (3 - self._shard_axis)] = AXIS
        arr4 = P(*parts4)
        spec = []
        for node in self.nodes:
            a5, a4 = (P(), P()) if self._is_rep(node) else (arr5, arr4)
            st = {fl: {"u": a5, "w": a5} for fl, _ in node.fluids()}
            if node.radiation is not None:
                st["rad"] = {"Er": a4}
            spec.append(st)
        return spec

    def _u1_spec(self):
        parts = [None, None, None, None, None]
        parts[2 + (3 - self._shard_axis)] = AXIS
        arr5 = P(*parts)
        return [{fl: (P() if self._is_rep(node) else arr5)
                 for fl, _ in node.fluids()} for node in self.nodes]

    def _compile(self):
        spec = self._spec()
        # _fused_ok=False / _sibling_exchange=False: _fused and _gather6
        # come out None, _sib_links empty — the jnp stage under shard_map
        self._compile_common()
        self._stage_jits = None
        if self.nbody is not None:
            self._stage_jits = [jax.jit(jax.shard_map(
                self._make_stage(s_), mesh=self.mesh_dev,
                in_specs=(spec, self._u1_spec(), P(), P(), P(), P()),
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
        from ..amr import prolong_minmod

        prims = list(prims_per_node)
        # replicated (e.g. particle-tracking) patches may come without
        # explicit ICs: prolong host-side from the parent's GLOBAL prims
        for node in self.nodes:
            if not self._is_rep(node) or prims[node.index] is not None:
                continue
            src = prims[node.parent.index]
            if src is None:
                raise ValueError("replicated patch needs parent ICs")
            pr = {}
            for fl, _ in node.fluids():
                wp = jnp.asarray(src[fl])
                sl = tuple(
                    slice(node.lo[2 - i], node.lo[2 - i] + node.n[2 - i])
                    if node.active[2 - i] else slice(0, 1) for i in range(3))
                pr[fl] = prolong_minmod(wp[(Ellipsis, *sl)], node.active,
                                        spacings=None)
            prims[node.index] = pr
        spec = self._spec()
        parts = [None, None, None, None, None]
        parts[2 + (3 - self._shard_axis)] = AXIS
        sh = NamedSharding(self.mesh_dev, P(*parts))
        sh_rep = NamedSharding(self.mesh_dev, P())
        ws = []
        for node, pr in zip(self.nodes, prims):
            if pr is None:
                raise ValueError("sharded refinement needs explicit ICs for "
                                 "every node (pgen per patch grid)")
            sh_n = sh_rep if self._is_rep(node) else sh
            ws.append({fl: jax.device_put(jnp.asarray(pr[fl]), sh_n)
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

        ws_spec = [{fl: (P() if self._is_rep(node) else P(*parts))
                    for fl, _ in node.fluids()} for node in self.nodes]
        return jax.jit(jax.shard_map(
            init_local, mesh=self.mesh_dev, in_specs=(ws_spec,),
            out_specs=spec, check_vma=False))(ws)
