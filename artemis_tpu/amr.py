"""Block-structured mesh refinement: level-synchronized patch hierarchy.

TPU-native rebuild of the reference's Parthenon AMR capability (SURVEY.md
§2.7, §7.7): instead of an oct-tree of MeshBlocks with per-block prolong /
restrict / flux-correction comm, refinement is organized as a tree of
fixed-shape rectangular patches (static shapes — XLA-friendly), advanced in
lockstep with a shared global dt:

per RK stage, per (parent, child) pair:
  1. every node computes fluxes from its stage-entry primitives (root
     ghosts from physical BCs, patch ghosts from MinMod-prolonged parent
     primitives; cf. ProlongateSharedMinMod, prolongation.hpp:39-66)
  2. parent fluxes on the patch boundary faces are replaced by the area sum
     of the overlying child fluxes (flux correction — conservation across
     the refinement boundary; cf. SendBoundBufs<flxcor> /
     SetFluxCorrections, artemis_driver.cpp:198-202)
  3. every node applies the update + diffusion + external sources
  4. child cons are restricted (volume-weighted average) onto the parent
     cells they cover (cf. RestrictAverage, restriction.hpp)
  5. prims re-sync per node

Capabilities: N levels (factor-2 per level), multiple disjoint patches per
level, gas + dust, external sources (gravity/RF/cooling/drag/nbody) and
viscous/thermal diffusion on every level.  Patch POSITIONS are traced
arguments of the compiled step on Cartesian grids (lax.dynamic_slice), so
adaptive retagging — criteria re-centering (gas.cpp:304-383) or per-planet
``refine_distance`` tracking (nbody.cpp:276-312) — moves patches with NO
recompilation.  Curvilinear patches are static (geometry weights are
position-dependent); production disks pin planets in the rotating frame, so
static placement covers the reference's planet-refinement use.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import bc as bc_mod
from .driver import Integrator, SimTime, curv_point_grav, nbody_coeffs
from .grid import Grid
from .geometry import geometry as geo
from .ops import recon as recon_mod
from .ops import riemann as riemann_mod
from .ops.hydro import FluidCfg, Hydro


def _refine_grid(coarse: Grid, lo: Tuple[int, int, int], n: Tuple[int, int, int]) -> Grid:
    """Fine-level Grid covering coarse cells [lo, lo+n) at 2x resolution."""
    g = coarse.geom
    s3, s2, s1 = coarse.int_slices
    xf = []
    for d, (l, nn) in enumerate(zip(lo, n)):
        sl = (s1, s2, s3)[d]
        faces = {0: g.xf1, 1: g.xf2, 2: g.xf3}[d]
        f0 = faces[sl.start + l]
        f1 = faces[sl.start + l + nn]
        xf.append((f0, f1))
    nxf = tuple(2 * nn if coarse.nx[d] > 1 else 1 for d, nn in enumerate(n))
    ngf = tuple(coarse.nghost if coarse.nx[d] > 1 else 0 for d in range(3))

    def faces_1d(d):
        f0, f1 = xf[d]
        nn = nxf[d]
        dxf = (f1 - f0) / nn
        ng = ngf[d]
        return f0 + dxf * np.arange(-ng, nn + ng + 1, dtype=np.float64)

    geom = geo.build_geometry(coarse.coords, faces_1d(0), faces_1d(1), faces_1d(2))
    return dataclasses.replace(
        coarse,
        nx=nxf,
        xmin=tuple(xf[d][0] for d in range(3)),
        xmax=tuple(xf[d][1] for d in range(3)),
        geom=geom,
        bc=(("amr", "amr"), ("amr", "amr"), ("amr", "amr")),
        # domain-derived pgen quantities (wavevectors) use the ROOT extents
        dom_min=coarse.dom_min,
        dom_max=coarse.dom_max,
    )


def prolong_minmod(wc, active, spacings=None):
    """MinMod-limited prolongation coarse->fine (factor 2 per active dim).

    ``wc``: coarse array [..., z, y, x]; returns the 2x-refined array.
    Uniform grids (``spacings=None``): fine child = parent +/- slope/4
    (ProlongateSharedMinMod, prolongation.hpp:39-66 with constant dx).
    Curvilinear: ``spacings[d-1] = (dxm, dxp, dxfm, dxfp)`` 1-D arrays of
    centroid distances along axis d (GetGridSpacings, prolongation.hpp:36-67)
    so gradients and child offsets use the true volume-averaged centers.
    A per-axis ``spacings[d-1] = None`` falls back to the uniform stencil
    on that axis (metric-independent axes: φ rows, wrap-padded axes).
    """
    out = wc
    for d in (1, 2, 3):
        if not active[d - 1]:
            continue
        sp_d = None if spacings is None else spacings[d - 1]
        ax = out.ndim - d
        lo = jnp.concatenate([out.take(jnp.array([0]), axis=ax),
                              jnp.moveaxis(jnp.moveaxis(out, ax, 0)[:-1], 0, ax)],
                             axis=ax)
        hi = jnp.concatenate([jnp.moveaxis(jnp.moveaxis(out, ax, 0)[1:], 0, ax),
                              out.take(jnp.array([-1]), axis=ax)], axis=ax)
        dl = out - lo
        dr = hi - out
        if sp_d is None:
            slope = jnp.where(dl * dr > 0.0,
                              jnp.sign(dl) * jnp.minimum(jnp.abs(dl), jnp.abs(dr)),
                              0.0)
            minus = out - 0.25 * slope
            plus = out + 0.25 * slope
        else:
            def bcast(a):
                shp = [1] * out.ndim
                shp[ax] = -1
                return jnp.asarray(np.asarray(a).reshape(shp))

            dxm, dxp, dxfm, dxfp = sp_d
            gxm = dl / bcast(dxm)
            gxp = dr / bcast(dxp)
            g = 0.5 * (jnp.sign(gxm) + jnp.sign(gxp)) * jnp.minimum(
                jnp.abs(gxm), jnp.abs(gxp))
            minus = out - g * bcast(dxfm)
            plus = out + g * bcast(dxfp)
        st = jnp.stack([minus, plus], axis=ax + 1)
        shape = list(out.shape)
        shape[ax] *= 2
        out = st.reshape(shape)
    return out


def centroid_spacings(xc, xf):
    """(dxm, dxp, dxfm, dxfp) per-cell arrays from coarse centroids ``xc``
    and the fine centroids ``xf`` (2x length) they split into.  Edge cells
    get clamped one-sided spacings (gradient -> 0 through the minmod)."""
    xc = np.asarray(xc)
    xf = np.asarray(xf)
    xm = np.concatenate([[xc[0] - 1.0], xc[:-1]])
    xp = np.concatenate([xc[1:], [xc[-1] + 1.0]])
    return (xc - xm, xp - xc, xc - xf[0::2], xf[1::2] - xc)


def restrict_average(wf, active, volf=None):
    """Volume-weighted restriction fine->coarse (RestrictAverage,
    restriction.hpp:30-80: sum(u_child V_child)/sum(V_child); plain average
    when ``volf`` is None — exact for Cartesian).

    Axis order is z, y, x: pairing the MAJOR axes first is nearly free on
    TPU (contiguous adds at full lane width), so the lane-dim (x) pairing
    — the only one that costs a relayout — runs on 1/4 of the data.  The
    original x-first reshape-mean relayed out the FULL fine array and was
    the dominant AMR-glue cost at production shape.

    NOTE: the z-first pairing changes the floating-point summation tree
    vs the pre-round-4 x-first order, so restriction results can differ
    in the last ULP from checkpoints/golden outputs written by earlier
    versions (internal consistency and all regression gates are
    unaffected; only bit-exact comparison against pre-change restart
    files would notice)."""

    import os
    # measured on v5e at 256x256x64: stride-2 lane slices lower to
    # gather-like copies (-1.8 ms/cycle vs the reshape-pair form);
    # "window" routes through lax.reduce_window (XLA's pooling path —
    # summation order is the window-linear one, which differs from the
    # pairwise tree by last-ULP only)
    mode = os.environ.get("ARTEMIS_RESTRICT", "reshape")
    use_reshape = mode == "reshape"

    if mode == "window":
        win = tuple(2 if active[2 - i] and wf.shape[wf.ndim - 3 + i] > 1
                    else 1 for i in range(3))

        def down(a, mean=False):
            dims = (1,) * (a.ndim - 3) + win
            out = jax.lax.reduce_window(a, np.asarray(0, a.dtype),
                                        jax.lax.add, dims, dims, "VALID")
            if mean:
                out = out * np.asarray(1.0 / np.prod(win), a.dtype)
            return out

        if volf is None:
            return down(wf, mean=True)
        v = jnp.asarray(volf)
        return down(wf * v) / down(v)

    def down(a, mean=False):
        out = a
        for d in (3, 2, 1):
            if not active[d - 1]:
                continue
            ax = out.ndim - d
            n = out.shape[ax]
            if use_reshape:
                shape = list(out.shape)
                shape[ax] //= 2
                shape.insert(ax + 1, 2)
                pair = out.reshape(shape)
                out = (pair.mean(axis=ax + 1) if mean
                       else pair.sum(axis=ax + 1))
                continue
            lo = jax.lax.slice_in_dim(out, 0, n, 2, axis=ax)
            hi = jax.lax.slice_in_dim(out, 1, n, 2, axis=ax)
            out = (lo + hi) * 0.5 if mean else lo + hi
        return out

    if volf is None:
        return down(wf, mean=True)
    v = jnp.asarray(volf)
    return down(wf * v) / down(v)


def _fine_centroid_row(fg: Grid, d: int, nextra: int):
    """Volume-averaged fine centroids along axis d extended ``nextra`` cells
    beyond the padded fine extent (fine patch faces are uniformly spaced by
    construction, _refine_grid)."""
    g = fg.geom
    xf = {1: g.xf1, 2: g.xf2, 3: g.xf3}[d]
    dxf = xf[1] - xf[0]
    faces = np.concatenate([xf[0] + dxf * np.arange(-nextra, 0), xf,
                            xf[-1] + dxf * np.arange(1, nextra + 1)])
    xm, xp = faces[:-1], faces[1:]
    if d == 1:
        return geo._centroid_x1(fg.coords, xm, xp)
    if d == 2:
        return geo._centroid_x2(fg.coords, xm, xp)
    return 0.5 * (xm + xp)


def _slab_face_flux(wp, grid, d, fi, tlo, tn, cfg, force_pcm):
    """Hydro flux at the single interior-face plane ``fi`` along direction
    ``d`` over a transverse window (interior cells ``[tlo, tlo+tn)`` on the
    other axes), recomputed on a 4-cell jnp slab of the padded primitives.

    The fused whole-stage kernel does not expose its internal fluxes; the
    fused AMR stage rebuilds the coarse/fine interface plane fluxes with
    this helper to apply the conservation (flux-correction) delta after the
    kernel's update.  PLM/PCM uniform-limiter stencils only (the fused AMR
    path is gated to Cartesian trees).  ``fi``/``tlo`` may be traced
    (adaptive patch moves)."""
    ng = grid.ng
    nd = wp.ndim
    starts = [0] * (nd - 3)
    sizes = list(wp.shape[:-3])
    for i in range(3):          # array order z, y, x
        dd = 3 - i              # coordinate direction 3, 2, 1
        if dd == d:
            starts.append(ng[dd - 1] + fi - 2)
            sizes.append(4)
        elif grid.nx[dd - 1] > 1:
            starts.append(ng[dd - 1] + tlo[dd - 1])
            sizes.append(int(tn[dd - 1]))
        else:
            starts.append(0)
            sizes.append(1)
    starts = tuple(jnp.asarray(s, jnp.int32) for s in starts)
    slab = jax.lax.dynamic_slice(wp, starts, tuple(sizes))
    return _window_face_flux(slab, d, cfg, force_pcm)


def _window_face_flux(slab, d, cfg, force_pcm):
    """Flux at the face between rows 1 and 2 of a 4-row window along
    ``d`` (the compute tail of _slab_face_flux; gather6 rim deltas build
    the window from unpadded interiors + ghost slabs instead)."""
    nd = slab.ndim
    method = "pcm" if force_pcm else cfg.recon
    if method == "pcm":
        wl, wr = recon_mod.pcm(slab, d)
    else:
        wl, wr = recon_mod.plm_uniform(slab, d)
    sl = [slice(None)] * nd
    sl[nd - d] = slice(2, 3)    # the face between slab cells 1 and 2
    F, _, _ = riemann_mod.solve(wl[tuple(sl)], wr[tuple(sl)], d,
                                cfg.fluid, cfg.rsolver, cfg.gamma)
    return F


def _perm_components(arr, perm, nd):
    """Reorder the variable axis (nd-4) by static slices + concat."""
    ca = nd - 4
    sl = [slice(None)] * nd
    parts = []
    for i in perm:
        sl[ca] = slice(i, i + 1)
        parts.append(arr[tuple(sl)])
    return jnp.concatenate(parts, axis=ca)


def _rim_canon(win, d, nd):
    """Canonicalize a 4-row face window: flux axis to position -3 (rows on
    the cheap major axis; the transverse plane keeps the (sublane, lane)
    tiling) and the velocity components CYCLED so the normal lands in
    component 1 with the transverse pair in _vel_indices order — solve
    with d=1 then runs the exact op sequence (same summation order) the
    per-direction solve would, so the batched fluxes are bit-identical."""
    if d != 1:
        # canonical comp k maps to original _vel_indices(d)[k-1]
        perm = [0, d, d % 3 + 1, ((d + 1) % 3) + 1, 4, 5]
        win = _perm_components(win, perm, nd)
    if d != 3:
        win = jnp.moveaxis(win, nd - d, nd - 3)
    return win


def _rim_uncanon(F, d, nd):
    """Inverse of _rim_canon on a face-flux array."""
    if d != 3:
        F = jnp.moveaxis(F, nd - 3, nd - d)
    if d != 1:
        perm = [0, d, d % 3 + 1, ((d + 1) % 3) + 1, 4, 5]
        inv = [0] * 6
        for pos, src in enumerate(perm):
            inv[src] = pos
        F = _perm_components(F, inv, nd)
    return F


def _rim_batched_flux(wins, cfg, force_pcm, nd):
    """One recon+Riemann chain per distinct canonical window shape: the
    windows (parent- and fine-side, all directions) concatenate along the
    leading axis, the face flux is solved once with the canonical normal
    (component 1, axis -3), and each window's flux is sliced back out and
    un-canonicalized.  Bit-identical to per-window _window_face_flux."""
    groups = {}
    for k, (_, _, _, w) in enumerate(wins):
        # the slice-back below takes F[j:j+1] per window, which is only
        # valid when every window's leading (species) extent is 1; the
        # gather6 gate enforces cfg.nspecies == 1 transitively via the
        # fused-stage check — fail loudly here if that ever relaxes
        assert w.shape[0] == 1, (
            "_rim_batched_flux assumes a single species per window "
            f"(got leading extent {w.shape[0]})")
        groups.setdefault(w.shape, []).append(k)
    fluxes = [None] * len(wins)
    method = "pcm" if force_pcm else cfg.recon
    for ks in groups.values():
        S = jnp.concatenate([wins[k][3] for k in ks], axis=0)
        if method == "pcm":
            wl, wr = recon_mod.pcm(S, 3)
        else:
            wl, wr = recon_mod.plm_uniform(S, 3)
        sl = [slice(None)] * S.ndim
        sl[S.ndim - 3] = slice(2, 3)    # face between window rows 1 and 2
        F, _, _ = riemann_mod.solve(wl[tuple(sl)], wr[tuple(sl)], 1,
                                    cfg.fluid, cfg.rsolver, cfg.gamma)
        for j, k in enumerate(ks):
            fluxes[k] = _rim_uncanon(F[j:j + 1], wins[k][0], nd)
    return fluxes


def _restrict_face_mean(F, d, active):
    """Pool a fine face-plane flux down to the parent faces (mean over the
    2x transverse fine faces; Cartesian restriction, matching
    _Node.flux_correct's non-curvilinear branch)."""
    for c in (3, 2, 1):
        if c == d or not active[c - 1]:
            continue
        ax = F.ndim - c
        shp = list(F.shape)
        shp[ax] //= 2
        shp.insert(ax + 1, 2)
        F = F.reshape(shp).mean(axis=ax + 1)
    return F


class _Node:
    """One mesh region: the root domain (level 0) or a refinement patch."""

    def __init__(self, ml: "MultiLevelSMR", grid: Grid, parent: Optional["_Node"],
                 lo, n, level: int):
        self.ml = ml
        self.grid = grid
        self.parent = parent
        self.children: List[_Node] = []
        self.level = level
        self.lo = tuple(int(v) for v in lo) if lo is not None else None
        self.n = tuple(int(v) for v in n) if n is not None else None
        self.index = len(ml.nodes)
        ml.nodes.append(self)
        if parent is not None:
            parent.children.append(self)
        self.hydro = Hydro(grid, ml.cfg, ml.dust_cfg)
        self.sources = list(ml.sources_factory(grid)) if ml.sources_factory else []
        self.diffusion = (ml.diffusion_factory(self.hydro)
                          if ml.diffusion_factory else None)
        self.radiation = (ml.radiation_factory(self.hydro)
                          if ml.radiation_factory else None)
        self.active = tuple(grid.nx[d] > 1 for d in range(3))
        # wrap[d]: this patch spans the full extent of a (transitively)
        # periodic parent axis — ghosts there come from periodic exchange
        # of the FINE data and the axis has no coarse-fine faces
        if parent is None:
            self.wrap = (False, False, False)
        else:
            self.wrap = tuple(
                self.active[d] and self.lo[d] == 0
                and self.n[d] == parent.grid.nx[d]
                and MultiLevelSMR._axis_periodic(parent, d)
                for d in range(3))
        ng = grid.ng
        # rim: coarse cells beyond the patch feeding ghost prolongation.
        # ceil(ng/2) coarse cells produce the ng fine ghosts; +1 more so
        # every USED ghost's parent has both neighbors for its minmod slope
        # (the prolongation region's edge cells get clamped one-sided
        # slopes -> first-order ghosts otherwise)
        self.rim = tuple(max(1, -(-ng[d] // 2)) + 1 if self.active[d] else 0
                         for d in range(3))
        self.curv = not geo.is_cartesian(grid.coords)
        self._set_curv_weights()

    def _set_curv_weights(self):
        """Position-dependent curvilinear weights (recomputed by
        ``rebuild_at`` when an adaptive move relocates the patch)."""
        self.volf = None
        self.ghost_spacings = None
        if self.parent is not None and self.curv:
            cg, fg = self.parent.grid, self.grid
            self.volf = np.ascontiguousarray(np.broadcast_to(
                fg.geom.volume(), fg.shape_entire)[fg.int_slices])
            cxv = (cg.geom.xv1, cg.geom.xv2, cg.geom.xv3)
            sp = []
            for d in range(3):
                if not self.active[d]:
                    sp.append(None)
                    continue
                ngc = cg.ng[d]
                lo_ = self.lo[d]
                nn = self.n[d]
                rim = self.rim[d]
                xc = cxv[d][ngc + lo_ - rim: ngc + lo_ + nn + rim]
                # fine centroids over the full prolongation region (extends
                # past the padded fine rows: rebuild from uniform fine faces)
                xf = _fine_centroid_row(fg, d + 1,
                                        2 * rim - fg.ng[d])
                sp.append(centroid_spacings(xc, xf))
            self.ghost_spacings = tuple(sp)

    def interior_spacings(self):
        """Centroid spacings for prolongation over the patch INTERIOR
        window (GetGridSpacings over [lo, lo+n)): volume-weighted-mean-
        preserving curvilinear prolongation, so restriction of the freshly
        prolonged density reproduces the parent exactly (conservative
        adaptive moves).  Per-axis None on inactive/wrap axes (uniform
        centroids; prolong_minmod falls back to the uniform stencil)."""
        if not self.curv or self.parent is None:
            return None
        cg, fg = self.parent.grid, self.grid
        cxv = (cg.geom.xv1, cg.geom.xv2, cg.geom.xv3)
        fxv = (fg.geom.xv1, fg.geom.xv2, fg.geom.xv3)
        sp = []
        for d in range(3):
            if not self.active[d] or self.wrap[d]:
                sp.append(None)
                continue
            ngc, ngf = cg.ng[d], fg.ng[d]
            xc = cxv[d][ngc + self.lo[d]: ngc + self.lo[d] + self.n[d]]
            xf = fxv[d][ngf: ngf + 2 * self.n[d]]
            sp.append(centroid_spacings(xc, xf))
        return tuple(sp)

    def rebuild_at(self, new_lo):
        """Relocate this (curvilinear) patch: rebuild the grid, geometry-
        bound operators, and prolongation weights at the new parent-cell
        origin.  Cartesian patches never need this (their geometry is
        translation-invariant); curvilinear moves rebuild because every
        weight (volumes, centroid spacings, flux-source rows) depends on
        the physical window.  The tree must be recompiled afterwards
        (MultiLevelSMR._compile) — the caller batches that."""
        ml = self.ml
        self.lo = tuple(int(v) for v in new_lo)
        self.grid = _refine_grid(self.parent.grid, self.lo, self.n)
        self.hydro = Hydro(self.grid, ml.cfg, ml.dust_cfg)
        self.sources = list(ml.sources_factory(self.grid)) \
            if ml.sources_factory else []
        self.diffusion = (ml.diffusion_factory(self.hydro)
                          if ml.diffusion_factory else None)
        self.radiation = (ml.radiation_factory(self.hydro)
                          if ml.radiation_factory else None)
        self._set_curv_weights()

    # -- helpers ---------------------------------------------------------
    def fluids(self):
        out = [("gas", self.hydro.gas)] if self.hydro.gas else []
        if self.hydro.dust:
            out.append(("dust", self.hydro.dust))
        return out

    def patch_slices(self):
        """Parent interior slices covered by this patch ([z,y,x])."""
        lo, n = self.lo, self.n
        return tuple(slice(lo[2 - i], lo[2 - i] + n[2 - i]) for i in range(3))

    def fill_fine_ghosts(self, wf, wc, lo):
        """Pad patch prims; ghost zones from prolongated parent prims.
        ``lo`` is the (possibly traced) patch position in parent interior
        cells.

        Only the ngf-deep ghost slabs outside each coarse-fine face are
        prolonged (O(surface); the former full-patch prolongation was
        O(volume) and dominated the AMR stage cost).  Slab values are
        arithmetic-identical to the full prolongation: every USED ghost's
        parent keeps both true minmod stencil neighbors."""
        fg = self.grid
        ngf = fg.ng
        n = self.n
        # wrap axes: periodically extend the parent row by ``rim`` so the
        # prolongation (of the OTHER axes' ghost regions) has real slope
        # stencils across the seam
        for d in range(3):
            if self.wrap[d]:
                wc = self._wrap_pad(wc, d, self.rim[d])
        pads = [(0, 0)] * (wf.ndim - 3) + [
            (ngf[2], ngf[2]), (ngf[1], ngf[1]), (ngf[0], ngf[0])]
        reg = jnp.pad(wf, pads, mode="edge")
        for d in range(3):
            if not self.active[d] or self.wrap[d]:
                continue
            for side in (0, 1):
                slab = self._prolong_ghost_slab(wc, d, side, lo)
                ax = reg.ndim - 1 - d
                sl = [slice(None)] * reg.ndim
                sl[ax] = (slice(0, ngf[d]) if side == 0
                          else slice(ngf[d] + fg.nx[d], None))
                reg = reg.at[tuple(sl)].set(slab.astype(reg.dtype))
        # wrap axes: ghost zones are the periodic image of the FINE data
        # (the seam is one physical face — wrapped stencils keep its flux
        # single-valued and the update exactly conservative)
        for d in range(3):
            if self.wrap[d]:
                reg = self._wrap_ghosts(reg, d, ngf[d])
        return reg

    def ghost_strips(self, wc, lo, sib_links=None, sib_arrs=None):
        """(strips, slabs) for the gather6 fused stage: the six MinMod-
        prolonged ghost slabs reshaped into stage_curv_gather6's strip
        layouts — the O(surface) replacement for fill_fine_ghosts'
        padded-array build (requires 3-D, no wrap axes, nghost=2; the
        gather6 gate enforces this).  ``slabs`` are the raw prolonged
        faces, reused by the rim-delta face-flux windows.

        ``sib_links``/``sib_arrs``: sibling fine-ghost links
        (_sibling_links) and per-node interior prims — ghost rows that
        fall inside an adjacent same-level sibling take the sibling's
        FINE values in place of the prolonged-parent data, so tile pools
        keep the gather6 fast path without giving up seam conservation."""
        fg = self.grid
        ng = fg.nghost
        nx, ny, nz = fg.nx

        def fold(s, d, side):
            if not sib_links:
                return s
            return self._fold_sib_into_slab(s, d, side, sib_links, sib_arrs)

        pairs = None
        if self.ghost_spacings is None:
            pairs = {dd: self._prolong_ghost_slab_pair(wc, dd, lo)
                     for dd in range(3) if self.active[dd]}

        def slab_of(dd, side):
            if pairs is not None:
                return pairs[dd][side]
            return self._prolong_ghost_slab(wc, dd, side, lo)

        slabs = {}
        strips = {}
        for side in (0, 1):
            # x1: [1,6,zp,yp,2] -> [6, zp, yp+8, 128] (values at [:2])
            s = fold(slab_of(0, side), 0, side)
            slabs[(1, side)] = s
            v = s[0]
            zp, yp = v.shape[1], v.shape[2]
            st = jnp.zeros((6, zp, yp + 8, 128), v.dtype)
            strips[("x1", side)] = jax.lax.dynamic_update_slice(
                st, v, (0, 0, 0, 0))
            # x2: [1,6,zp,2,xp] -> [6, zp, 8, nx] (lo rows 6:8, hi 0:2)
            s = fold(slab_of(1, side), 1, side)
            slabs[(2, side)] = s
            v = s[0][..., ng:ng + nx]
            st = jnp.zeros((6, v.shape[1], 8, nx), v.dtype)
            strips[("x2", side)] = jax.lax.dynamic_update_slice(
                st, v, (0, 0, 6 if side == 0 else 0, 0))
            # x3: [1,6,2,yp,xp] -> [6, 2, ny+16, nx] (interior y at +8;
            # zero margins are replaced by the x1/x2 strips in-kernel)
            s = fold(slab_of(2, side), 2, side)
            slabs[(3, side)] = s
            v = s[0][:, :, ng:ng + ny, ng:ng + nx]
            st = jnp.zeros((6, 2, ny + 16, nx), v.dtype)
            strips[("x3", side)] = jax.lax.dynamic_update_slice(
                st, v, (0, 0, 8, 0))
        return strips, slabs

    def _fold_sib_into_slab(self, s, d, side, links, arrs):
        """Overwrite the portions of ghost slab ``s`` (face ``d``,
        ``side``; padded-frame extents) that a sibling link covers with
        the sibling's interior values.  Slab rows along axis ``d`` map to
        padded ghost rows [0, ng) / [ng+nx, ng+nx+ng); transverse axes
        are the full padded extent, so link dst slices apply directly."""
        fg = self.grid
        ngs = fg.ng
        for (si, dst, src) in links:
            sub_dst, sub_src = [], []
            ok = True
            for t in range(3):              # array order [z, y, x]
                ax_d = 2 - t
                ds_, ss_ = dst[t], src[t]
                if ax_d == d:
                    lo_r = 0 if side == 0 else ngs[d] + fg.nx[d]
                    a = max(ds_.start, lo_r)
                    b = min(ds_.stop, lo_r + ngs[d])
                    if a >= b:
                        ok = False
                        break
                    sub_dst.append(slice(a - lo_r, b - lo_r))
                    off = ss_.start + (a - ds_.start)
                    sub_src.append(slice(off, off + (b - a)))
                else:
                    sub_dst.append(ds_)
                    sub_src.append(ss_)
            if ok:
                s = s.at[(Ellipsis,) + tuple(sub_dst)].set(
                    arrs[si][(Ellipsis,) + tuple(sub_src)].astype(s.dtype))
        return s

    @staticmethod
    def _axis_window(a, ax, start, count):
        """Rows [start-1, start+count+1) along ``ax`` with clamped
        (edge-replicating) outer neighbor rows: ``start``/``start+count``
        must be in range; the two neighbor rows may fall outside, where
        dynamic_slice clamping returns the edge row instead — exactly the
        one-sided stencil the prolongation region edge wants."""
        start = jnp.asarray(start, jnp.int32)
        core = jax.lax.dynamic_slice_in_dim(a, start, count, axis=ax)
        nlo = jax.lax.dynamic_slice_in_dim(a, start - 1, 1, axis=ax)
        nhi = jax.lax.dynamic_slice_in_dim(a, start + count, 1, axis=ax)
        return jnp.concatenate([nlo, core, nhi], axis=ax)

    def _prolong_ghost_slab(self, wc, d, side, lo):
        """MinMod-prolonged fine ghost slab outside face (d, side):
        ngf-deep along d, full padded transverse extents (corner ghosts
        included; overlapping faces write identical values)."""
        fg = self.grid
        ngf = fg.ng
        rim = self.rim
        n = self.n
        nd = wc.ndim
        m = [r - 1 for r in rim]        # ceil(ngf/2) per axis
        slab = wc
        for t in range(3):
            if not self.active[t]:
                continue
            ax = nd - 1 - t
            off = rim[t] if self.wrap[t] else 0
            if t == d:
                start = (lo[t] - m[t] if side == 0
                         else lo[t] + n[t] - 1) + off
                count = m[t] + 1
            else:
                start = lo[t] - m[t] + off
                count = n[t] + 2 * m[t]
            slab = self._axis_window(slab, ax, start, count)
        sp = None
        if self.ghost_spacings is not None:
            spl = []
            for t in range(3):
                rows = self.ghost_spacings[t]
                if rows is None:
                    spl.append(None)
                    continue
                if t == d:
                    r = (slice(0, m[t] + 3) if side == 0
                         else slice(n[t] + m[t] - 1, n[t] + 2 * m[t] + 2))
                else:
                    r = slice(None)
                spl.append(tuple(np.asarray(a)[r] for a in rows))
            sp = tuple(spl)
        fine = prolong_minmod(slab, self.active, spacings=sp)
        sl = [slice(None)] * nd
        for t in range(3):
            if not self.active[t]:
                continue
            ax = nd - 1 - t
            if t == d:
                o = 2 * (m[t] + 1)
                sl[ax] = (slice(o - ngf[t], o) if side == 0
                          else slice(4, 4 + ngf[t]))
            else:
                o = 2 * (m[t] + 1) - ngf[t]
                sl[ax] = slice(o, o + fg.nx[t] + 2 * ngf[t])
        return fine[tuple(sl)]

    def _prolong_ghost_slab_pair(self, wc, d, lo):
        """Both side slabs of face axis ``d`` in ONE prolongation pass:
        the two sides share every transverse window, so the stencil math
        batches on the leading axis (Cartesian only — curvilinear
        ghost_spacings differ per side).  Bit-identical to
        _prolong_ghost_slab(..., d, side, ...) per side; halves the
        number of small-op chains in ghost_strips (the per-op dispatch
        overhead, not the arithmetic, dominates the prolongation cost
        at production shape)."""
        fg = self.grid
        ngf = fg.ng
        rim = self.rim
        n = self.n
        nd = wc.ndim
        m = [r - 1 for r in rim]
        slab = wc
        for t in range(3):
            if not self.active[t] or t == d:
                continue
            ax = nd - 1 - t
            off = rim[t] if self.wrap[t] else 0
            slab = self._axis_window(slab, ax, lo[t] - m[t] + off,
                                     n[t] + 2 * m[t])
        ax_d = nd - 1 - d
        off = rim[d] if self.wrap[d] else 0
        s0 = self._axis_window(slab, ax_d, lo[d] - m[d] + off, m[d] + 1)
        s1 = self._axis_window(slab, ax_d, lo[d] + n[d] - 1 + off,
                               m[d] + 1)
        fine = prolong_minmod(jnp.concatenate([s0, s1], axis=0),
                              self.active)
        out = []
        for side in (0, 1):
            sl = [slice(None)] * nd
            sl[0] = slice(side, side + 1)
            for t in range(3):
                if not self.active[t]:
                    continue
                ax = nd - 1 - t
                if t == d:
                    o = 2 * (m[t] + 1)
                    sl[ax] = (slice(o - ngf[t], o) if side == 0
                              else slice(4, 4 + ngf[t]))
                else:
                    o = 2 * (m[t] + 1) - ngf[t]
                    sl[ax] = slice(o, o + fg.nx[t] + 2 * ngf[t])
            out.append(fine[tuple(sl)])
        return out

    def _wrap_pad(self, a, d, width):
        """Periodically extend interior array ``a`` by ``width`` cells along
        axis d (0=x1,1=x2,2=x3).  On the sharded axis the periodic images
        live on the neighboring shards — halo exchange instead of a local
        wrap (the two coincide for one shard)."""
        ax = a.ndim - 1 - d
        head = jax.lax.slice_in_dim(a, 0, width, axis=ax)
        tail = jax.lax.slice_in_dim(a, a.shape[ax] - width, a.shape[ax],
                                    axis=ax)
        tail, head = self.ml._exchange(tail, head, d)
        return jnp.concatenate([tail, a, head], axis=ax)

    def _wrap_ghosts(self, a, d, ng):
        """Fill the ``ng``-wide ghost zones of padded array ``a`` along axis
        d with the periodic image of its interior (halo exchange on the
        sharded axis)."""
        ax = a.ndim - 1 - d
        nint = a.shape[ax] - 2 * ng
        lo_img = jax.lax.slice_in_dim(a, nint, nint + ng, axis=ax)
        hi_img = jax.lax.slice_in_dim(a, ng, 2 * ng, axis=ax)
        lo_img, hi_img = self.ml._exchange(lo_img, hi_img, d)
        idx_lo = [slice(None)] * a.ndim
        idx_lo[ax] = slice(0, ng)
        idx_hi = [slice(None)] * a.ndim
        idx_hi[ax] = slice(ng + nint, None)
        return a.at[tuple(idx_lo)].set(lo_img).at[tuple(idx_hi)].set(hi_img)

    def flux_correct(self, fx_c, fx_f, lo, hc=None, scatter=None):
        """Replace parent patch-boundary fluxes with summed child fluxes.

        ``hc``: parent Hydro supplying face areas (the sharded tree passes
        the GLOBAL-grid build for replicated patches).  ``scatter``: how a
        face-plane update lands in the parent flux array — defaults to
        ``dynamic_update_slice``; the sharded tree substitutes a masked
        global-frame scatter for replicated patches."""
        n = self.n
        if hc is None:
            hc = self.parent.hydro
        if scatter is None:
            def scatter(A, upd, starts, d, side):
                return jax.lax.dynamic_update_slice(A, upd, tuple(starts))
        out = {}
        for d in hc.dims:
            if self.wrap[d - 1]:
                # full-span periodic axis: no coarse-fine faces along d
                out[d] = fx_c[d]
                continue
            Fc = fx_c[d][0]
            Ff = fx_f[d][0]
            for side in (0, 1):
                cidx = lo[d - 1] + side * n[d - 1]  # traced scalar
                fidx = side * 2 * n[d - 1]          # static
                f_face = jnp.take(Ff, fidx, axis=Ff.ndim - d)
                if self.curv:
                    # area-weighted: sum(F_f A_f children) / A_c at this face
                    # (jnp ops: under sharding the areas may be lazy
                    # per-shard views, ShardedZField)
                    af_a = jnp.asarray(self.hydro.area[d])
                    af = jnp.take(af_a, fidx, axis=af_a.ndim - d)
                    ac_a = jnp.asarray(hc.area[d])
                    ac_full = jnp.take(ac_a,
                                       self.lo[d - 1] + side * n[d - 1],
                                       axis=ac_a.ndim - d)
                    f_face = f_face * af
                f_res = f_face
                rem_dims = [c for c in (3, 2, 1) if c != d]  # outer->inner
                for j, c in enumerate(rem_dims):
                    if not self.active[c - 1]:
                        continue
                    ax = f_res.ndim - 2 + j
                    shp = list(f_res.shape)
                    shp[ax] //= 2
                    shp.insert(ax + 1, 2)
                    if self.curv:
                        f_res = f_res.reshape(shp).sum(axis=ax + 1)
                    else:
                        f_res = f_res.reshape(shp).mean(axis=ax + 1)
                if self.curv:
                    acs = ac_full
                    sl = [slice(None)] * acs.ndim
                    for j, c in enumerate(rem_dims):
                        if self.active[c - 1]:
                            sl[acs.ndim - 2 + j] = slice(
                                self.lo[c - 1], self.lo[c - 1] + n[c - 1])
                    f_res = f_res / acs[tuple(sl)]
                update = jnp.expand_dims(f_res, axis=-d)
                starts = [0] * (Fc.ndim - 3)
                for c in (3, 2, 1):
                    if c == d:
                        starts.append(cidx)
                    elif self.active[c - 1]:
                        starts.append(lo[c - 1])
                    else:
                        starts.append(0)
                starts = [jnp.asarray(v, jnp.int32) for v in starts]
                Fc = scatter(Fc, update, starts, d, side)
            out[d] = (Fc,) + fx_c[d][1:]
        return out


class MultiLevelSMR:
    """N-level / multi-patch static+adaptive refinement driver."""

    def __init__(self, root_grid: Grid, integrator: Integrator, gas_cfg: FluidCfg,
                 dust_cfg: Optional[FluidCfg] = None, sources_factory=None,
                 diffusion_factory=None, bc_custom=None, omf: float = 0.0,
                 patches: Optional[List[dict]] = None, nbody=None,
                 radiation_factory=None, moving_patches: bool = False):
        self.moving_patches = moving_patches
        self.integ = integrator
        self.cfg = gas_cfg
        self.dust_cfg = dust_cfg
        self.sources_factory = sources_factory
        self.diffusion_factory = diffusion_factory
        self.radiation_factory = radiation_factory
        self.bc_custom = bc_custom or {}
        self.omf = omf
        self.nbody = nbody
        self.nodes: List[_Node] = []
        self.root = _Node(self, root_grid, None, None, None, 0)
        # build the patch tree; each spec = {level, lo, n} with ``lo`` in
        # ROOT-levels cells of its level (converted to parent coords here)
        for spec in sorted(patches or [], key=lambda s: s["level"]):
            self.add_patch(spec["level"], spec["lo"], spec["n"])
        self._compile()

    # -- sharding hooks (identity in the single-device tree; ShardedSMR
    # overrides them with ppermute halo exchange over the device mesh) ----
    _shard_axis = None  # 1..3 when the tree is device-sharded along x_d

    @property
    def ic_grids(self):
        """Per-node grids for problem-generator ICs (the GLOBAL grids;
        ShardedSMR's own nodes hold shard-local windows)."""
        return [nd.grid for nd in self.nodes]

    def _place_fresh(self, node, st):
        """Placement hook for a freshly spawned/prolonged node state
        (identity here; ShardedSMR pins replicated-node states to a
        replicated sharding so regrid outputs match the step's specs)."""
        return st

    def _exchange(self, tail, head, d):
        """Return the (low, high) periodic extensions along axis ``d``
        given this block's own boundary slabs: identity locally (the
        periodic image is the block's other end), neighbor slabs under
        sharding."""
        return tail, head

    def _root_fill(self, w, node: "_Node", fluid: str):
        """Pad + fill the root node's ghosts (deck BCs)."""
        return bc_mod.pad_and_fill(w, node.grid, fluid, self.bc_custom)

    def _ic_hydro(self, node: "_Node"):
        """Hydro whose geometry matches GLOBAL-shaped arrays (host-side
        retag/prolongation paths; the sharded tree substitutes the
        global-grid build)."""
        return node.hydro

    def _parent_arr(self, states, node: "_Node", key: str, kind: str):
        """Parent array feeding this node's ghost prolongation.  The
        sharded tree all-gathers it along the decomposition axis for
        replicated (non-wrap) patches."""
        return states[node.parent.index][key][kind]

    def _node_lo(self, node: "_Node", los):
        """Effective (possibly shard-local) patch origin in parent
        interior cells: identity here; the sharded tree offsets
        DISTRIBUTED patches by the shard's slice of the patch."""
        return los[node.index]

    def _post_fine_ghosts(self, wp, node: "_Node", fl: str, states):
        """Hook after parent-prolongated ghost fill: identity here; the
        sharded tree swaps a distributed patch's internal-seam ghosts
        for the neighbor shard's FINE data."""
        return wp

    def _parent_grid(self, node: "_Node"):
        """Parent grid in the frame of ``node.lo`` (GLOBAL for replicated
        patches of a sharded parent)."""
        return node.parent.grid

    def _flux_correct(self, node: "_Node", fx_c, fx_f, lo):
        return node.flux_correct(fx_c, fx_f, lo)

    def _restrict_into(self, node: "_Node", arr, res, lo):
        """Deposit a restricted child array into the parent at ``lo``."""
        starts = [jnp.asarray(v, jnp.int32)
                  for v in [0] * (arr.ndim - 3) + [lo[2], lo[1], lo[0]]]
        return jax.lax.dynamic_update_slice(arr, res, tuple(starts))

    @staticmethod
    def _axis_periodic(node: "_Node", d: int) -> bool:
        """True when axis ``d`` of ``node`` is (transitively) periodic:
        the root boundary is periodic, or the node itself wraps there."""
        if node.parent is None:
            return node.grid.bc[d] == ("periodic", "periodic")
        return bool(node.wrap[d])

    def add_patch(self, level: int, lo, n, parent=None):
        """Register a patch; ``lo``/``n`` are in the INTERIOR cells of its
        containing parent at level-1 (pass ``parent`` explicitly when
        several same-level windows could contain ``lo`` — tile pools)."""
        parents = [parent] if parent is not None else \
            [nd for nd in self.nodes if nd.level == level - 1]
        if not parents:
            raise ValueError(f"no level-{level - 1} parent for a level-{level} patch")
        parent = None
        for cand in parents:
            ok = True
            for d in range(3):
                if cand.grid.nx[d] <= 1:
                    continue
                # a patch spanning the FULL extent of a periodic axis wraps
                # onto itself there (ghosts by periodic exchange, no
                # coarse-fine face) — exempt from the nesting rim
                if (lo[d] == 0 and n[d] == cand.grid.nx[d]
                        and self._axis_periodic(cand, d)):
                    continue
                rim = max(1, -(-cand.grid.ng[d] // 2))
                if lo[d] < rim or lo[d] + n[d] > cand.grid.nx[d] - rim:
                    ok = False
            if ok:
                parent = cand
                break
        if parent is None:
            raise ValueError(
                f"level-{level} patch {lo}+{n} is not nested (with ghost rim) "
                "inside any coarser patch")
        # patches at the same level must be disjoint (ghosts come from the
        # parent only; patch-patch exchange is not implemented).  Disjoint =
        # separated along at least one active axis.
        for sib in parent.children:
            sep = any(parent.grid.nx[d] > 1
                      and (lo[d] >= sib.lo[d] + sib.n[d]
                           or sib.lo[d] >= lo[d] + n[d])
                      for d in range(3))
            if not sep:
                raise ValueError("same-level patches must be disjoint")
        grid = _refine_grid(parent.grid, lo, n)
        return _Node(self, grid, parent, lo, n, level)

    # same-level ghost exchange between sibling patches (Parthenon's
    # same-level boundary buffers): ghost cells of a patch that fall
    # inside an adjacent sibling's interior take the sibling's FINE
    # values instead of parent prolongation — with nghost=2 and PLM the
    # seam stencils then match a single union patch exactly.  ShardedSMR
    # disables (its node frames mix shard-local and global coordinates).
    _sibling_exchange = True

    def _sib_pair_ok(self, a, b) -> bool:
        """May nodes ``a`` and ``b`` exchange sibling ghosts?  ShardedSMR
        narrows this to replicated<->replicated pairs (same global frame
        on every shard)."""
        return True

    def _links_static(self, node: "_Node") -> bool:
        """Is this node's position lattice-static (its ``node.lo`` is the
        compiled truth)?  Always on a non-moving tree; on a moving tree
        only for POOL tiles — spawn/destroy tiles are anchored to the
        regrid lattice and every topology change recompiles
        (regrid_tiles), so the static-slice links stay valid between
        regrids.  Retag-moved patches (move-style, particle tracking)
        carry traced positions and keep prolonged ghosts."""
        return not self.moving_patches or getattr(node, "pool", False)

    def _sibling_links(self):
        """{node.index: [(sib_index, dst_slices, src_slices), ...]}:
        overlap of the node's padded fine box with each same-parent
        sibling's interior, in [z,y,x] slices (dst: node's padded array,
        src: sibling's interior array).  Static patch positions only
        (``_links_static``) — without this exchange, adjacent same-level
        patches would evolve against prolonged-coarse seams and the
        union would not conserve (Parthenon same-level boundary buffers,
        artemis_driver.cpp:255-261)."""
        links = {node.index: [] for node in self.nodes}
        if not self._sibling_exchange:
            return links
        for node in self.nodes:
            if node.parent is None or not self._links_static(node):
                continue
            ng = node.grid.ng
            for sib in node.parent.children:
                if sib is node or not self._links_static(sib) \
                        or not self._sib_pair_ok(node, sib):
                    continue
                dst, src = [], []
                empty = False
                for t in range(2, -1, -1):      # array order z, y, x
                    d = t
                    if not node.active[d]:
                        dst.append(slice(0, 1))
                        src.append(slice(0, 1))
                        continue
                    # level-fine coordinates (2x parent interior cells)
                    n_lo = 2 * node.lo[d] - ng[d]
                    n_hi = 2 * (node.lo[d] + node.n[d]) + ng[d]
                    s_lo = 2 * sib.lo[d]
                    s_hi = s_lo + 2 * sib.n[d]
                    a, b = max(n_lo, s_lo), min(n_hi, s_hi)
                    if a >= b:
                        empty = True
                        break
                    dst.append(slice(a - n_lo, b - n_lo))
                    src.append(slice(a - s_lo, b - s_lo))
                if not empty:
                    links[node.index].append(
                        (sib.index, tuple(dst), tuple(src)))
        return links

    @staticmethod
    def _apply_sib_links(wp, links, arrs):
        """Overwrite ghost regions of padded array ``wp`` with sibling
        fine data (``arrs``: node.index -> interior array)."""
        for (si, dst, src) in links:
            wp = wp.at[(Ellipsis,) + dst].set(
                arrs[si][(Ellipsis,) + src].astype(wp.dtype))
        return wp

    # -- compiled step ----------------------------------------------------
    def _compile_common(self):
        """Attributes every compile path must set (ShardedSMR._compile
        reuses this: _fused stays None there, so _sib_links/_gather6 come
        out empty/None)."""
        self._fused = self._fused_setup()
        self._sib_links = self._sibling_links()
        self._gather6 = self._gather6_setup()

    def _compile(self):
        self._compile_common()
        self._stage_jits = [jax.jit(self._make_stage(s))
                            for s in range(1, self.integ.nstages + 1)] \
            if self.nbody is not None else None
        self._step = jax.jit(self._build_step())
        self._dt = jax.jit(self._estimate_dt)

    # -- fused whole-stage fast path --------------------------------------
    _fused_ok = True   # ShardedSMR disables (kernel + replicated scatters
    #                    under shard_map is a separate composition)

    def _fused_setup(self):
        """Per-node coefficient bundles for the fused whole-stage Pallas
        kernel (`ops/pallas_stage_curv`), or None when any node, source, or
        config falls outside the kernel envelope — the stage then runs the
        jnp path.  Gating mirrors Driver.__init__'s (driver.py): gas-only,
        foldable sources (non-shearing RotatingFrame torque + one central
        point-mass Gravity), diffusion with separable coefficient rows.
        The rim-delta flux recomputation uses the uniform-limiter slab
        path, so the fused AMR stage is additionally gated to Cartesian
        trees (the north-star AMR disk RHD deck; radiation is
        Cartesian-only in the reference, src/artemis.cpp:113-114)."""
        if not self._fused_ok or self.dust_cfg is not None \
                or self.nbody is not None:
            return None
        from .ops import pallas_stage_curv as _psc
        from .sources import RotatingFrame as _RF

        bundles = []
        for node in self.nodes:
            if node.curv or not _psc.supported_curv(node.grid, self.cfg):
                return None
            flux_srcs = [s for s in node.sources
                         if getattr(s, "uses_fluxes", False)]
            if not all(isinstance(s, _RF) and not s.shearing_box
                       for s in flux_srcs):
                return None
            rest = [s for s in node.sources if s not in flux_srcs]
            gspec = None
            for s in list(rest):
                spec = curv_point_grav(node.grid, s)
                if spec is not None:
                    gspec = spec
                    rest.remove(s)
                    break
            if rest:
                return None
            try:
                co = _psc.CurvCoeffs(node.grid, self.omf, dtype=np.float32,
                                     diff=node.diffusion)
            except ValueError:
                return None
            bundles.append((co, co.pack(),
                            flux_srcs[0].omega if flux_srcs else 0.0, gspec,
                            _psc._uniform_dxs(node.grid, co)))
        return bundles

    # patches may move at runtime (adaptive retagging): gather6's static
    # lo-margin guarantee would not survive a move, so moving trees keep
    # the padded ghost-fill path.  Set by SMRDriver before _compile.
    moving_patches = False

    # a curvilinear patch move rebuilds that node's geometry, invalidating
    # the compiled step; retag passes batch ONE recompile after all moves
    _needs_recompile = False

    def _maybe_recompile(self):
        if self._needs_recompile:
            self._needs_recompile = False
            self._compile()

    def _gather6_setup(self):
        """Tree-level six-face-strip gather eligibility: when every node
        fits the gather6 kernel envelope, the whole fused stage runs
        without padded arrays (static ic strips on the root, per-stage
        prolonged-slab strips on the patches, rim-delta windows from the
        unpadded interiors).  Returns {'root_strips': ...} or None
        (padded fallback).  ARTEMIS_AMR_GATHER=0 disables."""
        import os

        if self._fused is None \
                or os.environ.get("ARTEMIS_AMR_GATHER", "1") == "0" \
                or self.moving_patches or not self.root.children:
            return None
        # adjacent siblings are fine: ghost_strips folds the sibling
        # fine-ghost links into the prolonged slabs (_fold_sib_into_slab),
        # so tile pools ride the fast path with seam conservation intact
        from .ops import pallas_stage_curv as _psc

        root = self.root
        if not _psc.gather6_supported(root.grid):
            return None
        for d in range(3):
            if root.grid.bc[d] != ("ic", "ic"):
                return None
        ic = (self.bc_custom or {}).get("ic")
        caches = getattr(ic, "shard_caches", None)
        if not caches:
            return None
        if not all((d, s) in caches[0] for d in (1, 2, 3) for s in (0, 1)):
            return None
        for node in self.nodes[1:]:
            if any(node.wrap) or not all(node.active):
                return None
            if not _psc.gather6_supported(node.grid):
                return None
            pnx = node.parent.grid.nx
            for d in range(3):
                # two interior parent rows outside every C-F face: the
                # rim-delta windows never touch the parent's ghosts
                if node.lo[d] < 2 or node.lo[d] + node.n[d] > pnx[d] - 2:
                    return None
        import jax as _jax

        strips = _psc.prepare_gather6_root_strips(root.grid, caches[0])
        return {"root_strips": {
            k: _jax.device_put(np.asarray(v, dtype=np.float32))
            for k, v in strips.items()}}

    def _apply_rim_delta(self, u_p, node, los, wp_par, wp_fine, bdt,
                         force_pcm):
        """Conservation fix-up on the parent's fused update: at every
        coarse-fine interface plane, replace the parent's own flux with the
        pooled fine flux by adding the delta through the divergence term
        (the pre-update flux replacement of _Node.flux_correct, recast as
        a post-update correction of the two adjacent coarse cell rows)."""
        cfg = self.cfg
        hc = self._ic_hydro(node.parent)
        pgrid = node.parent.grid
        lo = los[node.index]
        active = node.active
        dt = u_p.dtype
        for d in hc.dims:
            if node.wrap[d - 1]:
                continue            # full-span periodic axis: no C-F faces
            for side in (0, 1):
                fi_c = lo[d - 1] + side * node.n[d - 1]
                fi_f = side * 2 * node.n[d - 1]
                Fc = _slab_face_flux(wp_par, pgrid, d, fi_c, lo, node.n,
                                     cfg, force_pcm)
                Ff = _slab_face_flux(wp_fine, node.grid, d, fi_f,
                                     (0, 0, 0), node.grid.nx, cfg, force_pcm)
                dF = (_restrict_face_mean(Ff, d, active) - Fc).astype(dt)
                u_p = self._rim_apply(u_p, hc, node, lo, d, side, fi_c, dF,
                                      bdt)
        return u_p

    def _apply_rim_delta_g6(self, u_p, node, los, w_par, w_fine, slabs,
                            bdt, force_pcm, base=None):
        """_apply_rim_delta without padded arrays (gather6 mode): the
        parent-side 4-row window is sliced from the parent's unpadded
        interior (the gather6 gate guarantees two interior rows outside
        every coarse-fine face), the fine-side window is the patch's edge
        rows extended by its prolonged ghost slab — both windows carry
        exactly the values the padded arrays held, so the deltas are
        bit-identical.

        The recon+Riemann chains run on CANONICALIZED windows — flux
        axis moved to position -3 (the 4 rows land on the cheap major
        axis; the transverse plane keeps the (sublane, lane) tiling) with
        the normal velocity permuted into component 1 — and every window
        of equal canonical shape is stacked into ONE batched chain.  On a
        3-D child that is 4 launches of well-shaped work instead of 12
        thin-window chains (the dominant rim-delta cost was the fixed
        overhead of ~hundreds of tiny ops, not the flux arithmetic)."""
        cfg = self.cfg
        hc = self._ic_hydro(node.parent)
        lo = los[node.index]
        active = node.active
        dtp = u_p.dtype
        nd = w_par.ndim

        wins = []              # (d, side, fi_c, canonical window)
        for d in hc.dims:
            ax_ = nd - d
            for side in (0, 1):
                fi_c = lo[d - 1] + side * node.n[d - 1]
                starts = [0] * (nd - 3)
                sizes = list(w_par.shape[:-3])
                for i in range(3):
                    dd = 3 - i
                    if dd == d:
                        starts.append(fi_c - 2)
                        sizes.append(4)
                    elif active[dd - 1]:
                        starts.append(lo[dd - 1])
                        sizes.append(node.n[dd - 1])
                    else:
                        starts.append(0)
                        sizes.append(1)
                win_c = jax.lax.dynamic_slice(
                    w_par, tuple(jnp.asarray(s, jnp.int32) for s in starts),
                    tuple(sizes))
                sint = slabs[(d, side)]
                for c in (1, 2, 3):
                    if c == d:
                        continue
                    gax = nd - c
                    sint = jax.lax.slice_in_dim(
                        sint, node.grid.ng[c - 1],
                        node.grid.ng[c - 1] + node.grid.nx[c - 1], axis=gax)
                nfx = node.grid.nx[d - 1]
                if side == 0:
                    edge = jax.lax.slice_in_dim(w_fine, 0, 2, axis=ax_)
                    win_f = jnp.concatenate([sint.astype(w_fine.dtype),
                                             edge], axis=ax_)
                else:
                    edge = jax.lax.slice_in_dim(w_fine, nfx - 2, nfx,
                                                axis=ax_)
                    win_f = jnp.concatenate([edge,
                                             sint.astype(w_fine.dtype)],
                                            axis=ax_)
                wins.append((d, side, fi_c, win_c, win_f))

        import os
        if os.environ.get("ARTEMIS_RIM", "batched") == "batched":
            # batch equal canonical shapes into one recon+Riemann chain
            canon = []
            for (d, side, fi_c, win_c, win_f) in wins:
                canon.append((d, side, fi_c, _rim_canon(win_c, d, nd)))
                canon.append((d, side, fi_c, _rim_canon(win_f, d, nd)))
            fluxes = _rim_batched_flux(canon, cfg, force_pcm, nd)
        else:
            fluxes = []
            for (d, side, fi_c, win_c, win_f) in wins:
                fluxes.append(_window_face_flux(win_c, d, cfg, force_pcm))
                fluxes.append(_window_face_flux(win_f, d, cfg, force_pcm))
        wins = [w[:3] + (None,) for w in wins for _ in (0, 1)]

        for k in range(0, len(wins), 2):
            d, side, fi_c, _ = wins[k]
            Fc = fluxes[k]
            Ff = fluxes[k + 1]
            dF = (_restrict_face_mean(Ff, d, active) - Fc).astype(dtp)
            u_p = self._rim_apply(u_p, hc, node, lo, d, side, fi_c, dF,
                                  bdt, base=base)
        return u_p

    def _rim_apply(self, u_p, hc, node, lo, d, side, fi_c, dF, bdt,
                   base=None):
        """Land a pooled fine-minus-coarse face-flux delta on the two
        coarse cell rows adjacent to face (d, side) of ``node``.

        ``base``: [z, y, x] start of a parent sub-block when ``u_p`` is
        the child's sliced bounding block instead of the full parent
        (the block-framed glue path) — the update region is rebased
        while the A/V geometry rows keep their global coordinates."""
        active = node.active
        dt = u_p.dtype
        # bdt * A_face / V of the two adjacent coarse cells
        fstarts, fsizes = [], []
        cstarts, csizes = [], []
        for i in range(3):
            dd = 3 - i
            if dd == d:
                fstarts.append(fi_c)
                fsizes.append(1)
                cstarts.append(fi_c - 1)
                csizes.append(2)
            elif active[dd - 1]:
                fstarts.append(lo[dd - 1])
                fsizes.append(node.n[dd - 1])
                cstarts.append(lo[dd - 1])
                csizes.append(node.n[dd - 1])
            else:
                fstarts.append(0)
                fsizes.append(1)
                cstarts.append(0)
                csizes.append(1)
        Aface = jax.lax.dynamic_slice(
            jnp.asarray(hc.area[d]),
            tuple(jnp.asarray(s, jnp.int32) for s in fstarts),
            tuple(fsizes))
        Vcells = jax.lax.dynamic_slice(
            jnp.asarray(hc.vol),
            tuple(jnp.asarray(s, jnp.int32) for s in cstarts),
            tuple(csizes))
        scale = (bdt * Aface / Vcells).astype(dt)
        # cell fi_c-1 sees the plane as its UPPER face (-A F dt/V),
        # cell fi_c as its LOWER face (+A F dt/V); covered cells are
        # overwritten by the subsequent restriction
        du = jnp.concatenate([-dF, dF], axis=-d) * scale
        if base is not None:
            cstarts = [c - b for c, b in zip(cstarts, base)]
        ustarts = [0] * (u_p.ndim - 3) + cstarts
        ustarts = tuple(jnp.asarray(s, jnp.int32) for s in ustarts)
        usizes = tuple(u_p.shape[:-3]) + tuple(csizes)
        region = jax.lax.dynamic_slice(u_p, ustarts, usizes)
        return jax.lax.dynamic_update_slice(u_p, region + du, ustarts)

    def _stage_fused(self, states, u1s, dt, time, stage, los, particles):
        """One RK stage on the fused whole-stage kernel: every node's gas
        stage (fluxes + update + folded sources + dual energy + C2P/P2C)
        is one Pallas VMEM pass; coarse-fine conservation lands as rim
        deltas + restriction on the parents afterwards."""
        from .ops import pallas_stage_curv as _psc

        integ = self.integ
        gam0 = integ.gam0[stage - 1]
        gam1 = integ.gam1[stage - 1]
        # under x64 (tests) traced dt/time are f64; the kernel states are
        # f32 — cast the scalars or every product promotes
        dt = jnp.asarray(dt, jnp.float32)
        time = jnp.asarray(time, jnp.float32)
        bdt = integ.beta[stage - 1] * dt
        force_pcm = (integ.name == "vl2") and stage == 1

        # 1. ghost data (parents before children: prolongation reads the
        # parent's stage-entry prims).  gather6 mode builds O(surface)
        # strip arrays; padded mode builds the full padded prims.
        g6 = self._gather6
        wpads = [None] * len(self.nodes)
        strips = [None] * len(self.nodes)
        slabs = [None] * len(self.nodes)
        for node in self.nodes:
            i = node.index
            w = states[i]["gas"]["w"]
            if g6 is not None:
                if node.parent is None:
                    strips[i] = g6["root_strips"]
                else:
                    strips[i], slabs[i] = node.ghost_strips(
                        self._parent_arr(states, node, "gas", "w"), los[i],
                        sib_links=self._sib_links[i],
                        sib_arrs=[st["gas"]["w"] for st in states])
            elif node.parent is None:
                wpads[i] = self._root_fill(w, node, "gas")
            else:
                wp = node.fill_fine_ghosts(
                    w, self._parent_arr(states, node, "gas", "w"), los[i])
                wpads[i] = self._apply_sib_links(
                    wp, self._sib_links[i],
                    [st["gas"]["w"] for st in states])

        # 2. fused stage — ONE node-batched launch when every node shares
        # the grid shape and lean-Cartesian envelope (the kernel family
        # runs far faster per zone at larger launch sizes), else per node
        if g6 is not None and _psc.gather6_batch_ok(self.nodes,
                                                    self._fused):
            co0, packed0, rf0, gspec0, _dxs0 = self._fused[0]
            grav = None
            grav_dt = 0.0
            if gspec0 is not None:
                gm_, soft2_, gmode, gpos, tstart, tstop = gspec0
                grav = (gm_, soft2_, gmode, gpos)
                tstart = float(np.clip(tstart, -1e38, 1e38))
                tstop = float(np.clip(tstop, -1e38, 1e38))
                grav_dt = jnp.where(
                    jnp.logical_and(time >= tstart, time < tstop), bdt, 0.0)
            kdt = states[0]["gas"]["w"].dtype
            u_all, w_all, _ = _psc.stage_curv_gather6_batched(
                [states[nd.index]["gas"]["w"] for nd in self.nodes],
                [states[nd.index]["gas"]["u"].astype(kdt)
                 for nd in self.nodes],
                [u1s[nd.index]["gas"].astype(kdt) for nd in self.nodes],
                self.root.grid, self.cfg, gam0, gam1, bdt, force_pcm,
                [b[0] for b in self._fused], [b[1] for b in self._fused],
                strips, rf_omega=rf0, grav=grav, grav_dt=grav_dt,
                dxs_list=[b[4] for b in self._fused])
            new_states = []
            for node in self.nodes:
                st = {"gas": {"u": u_all[node.index][None],
                              "w": w_all[node.index][None]}}
                if "rad" in states[node.index]:
                    st["rad"] = states[node.index]["rad"]
                new_states.append(st)
            return self._stage_fused_glue(states, new_states, los,
                                          wpads, slabs, bdt, force_pcm, g6,
                                          final=stage == integ.nstages)

        new_states = []
        for node, (co, packed, rf_omega, gspec, _dxs) in zip(self.nodes,
                                                             self._fused):
            i = node.index
            grav = None
            grav_dt = 0.0
            if gspec is not None:
                gm_, soft2_, gmode, gpos, tstart, tstop = gspec
                grav = (gm_, soft2_, gmode, gpos)
                tstart = float(np.clip(tstart, -1e38, 1e38))
                tstop = float(np.clip(tstop, -1e38, 1e38))
                grav_dt = jnp.where(
                    jnp.logical_and(time >= tstart, time < tstop), bdt, 0.0)
            # under x64, initialize/P2C promote u to f64 (f64 geometry
            # constants) while w stays f32 — the kernel runs in the prim
            # dtype
            kdt = states[i]["gas"]["w"].dtype
            if g6 is not None:
                u, w, _ = _psc.stage_curv_gather6(
                    states[i]["gas"]["w"], states[i]["gas"]["u"].astype(kdt),
                    u1s[i]["gas"].astype(kdt), node.grid,
                    self.cfg, gam0, gam1, bdt, force_pcm, co, packed,
                    strips[i], rf_omega=rf_omega, grav=grav,
                    grav_dt=grav_dt)
            else:
                u, w, _ = _psc.stage_curv(
                    wpads[i], states[i]["gas"]["u"].astype(kdt),
                    u1s[i]["gas"].astype(kdt), node.grid,
                    self.cfg, gam0, gam1, bdt, force_pcm, co, packed,
                    full=True, rf_omega=rf_omega, grav=grav,
                    grav_dt=grav_dt)
            st = {"gas": {"u": u, "w": w}}
            if "rad" in states[i]:
                st["rad"] = states[i]["rad"]
            new_states.append(st)
        return self._stage_fused_glue(states, new_states, los, wpads,
                                      slabs, bdt, force_pcm, g6,
                                      final=stage == integ.nstages)

    def _restrict_band_into(self, child, u_p, u_f, lo):
        """Intermediate-RK-stage restriction: deposit only the parent
        band ``ng`` deep inside each coarse-fine face.  Uncovered parent
        stencils reach at most ``ng`` cells into the covered region (the
        ghost depth bounds every kernel stencil), and the fine level's
        next-stage prolongation slabs read at most ``rim <= ng`` covered
        rows — so band restriction reproduces the full per-stage
        restriction BIT-EXACTLY everywhere that feeds the next stage,
        while reading O(surface) instead of O(volume) fine data and
        skipping the parent-sized scatter.  The step's final stage still
        restricts the full footprint (outputs/dt/restart read it)."""
        pg = child.parent.grid
        nd3 = u_f.ndim
        for d in range(3):
            if not child.active[d] or child.wrap[d]:
                continue
            depth = min(pg.ng[d], child.n[d])
            ax = nd3 - 1 - d
            for side in (0, 1):
                if side == 0:
                    fsl = slice(0, 2 * depth)
                    p_start = lo[d]
                else:
                    fsl = slice(2 * (child.n[d] - depth), 2 * child.n[d])
                    p_start = lo[d] + child.n[d] - depth
                sl = [slice(None)] * nd3
                sl[ax] = fsl
                sub = u_f[tuple(sl)]
                volf = child.volf
                if volf is not None:
                    vsl = [slice(None)] * 3
                    vsl[2 - d] = fsl
                    volf = volf[tuple(vsl)]
                res = restrict_average(sub, child.active,
                                       volf=volf).astype(u_p.dtype)
                starts = [jnp.asarray(0, jnp.int32)] * (u_p.ndim - 3)
                for t in range(3):
                    dd = 2 - t
                    v = p_start if dd == d else (lo[dd] if child.active[dd]
                                                 else 0)
                    starts.append(jnp.asarray(v, jnp.int32))
                u_p = jax.lax.dynamic_update_slice(u_p, res, tuple(starts))
        return u_p

    def _stage_fused_glue(self, states, new_states, los, wpads, slabs,
                          bdt, force_pcm, g6, final=True):
        # 3. interface deltas + restriction, deepest parents first (a middle
        # node's u is final before it restricts into ITS parent).  The
        # dual-energy switch re-runs after the rim deltas and before the
        # restriction — the jnp stage's ordering (flux-correct -> update ->
        # set_auxiliary -> restrict).  Only the cells the fix-ups touch are
        # reprocessed: the kernel already switched/synced its interior, so
        # every post-kernel pass runs on the child's bounding block
        # [lo-1, lo+n+1) (rim rows + footprint) instead of the full parent
        # — on the north-star deck the footprint is 1/8 of the parent, and
        # the three former full-grid elementwise passes (set_auxiliary,
        # C2P, P2C) dominated the parent's non-kernel HBM traffic.
        parents = [nd for nd in reversed(self.nodes) if nd.children]
        # block-framed fast path: the root's glue runs per-child on the
        # sliced bounding block (one write-back) instead of chained
        # full-parent updates; restricted to the ROOT so the resync
        # timing of deeper parents (restricted into THEIR parents before
        # the #4 resync below) is unchanged
        blocked = set()

        def block_ok(pnode):
            return (g6 is not None and self._shard_axis is None
                    and pnode.parent is None
                    and all(self._links_static(ch)
                            for ch in pnode.children)
                    and self._blocks_disjoint(pnode, los))

        for pnode in parents:
            if block_ok(pnode):
                # runs at this parent's position in the deepest-first
                # order, so it reads its children's post-glue state
                self._glue_parent_block(pnode, states, new_states, los,
                                        slabs, bdt, force_pcm, final)
                blocked.add(pnode.index)
                continue
            p = pnode.index
            u_p = new_states[p]["gas"]["u"]
            for child in pnode.children:
                ci = child.index
                if g6 is not None:
                    u_p = self._apply_rim_delta_g6(
                        u_p, child, los, states[p]["gas"]["w"],
                        states[ci]["gas"]["w"], slabs[ci], bdt, force_pcm)
                else:
                    u_p = self._apply_rim_delta(u_p, child, los, wpads[p],
                                                wpads[ci], bdt, force_pcm)
            for child in pnode.children:
                u_p = self._block_set_auxiliary(u_p, child, los)
            band = not final and self._shard_axis is None
            for child in pnode.children:
                if band:
                    u_p = self._restrict_band_into(
                        child, u_p, new_states[child.index]["gas"]["u"],
                        los[child.index])
                else:
                    u_p = self._restrict_into(
                        child, u_p,
                        restrict_average(new_states[child.index]["gas"]["u"],
                                         child.active,
                                         volf=child.volf).astype(u_p.dtype),
                        los[child.index])
            new_states[p]["gas"]["u"] = u_p

        # 4. re-sync prims on the parent blocks the rim deltas /
        # restriction touched (everywhere else u and w keep the kernel's
        # in-pass C2P/P2C output).  No set_auxiliary here: the dual-energy
        # switch already ran BEFORE restriction (the jnp stage's ordering);
        # re-switching the restricted averages would diverge from it in
        # covered cells.
        for node in self.nodes:
            if not node.children or node.index in blocked:
                continue
            i = node.index
            kdt = new_states[i]["gas"]["w"].dtype
            u_full = new_states[i]["gas"]["u"].astype(kdt)
            w_full = new_states[i]["gas"]["w"]
            for child in node.children:
                u_full, w_full = self._block_resync(u_full, w_full, child,
                                                    los)
            new_states[i]["gas"] = {"u": u_full, "w": w_full}
        return new_states, None

    @staticmethod
    def _child_block(child, los):
        """[z,y,x] starts/sizes of the parent bounding block a child's
        post-kernel fix-ups touch: footprint plus the one rim row outside
        each coarse-fine face (wrap axes have no C-F faces and cover the
        full parent axis already)."""
        lo = los[child.index]
        pnx = child.parent.grid.nx
        starts, sizes = [], []
        for t in range(3):          # [z, y, x]
            d = 2 - t
            if not child.active[d]:
                starts.append(jnp.asarray(0, jnp.int32))
                sizes.append(1)
            elif child.wrap[d]:
                starts.append(jnp.asarray(0, jnp.int32))
                sizes.append(pnx[d])
            else:
                starts.append(jnp.asarray(lo[d], jnp.int32) - 1)
                sizes.append(child.n[d] + 2)
        return starts, sizes

    def _blocks_disjoint(self, pnode, los):
        """True when the children's bounding blocks (footprint + 1 rim
        row) are pairwise disjoint — the block-framed glue then composes
        per child exactly as the phase-ordered path does (ops on
        disjoint regions commute)."""
        bs = []
        for ch in pnode.children:
            lo = los[ch.index]
            ivs = []
            for d in range(3):
                if not ch.active[d]:
                    ivs.append((0, 1))
                elif ch.wrap[d]:
                    ivs.append((0, pnode.grid.nx[d]))
                else:
                    ivs.append((int(lo[d]) - 1, int(lo[d]) + ch.n[d] + 1))
            bs.append(ivs)
        for a in range(len(bs)):
            for b in range(a + 1, len(bs)):
                if all(bs[a][d][0] < bs[b][d][1]
                       and bs[b][d][0] < bs[a][d][1] for d in range(3)):
                    return False
        return True

    def _glue_parent_block(self, pnode, states, new_states, los, slabs,
                           bdt, force_pcm, final):
        """Block-framed glue: rim deltas + dual-energy switch +
        restriction + C2P/P2C resync for every child of ``pnode`` run on
        ONE dynamic-sliced child bounding block each, written back to
        the parent once (u and w).  The phase-ordered path interleaves
        ~10 slice+update chains on the full parent per stage; on TPU
        each read-modify-write chain materializes a parent-sized copy
        (XLA cannot alias a buffer that the updating fusion also
        slices), which measured ~5 ms/cycle of pure copy traffic at
        256x256x64 — the dominant AMR-glue cost.  Values are
        bit-identical to the phase path (same op order per child;
        blocks are pairwise disjoint, _blocks_disjoint).

        Updates new_states[pnode.index]["gas"] in place (dict entry)."""
        cfg = self.cfg
        p = pnode.index
        u_p = new_states[p]["gas"]["u"]
        w_p = new_states[p]["gas"]["w"]
        kdt = w_p.dtype
        band = not final and self._shard_axis is None
        for child in pnode.children:
            ci = child.index
            lo = los[ci]
            base = []                     # [z, y, x] block start
            for t in range(3):
                d = 2 - t
                if not child.active[d] or child.wrap[d]:
                    base.append(0)
                else:
                    base.append(int(lo[d]) - 1)
            _, z3 = self._child_block(child, los)
            lo_reb = np.asarray(
                [int(lo[d]) - base[2 - d] if child.active[d] else 0
                 for d in range(3)], np.int32)
            ustarts = tuple(jnp.asarray(0, jnp.int32)
                            for _ in range(u_p.ndim - 3)) + \
                tuple(jnp.asarray(b, jnp.int32) for b in base)
            usizes = tuple(u_p.shape[:-3]) + tuple(z3)
            B = jax.lax.dynamic_slice(u_p, ustarts, usizes)
            # 1. rim deltas (A/V geometry stays global via base=)
            B = self._apply_rim_delta_g6(
                B, child, los, states[p]["gas"]["w"],
                states[ci]["gas"]["w"], slabs[ci], bdt, force_pcm,
                base=base)
            # 2. dual-energy switch on the whole block
            B = self._aux_switch_math(B)
            # 3. restriction (band on intermediate stages, full on final)
            if band:
                B = self._restrict_band_into(
                    child, B, new_states[ci]["gas"]["u"], lo_reb)
            else:
                res = restrict_average(new_states[ci]["gas"]["u"],
                                       child.active,
                                       volf=child.volf).astype(B.dtype)
                B = self._restrict_into(child, B, res, lo_reb)
            # 4. C2P + P2C floor resync on the whole block
            ub2, wb2 = self._resync_math(B.astype(kdt), kdt)
            u_p = jax.lax.dynamic_update_slice(u_p.astype(kdt), ub2,
                                               ustarts)
            w_p = jax.lax.dynamic_update_slice(w_p, wb2, ustarts)
        new_states[p]["gas"] = {"u": u_p, "w": w_p}

    def _aux_switch_math(self, ub):
        """Dual-energy switch (hydro.set_auxiliary with Cartesian
        hx == 1, the fused path's gating) on an already-sliced block —
        the single source for both the phase-ordered and block-framed
        glue paths."""
        cfg = self.cfg
        rho = jnp.maximum(ub[:, 0], cfg.dfloor)
        ke = 0.5 * (ub[:, 1] ** 2 + ub[:, 2] ** 2 + ub[:, 3] ** 2) / rho
        e_tot = ub[:, 4]
        ue = e_tot - ke
        sie = jnp.where(ue > cfg.de_switch * e_tot, ue / rho, ub[:, 5] / rho)
        sie = jnp.maximum(sie, cfg.siefloor)
        return ub.at[:, 5].set(jnp.maximum(sie * rho, cfg.siefloor * rho)
                               .astype(ub.dtype))

    def _resync_math(self, ub, kdt):
        """C2P + P2C floor re-sync (Cartesian hx == 1) on an
        already-sliced block: returns (u_block, w_block) in ``kdt`` —
        the single source for both glue paths."""
        cfg = self.cfg
        rho = jnp.maximum(ub[:, 0], cfg.dfloor)
        v1 = ub[:, 1] / rho
        v2 = ub[:, 2] / rho
        v3 = ub[:, 3] / rho
        sie = jnp.maximum(ub[:, 5] / rho, cfg.siefloor)
        p = (cfg.gamma - 1.0) * rho * sie
        eint = sie * rho
        etot = eint + 0.5 * rho * (v1 * v1 + v2 * v2 + v3 * v3)
        ub2 = jnp.stack([rho, rho * v1, rho * v2, rho * v3, etot, eint],
                        axis=1).astype(kdt)
        wb2 = jnp.stack([rho, v1, v2, v3, p, sie], axis=1).astype(kdt)
        return ub2, wb2

    def _block_set_auxiliary(self, u_p, child, los):
        """Dual-energy switch on the child's bounding block only."""
        s3, z3 = self._child_block(child, los)
        starts = tuple(jnp.asarray(0, jnp.int32)
                       for _ in range(u_p.ndim - 3)) + tuple(s3)
        sizes = tuple(u_p.shape[:-3]) + tuple(z3)
        ub = jax.lax.dynamic_slice(u_p, starts, sizes)
        ub = self._aux_switch_math(ub)
        return jax.lax.dynamic_update_slice(u_p, ub, starts)

    def _block_resync(self, u_full, w_full, child, los):
        """C2P + P2C floor re-sync on the child's bounding block;
        bit-identical to hydro.cons_to_prim/prim_to_cons restricted to
        the block."""
        kdt = w_full.dtype
        s3, z3 = self._child_block(child, los)
        starts = tuple(jnp.asarray(0, jnp.int32)
                       for _ in range(u_full.ndim - 3)) + tuple(s3)
        sizes = tuple(u_full.shape[:-3]) + tuple(z3)
        ub = jax.lax.dynamic_slice(u_full, starts, sizes)
        ub2, wb2 = self._resync_math(ub, kdt)
        return (jax.lax.dynamic_update_slice(u_full, ub2, starts),
                jax.lax.dynamic_update_slice(w_full, wb2, starts))

    def _make_stage(self, stage):
        def fn(states, u1s, dt, time, los, particles):
            return self._stage(states, u1s, dt, time, stage, los, particles)

        return fn

    def _cover_mask(self, node: _Node, los):
        """Interior [z,y,x] mask: 0 under this node's children, 1 elsewhere
        (per-level force reductions must not double-count covered cells)."""
        if not node.children:
            return None
        mask = jnp.ones(tuple(reversed(node.grid.nx)))
        for ch in node.children:
            lo = los[ch.index]
            zeros = jnp.zeros(tuple(ch.n[2 - i] if node.grid.nx[2 - i] > 1
                                    else 1 for i in range(3)))
            starts = tuple(jnp.asarray(lo[2 - i] if node.grid.nx[2 - i] > 1
                                       else 0, jnp.int32) for i in range(3))
            mask = jax.lax.dynamic_update_slice(mask, zeros, starts)
        return mask

    def _stage(self, states, u1s, dt, time, stage, los, particles):
        if self._fused is not None \
                and states[0]["gas"]["w"].dtype == jnp.float32:
            return self._stage_fused(states, u1s, dt, time, stage, los,
                                     particles)
        integ = self.integ
        gam0 = integ.gam0[stage - 1]
        gam1 = integ.gam1[stage - 1]
        bdt = integ.beta[stage - 1] * dt
        force_pcm = (integ.name == "vl2") and stage == 1

        # 1. ghost fill (parents before children: prolongation reads the
        # parent's stage-entry prims)
        wpads = []
        for node in self.nodes:
            wp = {}
            for fl, _ in node.fluids():
                w = states[node.index][fl]["w"]
                if node.parent is None:
                    wp[fl] = self._root_fill(w, node, fl)
                else:
                    wp[fl] = self._post_fine_ghosts(
                        self._apply_sib_links(
                            node.fill_fine_ghosts(
                                w, self._parent_arr(states, node, fl, "w"),
                                self._node_lo(node, los)),
                            self._sib_links[node.index],
                            [st[fl]["w"] for st in states]),
                        node, fl, states)
            wpads.append(wp)

        # 2. fluxes per node per fluid
        fxs = []
        for node in self.nodes:
            fx = {}
            for fl, cfg in node.fluids():
                fx[fl] = node.hydro.compute_fluxes(wpads[node.index][fl],
                                                   cfg, force_pcm)
            fxs.append(fx)

        # 3. flux correction, deepest level first
        for node in reversed(self.nodes):
            if node.parent is None:
                continue
            p = node.parent.index
            for fl, _ in node.fluids():
                fxs[p][fl] = self._flux_correct(node, fxs[p][fl],
                                                fxs[node.index][fl],
                                                self._node_lo(node, los))

        # 4. update + diffusion + sources per node
        new_states = []
        pforce = None
        for node in self.nodes:
            i = node.index
            st = {}
            for fl, cfg in node.fluids():
                u = node.hydro.apply_update(states[i][fl]["u"], u1s[i][fl],
                                            fxs[i][fl], gam0, gam1, bdt)
                u = node.hydro.flux_source(u, states[i][fl]["w"], fxs[i][fl],
                                           bdt, omf=self.omf)
                if fl == "gas" and node.diffusion is not None:
                    dfx = node.diffusion.fluxes(wpads[i]["gas"])
                    u = node.diffusion.update(u, states[i][fl]["w"], dfx, bdt)
                st[fl] = {"u": u, "w": states[i][fl]["w"]}
            if "rad" in states[i]:
                st["rad"] = states[i]["rad"]
            ctx = {"particles": particles, "mask": self._cover_mask(node, los)}
            for src in node.sources:
                if getattr(src, "needs_ctx", False):
                    st = src.apply(st, fxs[i], time, bdt, node.hydro, ctx=ctx)
                else:
                    st = src.apply(st, fxs[i], time, bdt, node.hydro)
            if "pforce" in ctx:
                pforce = ctx["pforce"] if pforce is None else pforce + ctx["pforce"]
            if node.hydro.gas is not None:
                st["gas"]["u"] = node.hydro.set_auxiliary(st["gas"]["u"], self.cfg)
            new_states.append(st)

        # 5. restriction, deepest level first
        for node in reversed(self.nodes):
            if node.parent is None:
                continue
            p = node.parent.index
            lo = self._node_lo(node, los)
            for fl, _ in node.fluids():
                new_states[p][fl]["u"] = self._restrict_into(
                    node, new_states[p][fl]["u"],
                    restrict_average(new_states[node.index][fl]["u"],
                                     node.active, volf=node.volf), lo)

        # 6. prims re-sync per node
        out = []
        for node in self.nodes:
            st = {}
            for fl, cfg in node.fluids():
                w = node.hydro.cons_to_prim(new_states[node.index][fl]["u"], cfg)
                u, w = node.hydro.prim_to_cons(w, cfg)
                st[fl] = {"u": u, "w": w}
            if "rad" in new_states[node.index]:
                st["rad"] = new_states[node.index]["rad"]
            out.append(st)
        return out, pforce

    def _radiation_pass(self, states, dt, los):
        """Operator-split radiation after the unsplit stages
        (artemis_driver.cpp:111): parents solve first; patches couple to
        them through prolonged Dirichlet ghost planes of Er, then the
        fine fields restrict back (the jaybenne photons-cross-levels
        analogue)."""
        import os as _os

        states = list(states)
        # sibling Er snapshots from BEFORE any solve: same-level ghost
        # exchange stays symmetric (parents deliberately couple
        # post-solve; siblings couple pre-solve, Jacobi-style)
        sib_Er = [s.get("rad", {}).get("Er") for s in states]

        def build_gh(node):
            st = dict(states[node.index])
            Erp = self._parent_arr(states, node, "rad", "Er")
            lo_n = self._node_lo(node, los)
            if self._shard_axis is None and not any(node.wrap):
                # O(surface) Dirichlet planes straight from the
                # per-face prolonged slabs — the former full padded
                # Er build (an O(volume), lane-misaligned array made
                # only to read 6 planes back out) dominated the
                # radiation pass cost at production shape
                return self._rad_ghost_planes(node, Erp, lo_n, sib_Er)
            # sharded patches (seam exchange) and wrap-axis patches
            # (the slab windows expect a wrap-padded parent) keep the
            # padded route
            return self._rad_ghost_planes_padded(node, st, Erp, lo_n,
                                                 states, sib_Er)

        def solve_one(node, gh):
            i = node.index
            st = dict(states[i])
            st = (node.radiation.step(st, dt) if gh is None
                  else node.radiation.step(st, dt, ghosts=gh))
            states[i] = node.radiation.sync_gas(st)

        # batched fine solves: same-shape unsharded Cartesian patches at
        # one level stack on a vmapped leading axis and solve as ONE
        # union system (block-diagonal operator; the CG inner products
        # run per element under vmap's while_loop masking, so each
        # tile's solve stops at its own tolerance exactly as the
        # sequential path does).  A 9-tile pool's radiation pass was ~9x
        # a single fixed-overhead solve (tools/prof_tiled.py) — batching
        # collapses it to one setup + matvec stream over the stacked
        # zones.  ARTEMIS_BATCH_RAD=0 restores the sequential loop.
        from .ops import pallas_fld as _pf

        batch_ok = (_os.environ.get("ARTEMIS_BATCH_RAD", "1") != "0"
                    and self._shard_axis is None and not _pf.enabled())

        for lev in sorted({n.level for n in self.nodes}):
            groups = {}
            for node in [n for n in self.nodes if n.level == lev]:
                gh = None if node.parent is None else build_gh(node)
                if (gh is None or not batch_ok or node.curv
                        or any(node.wrap)):
                    solve_one(node, gh)
                    continue
                key = (tuple(node.grid.nx),
                       jax.tree_util.tree_structure(states[node.index]),
                       tuple((d, tuple(gh[d][0].shape),
                              tuple(gh[d][1].shape))
                             for d in sorted(gh)))
                groups.setdefault(key, []).append((node, gh))
            for members in groups.values():
                if len(members) == 1:
                    solve_one(*members[0])
                    continue
                rad0 = members[0][0].radiation
                sts = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs),
                    *[states[n.index] for n, _ in members])
                ghs = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs),
                    *[g for _, g in members])
                out = jax.vmap(
                    lambda s, g: rad0.step(s, dt, ghosts=g))(sts, ghs)
                for j, (node, _) in enumerate(members):
                    st = jax.tree_util.tree_map(lambda a: a[j], out)
                    states[node.index] = node.radiation.sync_gas(st)
        # restrict Er + exchanged gas energy back onto the parents.  The
        # stage's final glue already deposited the FULL fine state; the
        # radiation split only changes the gas energy components, so the
        # gas re-restriction reads/writes u[4:6] alone (1/3 the traffic)
        for node in reversed(self.nodes):
            if node.parent is None:
                continue
            p = node.parent.index
            lo = self._node_lo(node, los)
            pst = dict(states[p])
            u_p = pst["gas"]["u"]
            e46 = self._restrict_into(
                node, u_p[:, 4:6],
                restrict_average(states[node.index]["gas"]["u"][:, 4:6],
                                 node.active, volf=node.volf), lo)
            pst["gas"] = dict(pst["gas"])
            pst["gas"]["u"] = u_p.at[:, 4:6].set(e46.astype(u_p.dtype))
            Er = self._restrict_into(
                node, pst["rad"]["Er"],
                restrict_average(states[node.index]["rad"]["Er"],
                                 node.active, volf=node.volf), lo)
            pst["rad"] = dict(pst["rad"])
            pst["rad"]["Er"] = Er
            states[p] = pst
        # parent prims re-sync after the restriction
        out = []
        for node in self.nodes:
            st = dict(states[node.index])
            if node.children:
                st = node.radiation.sync_gas(st)
            out.append(st)
        return out

    def _rad_ghost_planes_padded(self, node, st, Erp, lo_n, states,
                                 sib_Er):
        """Dirichlet ghost planes via the full padded Er build — kept
        for sharded patches (the pad routes _post_fine_ghosts seam
        exchanges); values identical to _rad_ghost_planes."""
        i = node.index
        Er_pad = node.fill_fine_ghosts(st["rad"]["Er"], Erp, lo_n)
        # distributed patches: internal-seam ghosts take the neighbor
        # shard's fine Er (the CG matvec itself exchanges per-iteration
        # via Radiation._shift; this seeds the gradient limiter and the
        # end planes)
        Er_pad = self._post_fine_ghosts(Er_pad, node, "rad", states)
        Er_pad = self._apply_sib_links(Er_pad, self._sib_links[i], sib_Er)
        gh = {}
        for d in (1, 2, 3):
            if node.grid.nx[d - 1] <= 1:
                continue
            ax = Er_pad.ndim - d
            ngd = node.grid.ng[d - 1]
            nd = node.grid.nx[d - 1]

            def plane(idx):
                sl = [slice(None)] * Er_pad.ndim
                sl[ax] = slice(idx, idx + 1)
                for c in (1, 2, 3):
                    if c == d or node.grid.nx[c - 1] <= 1:
                        continue
                    axc = Er_pad.ndim - c
                    gc = node.grid.ng[c - 1]
                    sl[axc] = slice(gc, gc + node.grid.nx[c - 1])
                return Er_pad[tuple(sl)]

            gh[d] = (plane(ngd - 1), plane(ngd + nd))
        return gh

    def _rad_ghost_planes(self, node, Erp, lo, sib_Er):
        """Per-face Dirichlet ghost planes for the fine FLD solve in
        O(surface): the innermost prolonged ghost row of each face slab
        (sibling fine values folded), with the interior transverse
        window — bit-identical to the padded-build extraction
        (fill_fine_ghosts fills its ghost slabs from the same
        _prolong_ghost_slab)."""
        fgrid = node.grid
        links = self._sib_links[node.index]

        def tr_slices(a):
            sl = [slice(None)] * a.ndim
            for c in (1, 2, 3):
                if c == d or fgrid.nx[c - 1] <= 1:
                    continue
                axc = a.ndim - c
                gc = fgrid.ng[c - 1]
                sl[axc] = slice(gc, gc + fgrid.nx[c - 1])
            return sl

        gh = {}
        assert not any(node.wrap), \
            "wrap-axis patches route through _rad_ghost_planes_padded " \
            "(the slab windows expect a wrap-padded parent)"
        for d in (1, 2, 3):
            dd = d - 1
            if fgrid.nx[dd] <= 1:
                continue
            if node.ghost_spacings is None:
                s0, s1 = node._prolong_ghost_slab_pair(Erp, dd, lo)
            else:
                s0 = node._prolong_ghost_slab(Erp, dd, 0, lo)
                s1 = node._prolong_ghost_slab(Erp, dd, 1, lo)
            if links:
                s0 = node._fold_sib_into_slab(s0, dd, 0, links, sib_Er)
                s1 = node._fold_sib_into_slab(s1, dd, 1, links, sib_Er)
            ngd = fgrid.ng[dd]
            sl0 = tr_slices(s0)
            sl0[s0.ndim - d] = slice(ngd - 1, ngd)   # innermost lo ghost
            sl1 = tr_slices(s1)
            sl1[s1.ndim - d] = slice(0, 1)           # innermost hi ghost
            gh[d] = (s0[tuple(sl0)], s1[tuple(sl1)])
        return gh

    def _static_los(self, los):
        """Swap lattice-static nodes' traced positions for compile-time
        constants.  Static/tiled trees recompile on every topology
        change, so ``node.lo`` is the truth — substituting it turns
        every restriction / prolongation-window / rim-delta
        dynamic-slice at a TRACED offset into a static one, which XLA
        lowers to aligned fused copies instead of runtime-offset
        scatter/gather (the dominant AMR-glue cost on TPU).  Moving
        nodes (move-style retag, particle tracking) keep their traced
        positions."""
        out = list(los)
        for node in self.nodes:
            if node.parent is None or not self._links_static(node):
                continue
            out[node.index] = np.asarray(node.lo, np.int32)
        return out

    def _build_step(self):
        def step(states, dt, time, los, particles):
            los = self._static_los(los)
            u1s = [{fl: st[fl]["u"] for fl in st if fl != "rad"}
                   for st in states]
            for stage in range(1, self.integ.nstages + 1):
                states, _ = self._stage(states, u1s, dt, time, stage, los,
                                        particles)
            if self.radiation_factory is not None:
                states = self._radiation_pass(states, dt, los)
            return states

        return step

    def _estimate_dt(self, states):
        dts = []
        for node in self.nodes:
            for fl, cfg in node.fluids():
                dt = node.hydro.estimate_dt(states[node.index][fl]["w"], cfg)
                if fl == "gas" and node.diffusion is not None:
                    dt = jnp.minimum(dt, cfg.cfl * node.diffusion.estimate_dt(
                        states[node.index][fl]["w"]))
                if fl == "gas" and node.radiation is not None:
                    dt = jnp.minimum(dt, node.radiation.cfg.dt_rad)
                dts.append(dt)
        return jnp.min(jnp.stack(dts))

    # -- state ------------------------------------------------------------
    def initialize(self, prims_per_node):
        """prims_per_node: list (topo order) of {fluid: interior prims};
        entries may be None -> prolonged from the parent."""
        states = []
        for node in self.nodes:
            pr = prims_per_node[node.index]
            st = {}
            for fl, cfg in node.fluids():
                if pr is not None and fl in pr and pr[fl] is not None:
                    w = jnp.asarray(pr[fl])
                else:
                    sl = tuple(
                        slice(node.lo[2 - i], node.lo[2 - i] + node.n[2 - i])
                        if node.active[2 - i] else slice(0, 1) for i in range(3))
                    wparent = states[node.parent.index][fl]["w"]
                    w = prolong_minmod(wparent[(Ellipsis, *sl)], node.active,
                                       spacings=node.interior_spacings())
                u, w = node.hydro.prim_to_cons(w, cfg)
                st[fl] = {"u": u, "w": w}
            if node.radiation is not None:
                from .radiation import initialize_radiation

                st["rad"] = {"Er": initialize_radiation(
                    st, self.cfg, node.radiation.cfg)["Er"]}
            states.append(st)
        return states

    # -- adaptive retagging -------------------------------------------------
    def retag_criteria(self, states, los, criterion):
        """Re-center each level's patches on the refinement-tagged cells of
        their parent (ScalarFirstDerivative / ScalarMagnitude,
        amr_criteria.hpp; keys per gas.cpp:304-383)."""
        from .ops import refinement as ref_mod

        def tags_fn(node, wc):
            field = wc[:, 0] if criterion.get("field", "density") == "density" \
                else wc[:, 4]
            # ``wc`` is the host-side (reassembled GLOBAL) parent array, so
            # the stencil widths must come from the parent's GLOBAL grid
            # (node.parent.grid is the shard-local window on sharded trees)
            pgrid = self.ic_grids[node.parent.index]
            dims = [d for d in (1, 2, 3) if pgrid.nx[d - 1] > 1]
            if criterion.get("type", "gradient") == "gradient":
                widths = ref_mod.grid_stencil_widths(pgrid)
                tags, _ = ref_mod.scalar_first_derivative(
                    jnp.asarray(field), widths, dims,
                    criterion["refine_thr"], criterion.get("deref_thr", 0.0),
                    bc=pgrid.bc)
            else:
                tags, _ = ref_mod.scalar_magnitude(
                    jnp.asarray(field), criterion["refine_thr"],
                    criterion.get("deref_thr", 0.0))
            return np.asarray(tags).any(axis=0)

        return self._retag(states, los, tags_fn)

    def retag_user(self, states, los, fn):
        """Re-center patches with a problem-defined refinement criterion
        (<artemis> amr_user = true; ProblemCheckRefinementBlock
        registration, artemis.cpp:149-150).  ``fn(w_gas, grid) -> bool
        refine mask`` over the parent grid's interior cells."""
        return self._retag(
            states, los,
            lambda node, wc: np.asarray(fn(wc, node.parent.grid), dtype=bool))

    def _retag(self, states, los, tags_fn):
        """Shared retag pass: compute refine tags on each node's parent and
        re-center the node's window on the tagged bounding box."""
        if self._shard_axis is not None and any(n_.curv for n_ in self.nodes):
            raise ValueError(
                "curvilinear adaptive patch moves are not supported on a "
                "sharded tree (replicated-node frames are static)")
        if self._gather6 is not None:
            raise ValueError(
                "adaptive patch moves on a gather6 fused tree: construct "
                "MultiLevelSMR with moving_patches=True (the padless stage "
                "bakes static patch-margin guarantees)")
        new_los = list(los)
        states = list(states)
        for node in self.nodes:
            if node.parent is None:
                continue
            wc = np.asarray(states[node.parent.index]["gas"]["w"])
            tags = tags_fn(node, wc)
            if not tags.any():
                continue
            idx = np.nonzero(tags)
            lo_np = np.asarray(new_los[node.index])
            new_lo = [int(v) for v in lo_np]
            pg = self._parent_grid(node)
            for d in (1, 2, 3):
                if pg.nx[d - 1] <= 1 or node.wrap[d - 1]:
                    continue
                ax = 3 - d
                c0, c1 = int(idx[ax].min()), int(idx[ax].max())
                want = (c0 + c1 + 1 - node.n[d - 1]) // 2
                hi = pg.nx[d - 1] - node.n[d - 1] - node.rim[d - 1]
                new_lo[d - 1] = int(np.clip(want, node.rim[d - 1], hi))
            if tuple(new_lo) == tuple(int(v) for v in lo_np):
                continue
            states, new_los = self._move_patch(states, new_los, node, new_lo)
        self._maybe_recompile()
        return states, new_los

    def retag_particles(self, states, los, particle_nodes, positions):
        """Re-center particle-tracking patches on their particles
        (refine_distance, nbody.cpp:276-312).  ``particle_nodes``:
        {node.index: particle_index}; ``positions``: [npart, 3] cartesian."""
        if self._shard_axis is not None and any(
                self.nodes[i].curv for i in particle_nodes):
            raise ValueError(
                "curvilinear tracking-patch moves are not supported on a "
                "sharded tree (replicated-node frames are static)")
        new_los = list(los)
        states = list(states)
        for node in self.nodes:
            if node.index not in particle_nodes:
                continue
            k = particle_nodes[node.index]
            pg = self._parent_grid(node)
            want = self._cell_of(pg, positions[k])
            if want is None:
                continue
            new_lo = [int(v) for v in np.asarray(new_los[node.index])]
            for d in range(3):
                if pg.nx[d] <= 1 or node.wrap[d]:
                    continue
                lo_d = want[d] - node.n[d] // 2
                hi = pg.nx[d] - node.n[d] - node.rim[d]
                new_lo[d] = int(np.clip(lo_d, node.rim[d], hi))
            if tuple(new_lo) != tuple(int(v)
                                      for v in np.asarray(new_los[node.index])):
                states, new_los = self._move_patch(states, new_los, node, new_lo)
        self._maybe_recompile()
        return states, new_los

    @staticmethod
    def _cell_of(grid, pos_cart):
        """Interior cell index [x,y,z] containing a cartesian position."""
        # invert to the grid's native coordinates
        x, y, z = float(pos_cart[0]), float(pos_cart[1]), float(pos_cart[2])
        c = grid.coords
        if geo.is_cartesian(c):
            nat = (x, y, z)
        elif c == "cylindrical":
            nat = (math.hypot(x, y), math.atan2(y, x), z)
        elif c == "axisymmetric":
            nat = (math.hypot(x, y), z, math.atan2(y, x))
        elif geo.is_spherical(c):
            r = math.sqrt(x * x + y * y + z * z)
            nat = (r, math.acos(z / r) if r > 0 else 0.0, math.atan2(y, x))
        else:
            return None
        out = []
        for d in range(3):
            if grid.nx[d] <= 1:
                out.append(0)
                continue
            frac = (nat[d] - grid.xmin[d]) / (grid.xmax[d] - grid.xmin[d])
            out.append(int(np.clip(frac * grid.nx[d], 0, grid.nx[d] - 1)))
        return out

    def _fresh_patch_state(self, parent_state, node: _Node, lo):
        """Prolong a node's state from its parent's current prims at
        window ``lo`` (fresh spawn / post-move re-prolongation)."""
        st = {}
        for fl, cfg in node.fluids():
            wp = parent_state[fl]["w"]
            sl = []
            pad_axes = []
            for i in range(3):
                d = 2 - i
                if not node.active[d]:
                    sl.append(slice(0, 1))
                elif node.wrap[d]:
                    # full (global) periodic axis; pad one wrapped cell on
                    # each side so the prolongation slopes see the seam
                    sl.append(slice(0, wp.shape[wp.ndim - 3 + i]))
                    pad_axes.append(wp.ndim - 3 + i)
                else:
                    sl.append(slice(lo[d], lo[d] + node.n[d]))
            reg = wp[(Ellipsis, *sl)]
            for ax_ in pad_axes:
                lo_p = jax.lax.slice_in_dim(reg, reg.shape[ax_] - 1,
                                            reg.shape[ax_], axis=ax_)
                hi_p = jax.lax.slice_in_dim(reg, 0, 1, axis=ax_)
                reg = jnp.concatenate([lo_p, reg, hi_p], axis=ax_)
            wf = prolong_minmod(reg, node.active,
                                spacings=node.interior_spacings())
            crop = [slice(None)] * wf.ndim
            for ax_ in pad_axes:
                crop[ax_] = slice(2, wf.shape[ax_] - 2)
            wf = wf[tuple(crop)]
            u, w = self._ic_hydro(node).prim_to_cons(wf, cfg)
            st[fl] = {"u": u, "w": w}
        if node.radiation is not None:
            from .radiation import initialize_radiation

            st["rad"] = {"Er": initialize_radiation(
                st, self.cfg, node.radiation.cfg)["Er"]}
        return st

    def _move_patch(self, states, los, node: _Node, new_lo):
        """Move a patch: restriction already deposited its data on the
        parent, so a move is a fresh prolongation at the new spot.
        Cartesian patches keep their geometry (translation-invariant);
        curvilinear patches rebuild theirs at the new window (the caller
        recompiles the tree once per retag pass)."""
        if node.children:
            raise ValueError("cannot move a patch that has children")
        if node.curv:
            node.rebuild_at(new_lo)
            self._needs_recompile = True
        states[node.index] = self._fresh_patch_state(
            states[node.parent.index], node, new_lo)
        los[node.index] = jnp.asarray(np.array(new_lo, dtype=np.int32))
        return states, los

    # -- tag-driven spawn/destroy (Parthenon Refinement::Tag ->
    #    create/destroy MeshBlocks; artemis_driver.cpp:292) ---------------
    def remove_patch(self, node: _Node):
        """Drop a leaf patch from the tree.  Its fine data needs no
        deposit: every step already restricts the fine solution into the
        parent.  The caller recompiles (batched per regrid pass)."""
        if node.children:
            raise ValueError("cannot remove a patch that has children")
        node.parent.children.remove(node)
        self.nodes.remove(node)
        for i, nd in enumerate(self.nodes):
            nd.index = i

    def regrid_tiles(self, states, los, criterion, tile, nbuf=1,
                     tags_fn=None, numlevel=2, forced=None):
        """Tag-driven spawn/destroy adaptivity over fixed tile lattices,
        down to ``numlevel - 1`` refinement levels.

        Each parent window (the root; then every surviving tile) is
        tiled by ``tile``-sized windows anchored at its nesting rim; a
        window spawns a child patch when the (nbuf-cell-buffered) refine
        tags touch it, keeps its patch while tags persist, and destroys
        it when every cell satisfies the derefinement criterion
        (deref_thr; without one, coverage only grows — the reference's
        behavior when no derefine tag fires).  A tile with live children
        is never destroyed (nested hysteresis: it goes one regrid after
        its children).  Deeper tiles spawn only inside tiles that
        already carry state, so a feature reaches full depth over
        ``numlevel - 1`` regrid passes (SMRDriver.initialize iterates
        the pre-evolution pass accordingly).  Surviving patches keep
        their fine state bit-exactly; new patches prolong from their
        parent; destroys drop (restriction already deposited their
        data).  Returns (states, los).

        ``tags_fn`` (problem-defined criterion, <artemis> amr_user):
        ``fn(w_gas, grid) -> bool refine mask`` over the parent interior
        replaces the <gas> refine_* keys; a tile derefines when its
        (buffered) window is completely untagged.

        ``forced``: static_refinement regions composed with adaptivity
        (Parthenon honors <parthenon/static_refinementK> blocks under
        refinement=adaptive: those MeshBlocks stay refined regardless of
        tags).  Each entry is ``dict(level, c0, c1)`` with the window in
        level-(level-1) GLOBAL cells; any tile window intersecting a
        forced region at its level is spawned and never destroyed.

        Equivalent of parthenon::Refinement::Tag + MeshBlock
        creation/destruction (artemis_driver.cpp:292, amr_criteria.hpp;
        numlevel semantics per doc/src/running.rst:87,117-135), recast
        as static-shape patch pools for XLA."""
        import itertools

        from .ops import refinement as ref_mod

        if not hasattr(self, "_tag_jits"):
            self._tag_jits = {}

        def _dilate(tags):
            """nbuf-cell boolean dilation per active axis (no wrap) —
            jnp ops, exact-equal to the former host |= loop."""
            for _ in range(max(0, nbuf)):
                t2 = tags
                for ax in range(3):
                    if tags.shape[ax] > 1:
                        pad_lo = [(0, 0)] * 3
                        pad_lo[ax] = (0, 1)
                        pad_hi = [(0, 0)] * 3
                        pad_hi[ax] = (1, 0)
                        sl_lo = [slice(None)] * 3
                        sl_lo[ax] = slice(1, None)
                        sl_hi = [slice(None)] * 3
                        sl_hi[ax] = slice(0, -1)
                        t2 = (t2 | jnp.pad(tags, pad_lo)[tuple(sl_lo)]
                              | jnp.pad(tags, pad_hi)[tuple(sl_hi)])
                tags = t2
            return tags

        def tag_deref(w_dev, g):
            """(refine tags, all-derefine mask, deref_thr) on grid g.

            Criterion tags compute ON DEVICE (one jitted launch, cached
            per grid) and only the boolean masks cross the host link —
            the former full-state pull cost ~25x the tag bytes per
            regrid over the TPU tunnel and dominated the adaptive
            loop's wall time (bench rhd_tiled leg)."""
            deref_all = None
            if tags_fn is None and not criterion:
                # forced-windows-only deck: nothing tags, nothing derefines
                shp = tuple(g.nx[::-1])
                return (np.zeros(shp, bool), np.zeros(shp, bool), 0.0)
            if tags_fn is not None:
                # problem-defined criterion: host semantics (the hook
                # receives a concrete array)
                tags = np.asarray(tags_fn(np.asarray(w_dev), g),
                                  dtype=bool)
                while tags.ndim > 3:                 # species axis
                    tags = tags.any(axis=0)
                tags = np.asarray(_dilate(jnp.asarray(tags)))
                return tags, ~tags, 1.0
            deref_thr = criterion.get("deref_thr", 0.0)
            # cache key: everything the traced computation closes over
            # (grid extents/ghosts/BCs/spacings + input shape) — ids are
            # unsafe (ic_grids are rebuilt every _compile and a freed
            # id can be reused)
            key = (tuple(g.nx), tuple(g.ng), tuple(map(tuple, g.bc)),
                   float(g.geom.xf1[0]), float(g.geom.xf1[1]),
                   float(g.geom.xf2[0]),
                   float(g.geom.xf2[1]) if len(g.geom.xf2) > 1 else 0.0,
                   float(g.geom.xf3[0]),
                   float(g.geom.xf3[1]) if len(g.geom.xf3) > 1 else 0.0,
                   tuple(w_dev.shape))
            fn = self._tag_jits.get(key)
            if fn is None:
                dims = [d for d in (1, 2, 3) if g.nx[d - 1] > 1]

                def compute(w):
                    field = w[:, 0] \
                        if criterion.get("field", "density") == "density" \
                        else w[:, 4]
                    if criterion.get("type", "gradient") == "gradient":
                        widths = ref_mod.grid_stencil_widths(g)
                        tg, de = ref_mod.scalar_first_derivative(
                            field, widths, dims,
                            criterion["refine_thr"], deref_thr, bc=g.bc)
                    else:
                        tg, de = ref_mod.scalar_magnitude(
                            field, criterion["refine_thr"], deref_thr)
                    return _dilate(tg.any(axis=0)), de.all(axis=0)

                fn = jax.jit(compute)
                self._tag_jits[key] = fn
            tags, deref = fn(w_dev)
            return np.asarray(tags), np.asarray(deref), deref_thr

        def decide(parent, g, w_dev, strict):
            """Spawn/keep/drop decisions for one parent window: returns
            (tile_t, to_drop nodes, to_spawn los) or None when the tile
            lattice does not fit (deep windows too small — skipped
            unless ``strict``, the deck-validated root)."""
            nx = g.nx
            rims = [max(1, -(-g.ng[d] // 2)) + 1 if nx[d] > 1 else 0
                    for d in range(3)]
            t = tuple(tile[d] if nx[d] > 1 else 1 for d in range(3))
            lattice = []
            for d in range(3):
                if nx[d] <= 1:
                    lattice.append([0])
                    continue
                last = nx[d] - rims[d] - t[d]
                if last < rims[d]:
                    if strict:
                        raise ValueError(
                            f"tile_nx{d + 1}={t[d]} does not fit the root "
                            f"interior with the nesting rim ({rims[d]})")
                    return None
                lattice.append(list(range(rims[d], last + 1, t[d])))
            tags, deref_all, deref_thr = tag_deref(w_dev, g)

            def window(lo_):
                return tuple(slice(lo_[2 - i], lo_[2 - i] + t[2 - i])
                             if nx[2 - i] > 1 else slice(None)
                             for i in range(3))

            # static_refinement regions forced at this parent's level:
            # translate the parent's interior-local lattice to global
            # parent-level cells (own_origin) and intersect
            forced_here = []
            if forced:
                og = [0, 0, 0]
                chain = []
                nd_ = parent
                while nd_.parent is not None:
                    chain.append(nd_.lo)
                    nd_ = nd_.parent
                for lo_p in reversed(chain):
                    og = [2 * (og[d] + lo_p[d]) for d in range(3)]
                for spec in forced:
                    if spec["level"] == parent.level + 1:
                        forced_here.append((spec["c0"], spec["c1"], og))

            def is_forced(lo_):
                for c0, c1, og in forced_here:
                    if all(nx[d] <= 1
                           or (og[d] + lo_[d] < c1[d]
                               and og[d] + lo_[d] + t[d] > c0[d])
                           for d in range(3)):
                        return True
                return False

            wanted = {lo_ for lo_ in itertools.product(*lattice)
                      if is_forced(lo_) or bool(tags[window(lo_)].any())}
            current = {nd.lo: nd for nd in parent.children
                       if getattr(nd, "pool", False)}
            final = set(wanted)
            for lo_ in current:
                if lo_ in final:
                    continue
                if current[lo_].children:
                    final.add(lo_)         # nested hysteresis: children
                    continue               # must derefine first
                if deref_thr > 0.0 and bool(deref_all[window(lo_)].all()):
                    continue               # derefine: drop this tile
                final.add(lo_)             # hysteresis: keep until cleared
            drop = [nd for lo_, nd in current.items() if lo_ not in final]
            return t, drop, sorted(final - set(current))

        # one decision pass per parent, level by level (deeper tiles tag
        # from their own existing state; tiles spawned THIS pass carry no
        # state yet and get their children at the next regrid)
        to_remove, to_add = [], []         # nodes; (parent, lo, t)
        root_dec = decide(self.root, self.ic_grids[0],
                          states[0]["gas"]["w"], strict=True)
        _, drop, add = root_dec
        to_remove += drop
        to_add += [(self.root, lo_, root_dec[0]) for lo_ in add]
        dropped = set(id(nd) for nd in drop)
        for lev in range(1, max(1, numlevel - 1)):
            for parent in [nd for nd in self.nodes
                           if nd.level == lev and getattr(nd, "pool", False)
                           and id(nd) not in dropped]:
                dec = decide(parent, self.ic_grids[parent.index],
                             states[parent.index]["gas"]["w"],
                             strict=False)
                if dec is None:
                    continue
                t, drop, add = dec
                to_remove += drop
                dropped |= set(id(nd) for nd in drop)
                to_add += [(parent, lo_, t) for lo_ in add]
        if not to_remove and not to_add:
            return states, los

        keep_state = {id(nd): states[nd.index] for nd in self.nodes}
        keep_lo = {id(nd): los[nd.index] for nd in self.nodes[1:]}
        # children before parents (remove_patch refuses non-leaves)
        for nd in sorted(to_remove, key=lambda n: -n.level):
            self.remove_patch(nd)
        spawned = []
        for parent, lo_, t in to_add:
            node = self.add_patch(parent.level + 1, lo_, t, parent=parent)
            node.pool = True
            spawned.append(node)
        self._compile()
        new_states = [None] * len(self.nodes)
        new_los = [None] * len(self.nodes)
        new_states[0] = states[0]
        for nd in self.nodes[1:]:
            if nd in spawned:
                new_states[nd.index] = self._place_fresh(
                    nd, self._fresh_patch_state(
                        new_states[nd.parent.index], nd, nd.lo))
                new_los[nd.index] = jnp.asarray(
                    np.array(nd.lo, dtype=np.int32))
            else:
                new_states[nd.index] = keep_state[id(nd)]
                new_los[nd.index] = keep_lo[id(nd)]
        return new_states, new_los


class TwoLevelSMR:
    """Back-compat adapter: the original two-level single-patch API on top
    of MultiLevelSMR (tests and the blast/linwave AMR decks use it)."""

    def __init__(self, coarse_grid: Grid, integrator: Integrator,
                 gas_cfg: FluidCfg, patch_lo, patch_n):
        self.ml = MultiLevelSMR(
            coarse_grid, integrator, gas_cfg,
            patches=[dict(level=1, lo=tuple(int(v) for v in patch_lo),
                          n=tuple(int(v) for v in patch_n))],
            moving_patches=True)  # exposes retag-based patch moves
        self.cg = coarse_grid
        self.node = self.ml.nodes[1]
        self.hc = self.ml.root.hydro
        self.cfg = gas_cfg
        self.integ = integrator
        self.patch_lo = tuple(int(v) for v in patch_lo)
        self.patch_n = tuple(int(v) for v in patch_n)
        self.active = self.node.active
        self.rim = self.node.rim
        self.curv = self.node.curv

    # node-derived views (curvilinear adaptive moves rebuild the node's
    # grid/hydro/weights, so these must not be snapshotted at init)
    @property
    def fg(self):
        return self.node.grid

    @property
    def hf(self):
        return self.node.hydro

    @property
    def volf(self):
        return self.node.volf

    def _patch_slices(self):
        lo, n = self.patch_lo, self.patch_n
        return tuple(slice(lo[2 - i], lo[2 - i] + n[2 - i]) for i in range(3))

    def initialize(self, wc, wf):
        states = self.ml.initialize([{"gas": wc}, {"gas": wf}])
        sc = (states[0]["gas"]["u"], states[0]["gas"]["w"])
        sf = (states[1]["gas"]["u"], states[1]["gas"]["w"])
        return sc, sf

    def _states(self, sc, sf):
        return [{"gas": {"u": sc[0], "w": sc[1]}},
                {"gas": {"u": sf[0], "w": sf[1]}}]

    def _step(self, sc, sf, dt, lo):
        states = self.ml._step(self._states(sc, sf), dt, jnp.asarray(0.0),
                               [None, lo], None)
        return ((states[0]["gas"]["u"], states[0]["gas"]["w"]),
                (states[1]["gas"]["u"], states[1]["gas"]["w"]))

    def _dt(self, sc, sf):
        return self.ml._dt(self._states(sc, sf))

    def run(self, sc, sf, tlim, nlim=-1, criterion=None, retag_interval=10):
        t, dt, nc = 0.0, float(self._dt(sc, sf)), 0
        lo = jnp.asarray(np.array(self.patch_lo, dtype=np.int32))
        while t < tlim * (1 - 1e-12) and (nlim < 0 or nc < nlim):
            use = min(dt, tlim - t)
            sc, sf = self._step(sc, sf, jnp.asarray(use), lo)
            t += use
            nc += 1
            dt = min(2 * use, float(self._dt(sc, sf)))
            if criterion is not None and nc % retag_interval == 0:
                sc, sf, lo = self.retag(sc, sf, lo, criterion)
        self.patch_lo = tuple(int(v) for v in np.asarray(lo))
        return sc, sf, t, nc

    def retag(self, sc, sf, lo, criterion):
        states, los = self.ml.retag_criteria(self._states(sc, sf),
                                             [None, lo], criterion)
        return ((states[0]["gas"]["u"], states[0]["gas"]["w"]),
                (states[1]["gas"]["u"], states[1]["gas"]["w"]), los[1])


class SMRDriver:
    """Driver-API adapter for deck-driven refinement.

    Deck dialect (reference-compatible):
      <parthenon/mesh> refinement = static | adaptive, numlevel = N
      <parthenon/static_refinementK> level / x1min / x1max / ... physical
        bounds (Parthenon static refinement; running.rst:121-135)
      adaptive: <gas> refine_field / refine_type / refine_thr / deref_thr
        (gas.cpp:304-383) recenters one patch per level every
        check_interval cycles; N-body particles with <particleN>
        refine_distance > 0 get their own tracking patches
        (nbody.cpp:276-312).

    Exposes the Driver surface used by ``evolve`` (host_coupled = True).
    The evolve-visible state holds the root level (which carries the
    restricted fine solution everywhere under the patches); fine-level
    states live in the adapter and are saved in restart payloads so a
    restart resumes bit-exactly.
    """

    host_coupled = True

    def __init__(self, grid, integrator, gas_cfg, pin, dust_cfg=None,
                 sources_factory=None, diffusion_factory=None,
                 bc_custom=None, omf=0.0, nbody=None, fine_prims=None,
                 radiation_factory=None, nshards=1, shard_axis=3, mesh=None):
        self.gas_cfg = gas_cfg
        self.dust_cfg = dust_cfg
        self.nbody = nbody
        self.grid = grid
        self.integrator = integrator
        mode = pin.get_str("parthenon/mesh", "refinement")
        if mode not in ("adaptive", "static"):
            raise ValueError(f"refinement {mode!r} not recognized")
        self.adaptive = mode == "adaptive"
        numlevel = pin.get_or_add_int("parthenon/mesh", "numlevel", 2)
        self.numlevel = numlevel

        # tiled spawn/destroy adaptivity (<parthenon/refinement>
        # style=tiled): patches come and go with the refine tags over a
        # fixed tile lattice (MultiLevelSMR.regrid_tiles) instead of one
        # deck patch per level re-centering (style=move).  Tiled is the
        # DEFAULT whenever the deck carries a refinement criterion —
        # reference adaptive decks (refinement=adaptive + <gas> refine_*
        # keys, running.rst:117-135) then get the reference's
        # create/destroy-MeshBlocks semantics; criterion-less adaptive
        # decks keep the single re-centering patch per level.
        has_crit = pin.exists("gas", "refine_thr") or pin.get_or_add_bool(
            "artemis", "amr_user", False)
        self.tiled = (self.adaptive and pin.get_or_add_str(
            "parthenon/refinement", "style",
            "tiled" if has_crit else "move") == "tiled")
        # default tile: 16 root cells per active axis, clamped (even) to
        # what fits inside the nesting rim so small meshes work out of
        # the box; an EXPLICIT tile_nx that does not fit still raises in
        # regrid_tiles (a deck error, not a default)
        tile = []
        for d in range(3):
            if grid.nx[d] <= 1:
                tile.append(1)
                continue
            rim = max(1, -(-grid.ng[d] // 2)) + 1
            fit = max(2, (grid.nx[d] - 2 * rim) // 2 * 2)
            tile.append(pin.get_or_add_int(
                "parthenon/refinement", f"tile_nx{d + 1}", min(16, fit)))
        self.tile = tuple(tile)
        self.regrid_nbuf = pin.get_or_add_int(
            "parthenon/refinement", "nbuf", 1)

        patches = []
        # 1) reference static_refinement blocks (physical bounds).  Under
        # tiled adaptivity they become FORCED tile windows instead of
        # standalone patches (Parthenon keeps static regions refined under
        # refinement=adaptive; a separate patch would overlap the pool)
        self.forced_windows = []
        for blk in pin.block_names():
            if not blk.startswith("parthenon/static_refinement"):
                continue
            level = pin.get_or_add_int(blk, "level", 1)
            if self.tiled:
                wins = self._bounds_to_windows(pin, blk, grid, level)
                for win in wins:
                    # the tile lattice anchors at the nesting rim with a
                    # uniform step: the trailing (span % tile) cells are
                    # uncoverable — surface a partially-coverable window
                    # rather than silently under-refining it
                    for d in range(3):
                        if grid.nx[d] <= 1:
                            continue
                        rim = max(1, -(-grid.nghost // 2)) + 1
                        t = self.tile[d]
                        # achievable tile anchors at this window's level,
                        # in global level-(L-1) cells: level-1 anchors on
                        # the root lattice; each deeper level anchors ONE
                        # t-wide window per parent tile at offset rim
                        # (rim + j*t <= t - rim has only j = 0), so deep
                        # coverage is windows of width t spaced 2^(L-1)*t
                        # — NOT the contiguous global formula
                        kmax = (grid.nx[d] - 2 * rim - t) // t
                        anchors = [rim + k * t for k in range(kmax + 1)]
                        for _ in range(win["level"] - 1):
                            anchors = [2 * a + rim for a in anchors]
                        ok = any(a <= win["c0"][d] and win["c1"][d] <= a + t
                                 for a in anchors) if win["level"] >= 2 \
                            else (anchors
                                  and win["c1"][d] <= anchors[-1] + t
                                  and win["c0"][d] >= anchors[0])
                        if not ok:
                            print(f"# WARNING: {blk} (level {win['level']})"
                                  f" is not fully coverable by the tile "
                                  f"lattice on x{d + 1} (window cells "
                                  f"[{win['c0'][d]}, {win['c1'][d]}) vs "
                                  f"anchored {t}-cell tile windows at "
                                  f"{anchors[:4]}...); align the region "
                                  f"or adjust tile_nx{d + 1}", flush=True)
                self.forced_windows.extend(wins)
                self.numlevel = max(self.numlevel, level + 1)
                continue
            spec = self._bounds_to_patches(pin, blk, grid, level)
            patches.extend(spec)
        # 2) deck patch_lo/patch_n keys (artemis_tpu dialect; one per level).
        # numlevel <= 1 means no criteria/deck patches (tracking patches from
        # refine_distance may still be added below).
        if not patches and numlevel >= 2 and not self.tiled:
            for lev in range(1, max(2, numlevel)):
                scale = 2 ** (lev - 1)
                base_nx = [grid.nx[d] * scale for d in range(3)]
                n = [max(4, base_nx[d] // 2) if grid.nx[d] > 1 else 1
                     for d in range(3)]
                for d in range(3):
                    key = f"patch_nx{d + 1}"
                    if pin.exists("parthenon/refinement", key):
                        n[d] = pin.get_int("parthenon/refinement", key)
                lo = [(base_nx[d] - n[d]) // 2 if grid.nx[d] > 1 else 0
                      for d in range(3)]
                for d in range(3):
                    key = f"patch_lo{d + 1}"
                    if lev == 1 and pin.exists("parthenon/refinement", key):
                        lo[d] = pin.get_int("parthenon/refinement", key)
                patches.append(dict(level=lev, lo=tuple(lo), n=tuple(n)))
                if lev + 1 > numlevel - 1:
                    break

        # 3) nbody refine_distance tracking patches (nbody.cpp:276-312).
        # The reference enables them with <nbody> refine_type = distance
        # (nbody.cpp:238-241); an explicit refine_type = none disables even
        # when particles carry refine_distance.  When the key is absent,
        # refine_distance > 0 alone enables (this dialect's shorthand).
        # derefine_factor is accepted but has no patch analogue (a moving
        # patch needs no derefinement hysteresis band).
        self._particle_nodes = {}
        track = []
        rtype = pin.get_or_add_str("nbody", "refine_type", "") \
            if nbody is not None else ""
        pin.get_or_add_real("nbody", "derefine_factor", 2.0)
        if nbody is not None and rtype in ("", "distance"):
            for k in range(nbody.npart):
                rd = float(np.asarray(nbody.target_rad)[k])
                if rd > 0.0:
                    track.append((k, rd))

        if nshards > 1:
            from .parallel.amr import ShardedSMR

            self.smr = ShardedSMR(
                grid, integrator, gas_cfg, dust_cfg=dust_cfg,
                sources_factory=sources_factory,
                diffusion_factory=diffusion_factory, bc_custom=bc_custom,
                omf=omf, patches=patches, mesh=mesh, axis=shard_axis,
                nbody=nbody, radiation_factory=radiation_factory,
                moving_patches=(self.adaptive and not self.tiled)
                or bool(track),
                distribute=pin.get_or_add_bool("artemis", "amr_distribute",
                                               False))
        else:
            self.smr = MultiLevelSMR(
                grid, integrator, gas_cfg, dust_cfg=dust_cfg,
                sources_factory=sources_factory,
                diffusion_factory=diffusion_factory, bc_custom=bc_custom,
                omf=omf, patches=patches, nbody=nbody,
                radiation_factory=radiation_factory,
                # tiled pools are lattice-static between regrids (every
                # topology change recompiles): sibling fine-ghost links
                # and the gather6 fast path stay available
                moving_patches=(self.adaptive and not self.tiled)
                or bool(track))

        for (k, rd) in track:
            pos = np.asarray(nbody.pos)[k] - np.asarray(nbody.Rf)
            cell = MultiLevelSMR._cell_of(grid, pos)
            # patch wide enough to cover +/- refine_distance around the
            # particle on the root grid
            n = []
            lo = []
            rim = max(1, -(-grid.nghost // 2)) + 1
            for d in range(3):
                if grid.nx[d] <= 1:
                    n.append(1)
                    lo.append(0)
                    continue
                dx = (grid.xmax[d] - grid.xmin[d]) / grid.nx[d]
                half = max(2, int(np.ceil(rd / dx)))
                nn = min(2 * half, grid.nx[d] - 2 * rim)
                nn += nn % 2
                n.append(nn)
                lo.append(int(np.clip(cell[d] - nn // 2, rim,
                                      grid.nx[d] - nn - rim)))
            node = self.smr.add_patch(1, tuple(lo), tuple(n))
            self._particle_nodes[node.index] = k
        if track:
            self.smr._compile()

        self.hydro = self.smr.root.hydro
        self.sources = self.smr.root.sources
        self.diffusion = self.smr.root.diffusion
        self.criterion = None
        # problem-defined criterion (<artemis> amr_user; Simulation wires
        # the pgen's Problem.amr_criterion here) overrides the <gas> keys
        self.user_criterion = None
        if self.adaptive and pin.exists("gas", "refine_thr"):
            self.criterion = dict(
                field=pin.get_or_add_str("gas", "refine_field", "density"),
                type=pin.get_or_add_str("gas", "refine_type", "gradient"),
                refine_thr=pin.get_real("gas", "refine_thr"),
                deref_thr=pin.get_or_add_real("gas", "deref_thr", 0.0))
        self.retag_interval = pin.get_or_add_int(
            "parthenon/refinement", "check_interval", 10)
        self._fine_prims = fine_prims  # list per node index (or None)
        self._states = None
        self._los = [None] + [
            jnp.asarray(np.array(nd.lo, dtype=np.int32))
            for nd in self.smr.nodes[1:]]
        self._ncycle = 0

    @staticmethod
    def _bounds_to_windows(pin, blk, grid, level):
        """Convert a static_refinement physical-bounds block into global
        cell windows at levels 1..level: ``dict(level, c0, c1)`` with
        [c0, c1) in level-(level-1) global cells."""
        out = []
        lo_phys = [pin.get_or_add_real(blk, f"x{d + 1}min", grid.xmin[d])
                   for d in range(3)]
        hi_phys = [pin.get_or_add_real(blk, f"x{d + 1}max", grid.xmax[d])
                   for d in range(3)]
        for lev in range(1, level + 1):
            scale = 2 ** (lev - 1)
            c0s, c1s = [], []
            for d in range(3):
                if grid.nx[d] <= 1:
                    c0s.append(0)
                    c1s.append(1)
                    continue
                nd_lvl = grid.nx[d] * scale  # parent-level global resolution
                dx = (grid.xmax[d] - grid.xmin[d]) / nd_lvl
                c0 = int(np.floor((lo_phys[d] - grid.xmin[d]) / dx))
                c1 = int(np.ceil((hi_phys[d] - grid.xmin[d]) / dx))
                c0 -= c0 % 2
                c1 += c1 % 2
                if (c0 <= 0 and c1 >= nd_lvl
                        and grid.bc[d] == ("periodic", "periodic")):
                    # bounds cover the whole periodic axis: full-span wrap
                    # patch (ring refinement; no clamping away from the edge)
                    c0, c1 = 0, nd_lvl
                else:
                    rim = max(1, -(-grid.nghost // 2)) + 1
                    c0 = int(np.clip(c0, rim, nd_lvl - rim))
                    c1 = int(np.clip(c1, c0 + 2, nd_lvl - rim))
                c0s.append(c0)
                c1s.append(c1)
            out.append(dict(level=lev, c0=tuple(c0s), c1=tuple(c1s)))
        return out

    @classmethod
    def _bounds_to_patches(cls, pin, blk, grid, level):
        """Convert a static_refinement physical-bounds block into nested
        patch specs at levels 1..level (each level covering the bounds)."""
        out = []
        prev_c0 = [0, 0, 0]  # parent patch origin in parent-level cells
        for win in cls._bounds_to_windows(pin, blk, grid, level):
            lev, c0, c1 = win["level"], win["c0"], win["c1"]
            lo = []
            n = []
            for d in range(3):
                if grid.nx[d] <= 1:
                    lo.append(0)
                    n.append(1)
                    continue
                # convert from parent-level GLOBAL cells to parent-PATCH cells
                lo.append(c0[d] - 2 * prev_c0[d] if lev > 1 else c0[d])
                n.append(c1[d] - c0[d])
            out.append(dict(level=lev, lo=tuple(lo), n=tuple(n)))
            prev_c0 = list(c0)
        return out

    # -- Driver API ------------------------------------------------------
    def initialize(self, state):
        prims = [None] * len(self.smr.nodes)
        prims[0] = {fl: state[fl]["w"] for fl in state}
        if self._fine_prims:
            for i, pr in enumerate(self._fine_prims):
                if pr is not None and i + 1 < len(prims):
                    prims[i + 1] = pr
        self._states = self.smr.initialize(prims)
        if self.tiled and (self.criterion is not None
                           or self.user_criterion is not None
                           or self.forced_windows):
            # initial AMR iterations: refine the ICs before the first
            # step, once per depth level so features reach full depth
            # (Parthenon's pre-evolution refinement pass iterates too)
            for _ in range(max(1, self.numlevel - 1)):
                self._states, self._los = self._regrid()
        root = self._states[0]
        return {fl: dict(root[fl]) for fl in root}

    def _regrid(self):
        """Tiled spawn/destroy pass; the problem-defined criterion
        (amr_user) overrides the <gas> refine_* keys."""
        return self.smr.regrid_tiles(
            self._states, self._los,
            self.criterion if self.user_criterion is None else {},
            self.tile, nbuf=self.regrid_nbuf, tags_fn=self.user_criterion,
            numlevel=self.numlevel, forced=self.forced_windows)

    def restart_payloads(self):
        """Fine-level arrays for bit-exact restart (name -> fn)."""
        out = {}
        for node in self.smr.nodes[1:]:
            i = node.index

            def mk(i_, fl_, kind_):
                return lambda: np.asarray(self._states[i_][fl_][kind_])

            for fl, _ in node.fluids():
                out[f"n{i}.{fl}.u"] = mk(i, fl, "u")
                out[f"n{i}.{fl}.w"] = mk(i, fl, "w")
            if node.radiation is not None:
                out[f"n{i}.rad.Er"] = mk(i, "rad", "Er")
            out[f"n{i}.lo"] = (lambda i_: (lambda: np.asarray(self._los[i_])))(i)
        pool = [nd for nd in self.smr.nodes if getattr(nd, "pool", False)]
        if pool:
            # tile-pool topology: spawn/destroy trees rebuild these patches
            # before loading the per-node arrays (same node order -> same
            # indices as at dump time; pool nodes always trail the deck/
            # tracking nodes).  Row: [level, parent_index, lo, n] —
            # multi-level pools need the exact parent (tile windows are
            # ambiguous across same-level parents)
            out["pool"] = lambda: np.array(
                [[nd.level, nd.parent.index] + list(nd.lo) + list(nd.n)
                 for nd in pool], dtype=np.int64)
        return out

    def load_restart(self, payloads, root_state):
        """Rehydrate the fine levels from restart payloads."""
        if "pool" in payloads:
            for row in np.asarray(payloads["pool"], dtype=np.int64):
                if len(row) == 6:          # pre-multilevel checkpoints
                    lev, par, rest = 1, None, row
                else:
                    lev, par = int(row[0]), self.smr.nodes[int(row[1])]
                    rest = row[2:]
                node = self.smr.add_patch(
                    lev, tuple(int(v) for v in rest[:3]),
                    tuple(int(v) for v in rest[3:6]), parent=par)
                node.pool = True
            self.smr._compile()
            self._los = [None] + [
                jnp.asarray(np.array(nd.lo, dtype=np.int32))
                for nd in self.smr.nodes[1:]]
        self._states = [None] * len(self.smr.nodes)
        self._states[0] = {fl: dict(root_state[fl]) for fl in root_state}
        for node in self.smr.nodes[1:]:
            i = node.index
            st = {}
            for fl, _ in node.fluids():
                st[fl] = {"u": jnp.asarray(payloads[f"n{i}.{fl}.u"]),
                          "w": jnp.asarray(payloads[f"n{i}.{fl}.w"])}
            if f"n{i}.rad.Er" in payloads:
                st["rad"] = {"Er": jnp.asarray(payloads[f"n{i}.rad.Er"])}
            self._states[i] = st
            if f"n{i}.lo" in payloads:
                self._los[i] = jnp.asarray(
                    np.asarray(payloads[f"n{i}.lo"], dtype=np.int32))

    def _ensure_states(self, root_state):
        if self._states is None:
            # restart without fine payloads: re-prolong from the root
            prims = [None] * len(self.smr.nodes)
            prims[0] = {fl: root_state[fl]["w"] for fl in root_state}
            self._states = self.smr.initialize(prims)
        self._states[0] = {fl: dict(root_state[fl]) for fl in root_state}

    def step(self, state, dt, time):
        self._ensure_states(state)
        if self.nbody is not None:
            self._states = self._nbody_step(self._states, dt, time)
        else:
            self._states = self.smr._step(self._states, jnp.asarray(dt),
                                          jnp.asarray(time), self._los, None)
        self._ncycle += 1
        if self._ncycle % self.retag_interval == 0:
            if self.tiled and (self.criterion is not None
                               or self.user_criterion is not None
                               or self.forced_windows):
                self._states, self._los = self._regrid()
            elif self.user_criterion is not None:
                self._states, self._los = self.smr.retag_user(
                    self._states, self._los, self.user_criterion)
            elif self.criterion is not None:
                self._states, self._los = self.smr.retag_criteria(
                    self._states, self._los, self.criterion)
            # curvilinear tracking patches move on unsharded trees (the node
            # geometry is rebuilt per move); on a sharded tree the replicated
            # frames are static, so curvilinear tracking stays pinned there
            if self._particle_nodes and (
                    self.smr._shard_axis is None or not self.smr.nodes[
                        next(iter(self._particle_nodes))].curv):
                self._states, self._los = self.smr.retag_particles(
                    self._states, self._los, self._particle_nodes,
                    np.asarray(self.nbody.pos) - np.asarray(self.nbody.Rf))
        root = self._states[0]
        return {fl: dict(root[fl]) for fl in root}

    def _nbody_step(self, states, dt, time):
        """Stage loop with host-side particle advances (NBody::Advance
        pattern; pforce summed over levels with covered cells masked)."""
        nb = self.nbody
        nstages = self.integrator.nstages
        coeffs = nbody_coeffs(self.integrator, float(dt))
        nb.begin_step()
        u1s = [{fl: st[fl]["u"] for fl in st if fl != "rad"}
               for st in states]
        for stage in range(1, nstages + 1):
            states, pforce = self.smr._stage_jits[stage - 1](
                states, u1s, jnp.asarray(dt), jnp.asarray(time), self._los,
                nb.particle_pytree())
            pf = np.asarray(pforce) if pforce is not None \
                else np.zeros((nb.npart, 7))
            nb.advance(pf, stage, nstages, float(time), coeffs)
        return states

    def estimate_dt(self, state):
        self._ensure_states(state)
        return float(self.smr._dt(self._states))
