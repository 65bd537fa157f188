"""Static mesh refinement: level-synchronized block-structured AMR.

TPU-native rebuild of the reference's Parthenon AMR capability (SURVEY.md
§2.7, §7.7): instead of an oct-tree of MeshBlocks with per-block prolong /
restrict / flux-correction comm, refinement is organized as *levels* of
fixed-shape rectangular patches (static shapes — XLA-friendly), advanced in
lockstep with a shared global dt:

per RK stage, per level pair (coarse, fine):
  1. both levels compute fluxes from their stage-entry primitives
  2. coarse fluxes on the patch boundary faces are replaced by the area sum
     of the overlying fine fluxes (flux correction — conservation across the
     refinement boundary; cf. SendBoundBufs<flxcor> / SetFluxCorrections,
     artemis_driver.cpp:198-202)
  3. both apply the update
  4. fine cons are restricted (average) onto the coarse cells they cover
     (cf. RestrictAverage, src/utils/refinement/restriction.hpp)
  5. prims sync; fine ghost zones are filled by MinMod-limited prolongation
     of coarse prims (cf. ProlongateSharedMinMod,
     src/utils/refinement/prolongation.hpp:39-66)

Scope: 2 levels, one rectangular fine patch, Cartesian, gas-only, no
external sources.  The patch POSITION is a traced argument of the compiled
step (lax.dynamic_slice / dynamic_update_slice) so the adaptive mode —
retagging via the criteria in ops/refinement.py and re-centering the
fixed-shape patch on the tagged region (cf. <gas> refine_field /
refine_type / refine_thr, gas.cpp:304-383) — moves the patch with NO
recompilation: Cartesian geometry factors are translation invariant, so
one compiled step serves every placement.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import bc as bc_mod
from .driver import Integrator, SimTime
from .grid import Grid
from .geometry import geometry as geo
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
    import numpy as _np

    def faces_1d(d):
        f0, f1 = xf[d]
        nn = nxf[d]
        dxf = (f1 - f0) / nn
        ng = ngf[d]
        return f0 + dxf * _np.arange(-ng, nn + ng + 1, dtype=_np.float64)

    geom = geo.build_geometry(coarse.coords, faces_1d(0), faces_1d(1), faces_1d(2))
    return dataclasses.replace(
        coarse,
        nx=nxf,
        xmin=tuple(xf[d][0] for d in range(3)),
        xmax=tuple(xf[d][1] for d in range(3)),
        geom=geom,
        bc=(("amr", "amr"), ("amr", "amr"), ("amr", "amr")),
    )


def prolong_minmod(wc, active, spacings=None):
    """MinMod-limited prolongation coarse->fine (factor 2 per active dim).

    ``wc``: coarse array [..., z, y, x]; returns the 2x-refined array.
    Uniform grids (``spacings=None``): fine child = parent +/- slope/4
    (ProlongateSharedMinMod, prolongation.hpp:39-66 with constant dx).
    Curvilinear: ``spacings[d-1] = (dxm, dxp, dxfm, dxfp)`` 1-D arrays of
    centroid distances along axis d (GetGridSpacings, prolongation.hpp:36-67)
    so gradients and child offsets use the true volume-averaged centers.
    """
    out = wc
    for d in (1, 2, 3):
        if not active[d - 1]:
            continue
        ax = out.ndim - d
        lo = jnp.concatenate([out.take(jnp.array([0]), axis=ax),
                              jnp.moveaxis(jnp.moveaxis(out, ax, 0)[:-1], 0, ax)],
                             axis=ax)
        hi = jnp.concatenate([jnp.moveaxis(jnp.moveaxis(out, ax, 0)[1:], 0, ax),
                              out.take(jnp.array([-1]), axis=ax)], axis=ax)
        dl = out - lo
        dr = hi - out
        if spacings is None:
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

            dxm, dxp, dxfm, dxfp = spacings[d - 1]
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
    when ``volf`` is None — exact for Cartesian)."""

    def down(a):
        out = a
        for d in (1, 2, 3):
            if not active[d - 1]:
                continue
            ax = out.ndim - d
            shape = list(out.shape)
            shape[ax] //= 2
            shape.insert(ax + 1, 2)
            out = out.reshape(shape).sum(axis=ax + 1)
        return out

    if volf is None:
        out = wf
        for d in (1, 2, 3):
            if not active[d - 1]:
                continue
            ax = out.ndim - d
            shape = list(out.shape)
            shape[ax] //= 2
            shape.insert(ax + 1, 2)
            out = out.reshape(shape).mean(axis=ax + 1)
        return out
    v = jnp.asarray(volf)
    return down(wf * v) / down(v)


class TwoLevelSMR:
    """Two-level static-refinement driver for Cartesian gas hydro."""

    def __init__(self, coarse_grid: Grid, integrator: Integrator,
                 gas_cfg: FluidCfg, patch_lo, patch_n):
        self.cg = coarse_grid
        self.fg = _refine_grid(coarse_grid, patch_lo, patch_n)
        self.integ = integrator
        self.cfg = gas_cfg
        self.hc = Hydro(coarse_grid, gas_cfg)
        self.hf = Hydro(self.fg, gas_cfg)
        self.patch_lo = tuple(int(v) for v in patch_lo)
        self.patch_n = tuple(int(v) for v in patch_n)
        self.active = tuple(coarse_grid.nx[d] > 1 for d in range(3))
        ngf = self.fg.ng
        self.rim = tuple(max(1, -(-ngf[d] // 2)) if self.active[d] else 0
                         for d in range(3))
        # Curvilinear: geometry weights are position-dependent, so the fine
        # patch is STATIC (retag/moves are Cartesian-only) and restriction /
        # flux correction / prolongation use exact volume / area / centroid
        # weights precomputed here.
        self.curv = not geo.is_cartesian(coarse_grid.coords)
        self.volf = None
        self.volc_patch = None
        self.ghost_spacings = None
        self.areas_c = None
        self.areas_f = None
        if self.curv:
            cg, fg = self.cg, self.fg
            psl = self._patch_slices()
            self.volf = np.ascontiguousarray(np.broadcast_to(
                fg.geom.volume(), fg.shape_entire)[fg.int_slices])
            # centroid spacings for ghost prolongation: coarse region =
            # patch +/- rim; prolonged extent == the padded fine grid
            cxv = (cg.geom.xv1, cg.geom.xv2, cg.geom.xv3)
            fxv = (fg.geom.xv1, fg.geom.xv2, fg.geom.xv3)
            sp = []
            for d in range(3):
                if not self.active[d]:
                    sp.append(None)
                    continue
                ngc = cg.ng[d]
                lo = self.patch_lo[d]
                n = self.patch_n[d]
                rim = self.rim[d]
                xc = cxv[d][ngc + lo - rim: ngc + lo + n + rim]
                xf = fxv[d][fg.ng[d] - 2 * rim: fg.ng[d] + fg.nx[d] + 2 * rim]
                sp.append(centroid_spacings(xc, xf))
            self.ghost_spacings = tuple(sp)
            # face areas for flux correction
            self.areas_c = {d: self.hc.area[d] for d in self.hc.dims}
            self.areas_f = {d: self.hf.area[d] for d in self.hf.dims}
        self._step = jax.jit(self._build_step())
        self._dt = jax.jit(self._estimate_dt)

    # -- helpers --------------------------------------------------------
    def _patch_slices(self):
        """Coarse interior slices covered by the CURRENT fine patch
        ([z,y,x]); analysis-side helper (position after run())."""
        lo, n = self.patch_lo, self.patch_n
        return tuple(slice(lo[2 - i], lo[2 - i] + n[2 - i]) for i in range(3))

    def _fill_fine_ghosts(self, wf, wc, lo):
        """Pad fine prims; ghost zones from prolongated coarse prims."""
        fg, cg = self.fg, self.cg
        ngf = fg.ng
        # coarse region covering the fine patch + enough surround:
        # prolongating (patch + ceil(ng/2) coarse cells) of coarse data
        # gives a >= nghost fine-cell rim.  Patch position lo is TRACED.
        rim = self.rim
        n = self.patch_n
        starts = [0] * (wc.ndim - 3)
        sizes = list(wc.shape[:-3])
        for i in range(3):  # z, y, x ordering
            d = 2 - i
            if cg.nx[d] > 1:
                starts.append(lo[d] - rim[d])
                sizes.append(n[d] + 2 * rim[d])
            else:
                starts.append(0)
                sizes.append(1)
        starts = [jnp.asarray(v, jnp.int32) for v in starts]
        wc_region = jax.lax.dynamic_slice(wc, tuple(starts), tuple(sizes))
        fine_region = prolong_minmod(wc_region, self.active,
                                     spacings=self.ghost_spacings)
        # embed fine interior into the prolongated field
        pads = [(0, 0)] * (wf.ndim - 3) + [
            (ngf[2], ngf[2]), (ngf[1], ngf[1]), (ngf[0], ngf[0])]
        w_pad = jnp.pad(wf, pads, mode="edge")
        # offset of the fine padded array within fine_region coordinates
        offs = []
        for i in range(3):
            d = 2 - i
            offs.append(2 * rim[d] - ngf[d] if cg.nx[d] > 1 else 0)
        reg = fine_region[(Ellipsis,
                           *[slice(offs[i], offs[i] + w_pad.shape[-3 + i])
                             for i in range(3)])]
        s3 = slice(ngf[2], ngf[2] + self.fg.nx[2])
        s2 = slice(ngf[1], ngf[1] + self.fg.nx[1])
        s1 = slice(ngf[0], ngf[0] + self.fg.nx[0])
        return reg.at[..., s3, s2, s1].set(wf)

    def _flux_correct(self, fx_c, fx_f, lo):
        """Replace coarse patch-boundary fluxes with summed fine fluxes."""
        n = self.patch_n
        out = {}
        for d in self.hc.dims:
            Fc = fx_c[d][0]
            Ff = fx_f[d][0]
            # fine faces on the patch boundary along d: indices 0 and 2n_d
            # coarse faces: lo[d-1] and lo[d-1]+n[d-1] (interior-face index)
            # average fine face values over the transverse 2x2 (area-weighted
            # = plain mean in cartesian)
            for side in (0, 1):
                cidx = lo[d - 1] + side * n[d - 1]  # traced scalar
                fidx = side * 2 * n[d - 1]          # static
                f_face = jnp.take(Ff, fidx, axis=Ff.ndim - d)
                if self.curv:
                    # area-weighted: sum(F_f A_f children) / A_c at this face
                    af = jnp.asarray(np.take(self.areas_f[d], fidx,
                                             axis=self.areas_f[d].ndim - d))
                    ac_full = np.take(self.areas_c[d],
                                      self.patch_lo[d - 1] + side * n[d - 1],
                                      axis=self.areas_c[d].ndim - d)
                    f_face = f_face * af
                # restrict the fine face values over the transverse dims
                # (area-weighted sum / coarse area; plain mean in cartesian);
                # after take(), spatial axes remaining are the dims != d in
                # descending order (..., then x for d!=1, etc.)
                f_res = f_face
                rem_dims = [c for c in (3, 2, 1) if c != d]  # outer->inner
                for j, c in enumerate(rem_dims):
                    if not self.active[c - 1]:
                        continue
                    ax = f_res.ndim - 2 + j  # two trailing spatial axes
                    shp = list(f_res.shape)
                    shp[ax] //= 2
                    shp.insert(ax + 1, 2)
                    if self.curv:
                        f_res = f_res.reshape(shp).sum(axis=ax + 1)
                    else:
                        f_res = f_res.reshape(shp).mean(axis=ax + 1)
                if self.curv:
                    # coarse area at this face over the transverse patch
                    # extent (trailing two axes are rem_dims outer->inner)
                    acs = ac_full
                    sl = [slice(None)] * acs.ndim
                    for j, c in enumerate(rem_dims):
                        if self.active[c - 1]:
                            sl[acs.ndim - 2 + j] = slice(
                                self.patch_lo[c - 1],
                                self.patch_lo[c - 1] + n[c - 1])
                    f_res = f_res / jnp.asarray(np.ascontiguousarray(
                        acs[tuple(sl)]))
                # scatter into the coarse flux face over the patch extent
                # (traced patch position -> dynamic_update_slice)
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
                Fc = jax.lax.dynamic_update_slice(Fc, update, tuple(starts))
            out[d] = (Fc,) + fx_c[d][1:]
        return out

    # -- stepping -------------------------------------------------------
    def _stage(self, sc, sf, u1c, u1f, dt, stage, lo):
        integ = self.integ
        cfg = self.cfg
        gam0 = integ.gam0[stage - 1]
        gam1 = integ.gam1[stage - 1]
        bdt = integ.beta[stage - 1] * dt
        force_pcm = (integ.name == "vl2") and stage == 1

        uc, wc = sc
        uf, wf = sf
        wc_pad = bc_mod.pad_and_fill(wc, self.cg, "gas", {})
        wf_pad = self._fill_fine_ghosts(wf, wc, lo)
        fx_c = self.hc.compute_fluxes(wc_pad, cfg, force_pcm)
        fx_f = self.hf.compute_fluxes(wf_pad, cfg, force_pcm)
        fx_c = self._flux_correct(fx_c, fx_f, lo)

        uc = self.hc.apply_update(uc, u1c, fx_c, gam0, gam1, bdt)
        uc = self.hc.flux_source(uc, wc, fx_c, bdt)
        uf = self.hf.apply_update(uf, u1f, fx_f, gam0, gam1, bdt)
        uf = self.hf.flux_source(uf, wf, fx_f, bdt)

        uc = self.hc.set_auxiliary(uc, cfg)
        uf = self.hf.set_auxiliary(uf, cfg)

        # restrict fine cons onto the covered coarse cells (volume-weighted
        # in curvilinear geometry; plain average is exact in Cartesian)
        starts = [jnp.asarray(v, jnp.int32)
                  for v in [0] * (uc.ndim - 3) + [lo[2], lo[1], lo[0]]]
        uc = jax.lax.dynamic_update_slice(
            uc, restrict_average(uf, self.active, volf=self.volf),
            tuple(starts))

        wc = self.hc.cons_to_prim(uc, cfg)
        uc, wc = self.hc.prim_to_cons(wc, cfg)
        wf = self.hf.cons_to_prim(uf, cfg)
        uf, wf = self.hf.prim_to_cons(wf, cfg)
        return (uc, wc), (uf, wf)

    def _build_step(self):
        def step(sc, sf, dt, lo):
            u1c = sc[0]
            u1f = sf[0]
            for stage in range(1, self.integ.nstages + 1):
                sc, sf = self._stage(sc, sf, u1c, u1f, dt, stage, lo)
            return sc, sf

        return step

    def _estimate_dt(self, sc, sf):
        return jnp.minimum(self.hc.estimate_dt(sc[1], self.cfg),
                           self.hf.estimate_dt(sf[1], self.cfg))

    # -- public ---------------------------------------------------------
    def initialize(self, wc, wf):
        uc, wc = self.hc.prim_to_cons(jnp.asarray(wc), self.cfg)
        uf, wf = self.hf.prim_to_cons(jnp.asarray(wf), self.cfg)
        return (uc, wc), (uf, wf)

    def run(self, sc, sf, tlim, nlim=-1, criterion=None, retag_interval=10):
        """Advance to tlim.  With ``criterion`` (dict: field=density|pressure,
        type=gradient|magnitude, refine_thr, deref_thr) the fixed-shape fine
        patch is re-centered on the tagged region every ``retag_interval``
        cycles — the adaptive mode."""
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

    # -- adaptive retagging ---------------------------------------------
    def retag(self, sc, sf, lo, criterion):
        if self.curv:
            raise ValueError("adaptive patch moves are Cartesian-only "
                             "(curvilinear geometry weights are static)")
        """Re-center the fine patch on the refinement-tagged cells
        (ScalarFirstDerivative / ScalarMagnitude, amr_criteria.hpp;
        selection keys per gas.cpp:304-383).  Coarse cells under the old
        patch already hold the restricted fine solution, so a move only
        needs a fresh prolongation at the new position."""
        from .ops import refinement as ref_mod

        wc = np.asarray(sc[1])
        field = wc[:, 0] if criterion.get("field", "density") == "density" \
            else wc[:, 4]
        dims = [d for d in (1, 2, 3) if self.active[d - 1]]
        if criterion.get("type", "gradient") == "gradient":
            tags, _ = ref_mod.scalar_first_derivative(
                jnp.asarray(field), [1.0, 1.0, 1.0], dims,
                criterion["refine_thr"], criterion.get("deref_thr", 0.0))
        else:
            tags, _ = ref_mod.scalar_magnitude(
                jnp.asarray(field), criterion["refine_thr"],
                criterion.get("deref_thr", 0.0))
        tags = np.asarray(tags).any(axis=0)  # over species -> [z, y, x]
        if not tags.any():
            return sc, sf, lo
        idx = np.nonzero(tags)
        lo_np = np.asarray(lo)
        new_lo = list(int(v) for v in lo_np)
        for d in (1, 2, 3):
            if not self.active[d - 1]:
                continue
            ax = 3 - d
            c0, c1 = int(idx[ax].min()), int(idx[ax].max())
            want = (c0 + c1 + 1 - self.patch_n[d - 1]) // 2
            hi = self.cg.nx[d - 1] - self.patch_n[d - 1] - self.rim[d - 1]
            new_lo[d - 1] = int(np.clip(want, self.rim[d - 1], hi))
        if tuple(new_lo) == tuple(int(v) for v in lo_np):
            return sc, sf, lo
        # prolong the coarse window at the new position into a fresh fine state
        uc, wc_j = sc
        sl = tuple(slice(new_lo[2 - i], new_lo[2 - i] + self.patch_n[2 - i])
                   if self.active[2 - i] else slice(0, 1) for i in range(3))
        wf_new = prolong_minmod(wc_j[(Ellipsis, *sl)], self.active)
        uf_new, wf_new = self.hf.prim_to_cons(wf_new, self.cfg)
        return sc, (uf_new, wf_new), jnp.asarray(np.array(new_lo, dtype=np.int32))


class SMRDriver:
    """Driver-API adapter for deck-driven two-level refinement
    (<parthenon/mesh> refinement = adaptive | static, numlevel = 2;
    adaptive criterion from <gas> refine_field / refine_type / refine_thr /
    deref_thr, gas.cpp:304-383).

    Exposes the Driver surface used by ``evolve`` (host_coupled = True:
    stepping is python-paced; the per-step compute is the single compiled
    TwoLevelSMR step with the patch position traced).  The fine level lives
    inside the adapter; the evolve-visible state holds the coarse level
    (which carries the restricted fine solution everywhere under the patch,
    so outputs/restarts see the composite solution at coarse resolution;
    on restart the fine level is re-prolonged).
    """

    host_coupled = True
    diffusion = None
    sources = ()
    dust_cfg = None
    nbody = None

    def __init__(self, grid, integrator, gas_cfg, pin, fine_prims=None):
        self.gas_cfg = gas_cfg
        mode = pin.get_str("parthenon/mesh", "refinement")
        if mode not in ("adaptive", "static"):
            raise ValueError(f"refinement {mode!r} not recognized")
        numlevel = pin.get_or_add_int("parthenon/mesh", "numlevel", 2)
        if numlevel > 2:
            print("# artemis_tpu: two-level refinement scheme; "
                  f"numlevel={numlevel} treated as 2")
        self.grid = grid
        self.adaptive = mode == "adaptive"

        n = [max(4, grid.nx[d] // 2) if grid.nx[d] > 1 else 1 for d in range(3)]
        for d in range(3):
            key = f"patch_nx{d + 1}"
            if pin.exists("parthenon/refinement", key):
                n[d] = pin.get_int("parthenon/refinement", key)
        lo = [(grid.nx[d] - n[d]) // 2 if grid.nx[d] > 1 else 0 for d in range(3)]
        for d in range(3):
            key = f"patch_lo{d + 1}"
            if pin.exists("parthenon/refinement", key):
                lo[d] = pin.get_int("parthenon/refinement", key)

        self.smr = TwoLevelSMR(grid, integrator, gas_cfg, tuple(lo), tuple(n))
        self.hydro = self.smr.hc  # coarse-level Hydro (history/output volume)
        self.criterion = None
        if self.adaptive:
            field = pin.get_or_add_str("gas", "refine_field", "density")
            rtype = pin.get_or_add_str("gas", "refine_type", "gradient")
            self.criterion = dict(
                field=field, type=rtype,
                refine_thr=pin.get_real("gas", "refine_thr"),
                deref_thr=pin.get_or_add_real("gas", "deref_thr", 0.0))
        self.retag_interval = pin.get_or_add_int(
            "parthenon/refinement", "check_interval", 10)
        self._fine_prims = fine_prims     # fine-level IC (None -> prolong)
        self._sf = None
        self._lo = jnp.asarray(np.array(self.smr.patch_lo, dtype=np.int32))
        self._ncycle = 0

    # -- Driver API ------------------------------------------------------
    def initialize(self, state):
        wc = state["gas"]["w"]
        if self._fine_prims is not None:
            wf = jnp.asarray(self._fine_prims)
        else:
            sl = tuple(slice(self.smr.patch_lo[2 - i],
                             self.smr.patch_lo[2 - i] + self.smr.patch_n[2 - i])
                       if self.smr.active[2 - i] else slice(0, 1)
                       for i in range(3))
            wf = prolong_minmod(jnp.asarray(wc)[(Ellipsis, *sl)], self.smr.active)
        sc, sf = self.smr.initialize(wc, wf)
        self._sf = sf
        return {"gas": {"u": sc[0], "w": sc[1]}}

    def _ensure_fine(self, sc):
        """Post-restart: re-prolong the fine level from the coarse state."""
        if self._sf is None:
            sl = tuple(slice(self.smr.patch_lo[2 - i],
                             self.smr.patch_lo[2 - i] + self.smr.patch_n[2 - i])
                       if self.smr.active[2 - i] else slice(0, 1)
                       for i in range(3))
            wf = prolong_minmod(sc[1][(Ellipsis, *sl)], self.smr.active)
            self._sf = self.smr.hf.prim_to_cons(wf, self.smr.cfg)

    def step(self, state, dt, time):
        sc = (state["gas"]["u"], state["gas"]["w"])
        self._ensure_fine(sc)
        sc, self._sf = self.smr._step(sc, self._sf, jnp.asarray(dt), self._lo)
        self._ncycle += 1
        if (self.criterion is not None
                and self._ncycle % self.retag_interval == 0):
            sc, self._sf, self._lo = self.smr.retag(sc, self._sf, self._lo,
                                                    self.criterion)
            self.smr.patch_lo = tuple(int(v) for v in np.asarray(self._lo))
        return {"gas": {"u": sc[0], "w": sc[1]}}

    def estimate_dt(self, state):
        sc = (state["gas"]["u"], state["gas"]["w"])
        self._ensure_fine(sc)
        return self.smr._dt(sc, self._sf)
