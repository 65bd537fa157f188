"""Gas/dust hydrodynamics update machinery.

TPU-native rebuild of the reference hot path (SURVEY.md §3.2):
``CalculateFluxes -> ApplyUpdate -> FluxSource -> [external sources] ->
SetAuxillaryFields -> ConsToPrim -> BCs -> PrimToCons``, all as fused jnp
array passes over the ghost-padded global grid.  The reference's
runtime->template dispatch (fluid_fluxes.hpp:216-292) becomes trace-time
Python specialization; the Kokkos team sweeps become whole-array shifted
slices that XLA fuses into a handful of VPU kernels.

Component conventions (per species ``n``):
  gas  cons  u[:, 0:6] = (rho, m1, m2, m3, E, eint)     [m_i = rho v_i h_i]
  gas  prim  w[:, 0:6] = (rho, v1, v2, v3, p, sie)
  dust cons  u[:, 0:4] = (rho, m1, m2, m3)
  dust prim  w[:, 0:4] = (rho, v1, v2, v3)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..geometry import geometry as geo
from . import recon as recon_mod
from . import riemann as riemann_mod

BIG = 1.0e300


@dataclass(frozen=True)
class FluidCfg:
    fluid: str               # "gas" | "dust"
    recon: str               # pcm | plm | ppm
    rsolver: str             # hllc | hlle | llf
    gamma: float = 5.0 / 3.0
    cfl: float = 0.8
    dfloor: float = 1.0e-20
    siefloor: float = 1.0e-20
    de_switch: float = 0.0
    nspecies: int = 1


def _axslice(ndim: int, d: int, sl: slice):
    out = [slice(None)] * ndim
    out[-d] = sl
    return tuple(out)


class Hydro:
    """Precomputes geometry arrays for a Grid and exposes the stage ops.

    All members ending in ``_np`` are host numpy constants captured by jit.
    """

    def __init__(self, grid, gas: Optional[FluidCfg], dust: Optional[FluidCfg] = None):
        self.grid = grid
        self.gas = gas
        self.dust = dust
        g = grid.geom
        self.cartesian = geo.is_cartesian(grid.coords)
        self.dims = [d for d in (1, 2, 3) if grid.active(d)]
        self.ng = grid.ng

        # geometry constants -------------------------------------------------
        # interior slices in [z, y, x]
        self.s_int = grid.int_slices
        # cell volume over the entire grid (broadcastable)
        self.vol = g.volume()
        # face areas (entire, faces along d)
        self.area = {d: g.face_area(d) for d in (1, 2, 3)}
        # physical cell widths (entire)
        self.widths = g.cell_widths()
        # volume-averaged scale factors (broadcastable over entire grid)
        self.hxv = [g.hv(1), g.hv(2), g.hv(3)]
        # momentum-flux face scale factors: face_h[fdir][comp-1]
        self.face_h = (
            {fdir: [g.face_h(c, fdir) for c in (1, 2, 3)] for fdir in (1, 2, 3)}
            if not self.cartesian else None
        )
        # coordinate widths per axis (broadcastable, entire)
        one = np.ones((1,), np.float64)
        self.dxc = {
            1: g.dx1[None, None, :],
            2: g.dx2[None, :, None],
            3: g.dx3[:, None, None],
        }
        # connection terms broadcast (entire)
        self.conn1 = (  # {dh1dx1, dh2dx1, dh3dx1} along x1
            np.zeros_like(g.dh2dx1)[None, None, :],
            g.dh2dx1[None, None, :],
            g.dh3dx1[None, None, :],
        )
        self.conn2 = (  # {dh1dx2, dh2dx2, dh3dx2} along x2
            np.zeros_like(g.dh3dx2)[None, :, None],
            np.zeros_like(g.dh3dx2)[None, :, None],
            g.dh3dx2[None, :, None],
        )
        self.x1dep = geo.x1dep(grid.coords)
        self.x2dep = geo.x2dep(grid.coords) and grid.active(2)

    # ------------------------------------------------------------------
    def compute_fluxes(self, w, cfg: FluidCfg, force_pcm: bool):
        """Fluxes in all active directions.

        Returns dict d -> (F, pface, vface); arrays live on entire-grid
        faces along d (garbage near outer ghost edges, never consumed).
        """
        out = {}
        method = "pcm" if force_pcm else cfg.recon
        for d in self.dims:
            wl, wr = recon_mod.reconstruct(w, d, method, self.grid.geom)
            F, pF, vF = riemann_mod.solve(wl, wr, d, cfg.fluid, cfg.rsolver, cfg.gamma)
            if not self.cartesian:
                # scale momentum fluxes by h_c at the face centroid
                # (ScaleMomentumFlux, fluid_fluxes.hpp:32-70)
                scaled = [F[:, 1 + c] * jnp.asarray(self.face_h[d][c]) for c in range(3)]
                F = F.at[:, 1].set(scaled[0]).at[:, 2].set(scaled[1]).at[:, 3].set(scaled[2])
            out[d] = (F, pF, vF)
        return out

    def _face_diff(self, AF, d: int):
        """A(f)X(f) - A(f+1)X(f+1) on interior cells; AF lives on entire faces."""
        ng = {1: self.ng[0], 2: self.ng[1], 3: self.ng[2]}[d]
        n = {1: self.grid.nx[0], 2: self.grid.nx[1], 3: self.grid.nx[2]}[d]
        lo = AF[_axslice(AF.ndim, d, slice(ng, ng + n))]
        hi = AF[_axslice(AF.ndim, d, slice(ng + 1, ng + n + 1))]
        # restrict the other dims to the interior
        lo = self._other_interior(lo, d)
        hi = self._other_interior(hi, d)
        return lo - hi

    def _other_interior(self, arr, d: int):
        sl = [slice(None)] * arr.ndim
        s3, s2, s1 = self.s_int
        if d != 1:
            sl[-1] = s1
        if d != 2:
            sl[-2] = s2
        if d != 3:
            sl[-3] = s3
        return arr[tuple(sl)]

    def apply_update(self, u0, u1, fluxes, gam0, gam1, beta_dt):
        """Two-register RK blend + flux divergence on the interior
        (cf. ArtemisUtils::ApplyUpdate, artemis_integrator.hpp:56-110)."""
        s3, s2, s1 = self.s_int
        divf = 0.0
        for d in self.dims:
            F = fluxes[d][0]
            A = jnp.asarray(self.area[d])
            divf = divf + self._face_diff(A * F, d)
        vol_int = jnp.asarray(np.broadcast_to(self.vol, self.grid.shape_entire)[(s3, s2, s1)])
        u_int = gam0 * u0[..., s3, s2, s1] + gam1 * u1[..., s3, s2, s1] + divf * (beta_dt / vol_int)
        return u0.at[..., s3, s2, s1].set(u_int)

    def flux_source(self, u, w, fluxes, dt, omf: float = 0.0):
        """Pressure-gradient force, PdV work, and curvilinear connection
        sources (cf. FluxSourceImpl, fluid_fluxes.hpp:295-420).

        Gas only receives the pressure terms; both fluids receive the
        geometric sources.  Operates on interior cells of the cons array.
        """
        s3, s2, s1 = self.s_int
        is_gas = u.shape[1] == 6
        vol_int = np.broadcast_to(self.vol, self.grid.shape_entire)[(s3, s2, s1)]

        du = {}
        if is_gas:
            dmom = [0.0, 0.0, 0.0]
            deint = 0.0
            for d in self.dims:
                _, pF, vF = fluxes[d]
                ng = {1: self.ng[0], 2: self.ng[1], 3: self.ng[2]}[d]
                n = {1: self.grid.nx[0], 2: self.grid.nx[1], 3: self.grid.nx[2]}[d]
                sl_lo = _axslice(pF.ndim, d, slice(ng, ng + n))
                sl_hi = _axslice(pF.ndim, d, slice(ng + 1, ng + n + 1))
                plo = self._other_interior(pF[sl_lo], d)
                phi = self._other_interior(pF[sl_hi], d)
                dxd = np.broadcast_to(self.dxc[d], self.grid.shape_entire)[(s3, s2, s1)]
                dmom[d - 1] = dmom[d - 1] + dt / dxd * (plo - phi)
                AvF = jnp.asarray(self.area[d]) * vF
                avlo = self._other_interior(AvF[sl_lo], d)
                avhi = self._other_interior(AvF[sl_hi], d)
                deint = deint - dt / vol_int * 0.5 * (plo + phi) * (avhi - avlo)
            u = u.at[:, 1, s3, s2, s1].add(dmom[0])
            if self.grid.active(2):
                u = u.at[:, 2, s3, s2, s1].add(dmom[1])
            if self.grid.active(3):
                u = u.at[:, 3, s3, s2, s1].add(dmom[2])
            u = u.at[:, 5, s3, s2, s1].add(deint)

        # geometric (connection) sources
        if self.x1dep or self.x2dep:
            rho = w[:, 0, s3, s2, s1]
            vtot = []
            xv = self.grid.cell_centers()
            vrot = _rotation_velocity(self.grid, xv, omf)
            for c in range(3):
                vc = w[:, 1 + c, s3, s2, s1]
                vtot.append(vc + vrot[c] if vrot is not None else vc)
            rdt = rho * dt
            if self.x1dep:
                con = [np.broadcast_to(cc, self.grid.shape_entire)[(s3, s2, s1)]
                       for cc in self.conn1]
                src = rdt * (con[0] * vtot[0] ** 2 + con[1] * vtot[1] ** 2 + con[2] * vtot[2] ** 2)
                u = u.at[:, 1, s3, s2, s1].add(src)
            if self.x2dep:
                con = [np.broadcast_to(cc, self.grid.shape_entire)[(s3, s2, s1)]
                       for cc in self.conn2]
                src = rdt * (con[0] * vtot[0] ** 2 + con[1] * vtot[1] ** 2 + con[2] * vtot[2] ** 2)
                u = u.at[:, 2, s3, s2, s1].add(src)
        return u

    # ------------------------------------------------------------------
    def set_auxiliary(self, u, cfg: FluidCfg):
        """Dual-energy sync of the internal energy with the total energy
        (cf. SetAuxillaryFields, fill_derived.cpp:30-75)."""
        s3, s2, s1 = self.s_int
        rho = jnp.maximum(u[:, 0, s3, s2, s1], cfg.dfloor)
        hx = [jnp.asarray(np.broadcast_to(h, self.grid.shape_entire)[(s3, s2, s1)])
              for h in self.hxv]
        ke = 0.5 * ((u[:, 1, s3, s2, s1] / hx[0]) ** 2 +
                    (u[:, 2, s3, s2, s1] / hx[1]) ** 2 +
                    (u[:, 3, s3, s2, s1] / hx[2]) ** 2) / rho
        e_tot = u[:, 4, s3, s2, s1]
        ue = e_tot - ke
        sie = jnp.where(ue > cfg.de_switch * e_tot, ue / rho, u[:, 5, s3, s2, s1] / rho)
        sie = jnp.maximum(sie, cfg.siefloor)
        eint = jnp.maximum(sie * rho, cfg.siefloor * rho)
        return u.at[:, 5, s3, s2, s1].set(eint)

    def cons_to_prim(self, u, cfg: FluidCfg):
        """C2P with floors over the entire array (ghosts are overwritten by
        the BC fill right after; cf. ConsToPrim, fill_derived.cpp:82-167)."""
        rho_c = u[:, 0]
        rho = jnp.maximum(rho_c, cfg.dfloor)
        hx = [jnp.asarray(h) for h in self.hxv]
        v1 = u[:, 1] / (rho * hx[0])
        v2 = u[:, 2] / (rho * hx[1])
        v3 = u[:, 3] / (rho * hx[2])
        if cfg.fluid == "gas":
            sie = jnp.maximum(u[:, 5] / rho, cfg.siefloor)
            p = (cfg.gamma - 1.0) * rho * sie
            return jnp.stack([rho, v1, v2, v3, p, sie], axis=1)
        return jnp.stack([rho, v1, v2, v3], axis=1)

    def prim_to_cons(self, w, cfg: FluidCfg):
        """P2C over the entire array incl. ghosts — this is how BCs written
        in primitives become conserved (cf. PrimToCons, fill_derived.cpp:173-277).
        Also refreshes the primitive pressure from the EOS.
        Returns (u, w)."""
        rho = jnp.maximum(w[:, 0], cfg.dfloor)
        hx = [jnp.asarray(h) for h in self.hxv]
        v1, v2, v3 = w[:, 1], w[:, 2], w[:, 3]
        m1 = rho * v1 * hx[0]
        m2 = rho * v2 * hx[1]
        m3 = rho * v3 * hx[2]
        if cfg.fluid == "gas":
            sie = jnp.maximum(w[:, 5], cfg.siefloor)
            eint = sie * rho
            p = (cfg.gamma - 1.0) * rho * sie
            ke = 0.5 * rho * (v1 * v1 + v2 * v2 + v3 * v3)
            etot = eint + ke
            u = jnp.stack([rho, m1, m2, m3, etot, eint], axis=1)
            w = jnp.stack([rho, v1, v2, v3, p, sie], axis=1)
            return u, w
        u = jnp.stack([rho, m1, m2, m3], axis=1)
        w = jnp.stack([rho, v1, v2, v3], axis=1)
        return u, w

    # ------------------------------------------------------------------
    def estimate_dt(self, w, cfg: FluidCfg):
        """CFL timestep from primitive state (cf. Gas::EstimateTimestepMesh,
        gas.cpp:392-468; Dust::EstimateTimestepMesh, dust.cpp:238-276)."""
        s3, s2, s1 = self.s_int
        widths = [jnp.asarray(np.broadcast_to(wd, self.grid.shape_entire)[(s3, s2, s1)])
                  for wd in self.widths]
        rho = w[:, 0, s3, s2, s1]
        if cfg.fluid == "gas":
            sie = w[:, 5, s3, s2, s1]
            cs = jnp.sqrt(cfg.gamma * (cfg.gamma - 1.0) * sie)
        else:
            cs = 0.0
        denom = 0.0
        for d in self.dims:
            v = w[:, d, s3, s2, s1]
            denom = denom + (jnp.abs(v) + cs) / widths[d - 1]
        dt = jnp.min(1.0 / denom)
        return cfg.cfl * dt


def _rotation_velocity(grid, xv, omf: float):
    """RotatingFrame::RotationVelocity<GEOM> (rotating_frame_impl); zero
    vector when no rotating frame."""
    if omf == 0.0:
        return None
    x1, x2, x3 = xv
    c = grid.coords
    if geo.is_cartesian(c):
        # shearing-box handled separately; bulk rotation not defined
        return None
    if c == "cylindrical":
        return (0.0, omf * x1, 0.0)
    if c == "axisymmetric":
        return (0.0, 0.0, omf * x1)
    if c in ("spherical2D", "spherical3D"):
        return (0.0, 0.0, omf * x1 * jnp.sin(x2))
    if c == "spherical1D":
        return (0.0, 0.0, omf * x1)
    return None
