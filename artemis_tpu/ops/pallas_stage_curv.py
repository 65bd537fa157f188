"""Fused whole-stage Pallas kernel for CURVILINEAR gas hydro.

Extends the Cartesian whole-stage kernel (pallas_stage.py) to every
supported coordinate system — the production disk path.  All geometry
enters as per-axis 1-D coefficient arrays (the geometry module factorizes
exactly: volumes, face areas, scale factors, connection terms and Mignone
reconstruction coordinates are all outer products of 1-D axis factors,
geometry.py:230-345), so the kernel's HBM traffic stays at the state
arrays: coefficients are a few KB of VMEM-resident rows.

Covered stage ops (one VMEM pass; cf. the jnp sequence in
driver._stage_body):
  PLM_G/PCM reconstruction (Mignone 2013 coords)  [recon.py:75-95]
  HLLC + momentum-flux scale-factor scaling        [fluid_fluxes.hpp:32-70]
  two-register RK update with exact A/V factors    [artemis_integrator.hpp]
  pressure-gradient + PdV + connection sources     [fluid_fluxes.hpp:295-420]
  (full mode only) dual-energy + C2P/P2C floors    [fill_derived.cpp]

Two modes:
  full=True  — source-free runs: ends with aux/floors + prims + dtden
               (drop-in replacement for the whole stage).
  full=False — runs WITH external sources: returns the conserved state
               right after the flux sources, exactly where the jnp
               pipeline would hand off to gravity/drag/cooling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import geometry as geo
from .pallas_stage import rk_blend, rk_register_blocks
from .pallas_sweeps import RIEMANN

import os as _os

_TY_ENV = _os.environ.get("ARTEMIS_CURV_TY")
TY = int(_TY_ENV) if _TY_ENV else 32   # y rows per block
# preferred z planes per block: 16 (measured +5.5% over 8 on the v5e
# disk bench at the 126 MB scoped VMEM limit); grids whose nz is not a
# multiple fall back to 8-plane tiles
TZ = int(_os.environ.get("ARTEMIS_CURV_TZ", "16"))
# DMA'd y-slab rows (TY + 4 halo, rounded to the 8-row tiling)
YS = (TY + 4 + 7) // 8 * 8
_VMEM = int(_os.environ.get("ARTEMIS_CURV_VMEM_MB", "126")) * 1024 * 1024


def _pick_tz(nz: int) -> int:
    """Largest supported z tile dividing ``nz`` (preferred TZ, else 8)."""
    if nz % TZ == 0:
        return TZ
    return 8


def _pick_ty(nx: int) -> int:
    """y rows per block as a function of the lane (x) extent.  32 is the
    tuned v5e value up to 256-lane rows; at >= 512 lanes the fused stage
    body's live set doubles and Mosaic's register allocator spills
    ~150 MB of scoped VMEM (compile OOM) — 16 rows compiles and measures
    2.27e8 z-c/s on the 512x512x64 production root (tools/prof_shape.py).
    An explicit ARTEMIS_CURV_TY wins at every shape."""
    if _TY_ENV:
        return TY
    return 16 if nx >= 512 else TY


# ---------------------------------------------------------------------------
# coefficient packing: per-axis 1-D rows over the PADDED axis extents
# ---------------------------------------------------------------------------

def _axis_pack(grid, d):
    """Rows along axis d (padded extents), as a dict name -> 1-D f64 array.

    The reconstruction coordinate rows are shifted by xv[0]: the kernel only
    ever uses their DIFFERENCES (Mignone PLM), and the shift makes the rows
    of a uniformly-spaced axis identical across domain-decomposition shards
    (the sharded driver reuses one kernel program for every shard)."""
    g = grid.geom
    xv = {1: g.xv1, 2: g.xv2, 3: g.xv3}[d]
    xf = {1: g.xf1, 2: g.xf2, 3: g.xf3}[d]
    dx = {1: g.dx1, 2: g.dx2, 3: g.dx3}[d]
    n = len(xv)
    x0 = xv[0]
    rows = {
        "xv": xv - x0,
        "xf_lo": xf[:-1] - x0,
        "xf_hi": xf[1:] - x0,
        "dx": dx,
        "inv_dx": 1.0 / dx,
    }
    assert all(len(v) == n for v in rows.values())
    return rows


def _face_h_factors(grid, d):
    """Separable factors (f1[x1-extent], f2[x2-extent]) of the scale factor
    h_c at the lower-face centroids along direction d, for c = 1..3
    (cf. Geometry.face_h; hx(c,...) is separable in every system)."""
    g = grid.geom
    c = grid.coords
    if d == 1:
        x1 = g.xf1[:-1]          # lower face of each cell (cell-indexed)
        x2 = g.xv2
    elif d == 2:
        if geo.x1dep(c):
            rm, rp = g.xf1[:-1], g.xf1[1:]
            x1 = 2.0 / 3.0 * (rm * rm + rm * rp + rp * rp) / (rm + rp)
        else:
            x1 = g.xv1
        x2 = g.xf2[:-1]
    else:
        if geo.x1dep(c):
            rm, rp = g.xf1[:-1], g.xf1[1:]
            x1 = 2.0 / 3.0 * (rm * rm + rm * rp + rp * rp) / (rm + rp)
        else:
            x1 = g.xv1
        x2 = 0.5 * (g.xf2[:-1] + g.xf2[1:])
    out = []
    for comp in (1, 2, 3):
        # evaluate separably: f1 = h(x1, x2=ref)/h(ref), robust because every
        # hx is a product f(x1)*g(x2)
        h2d = g.hx(comp, x1[None, :], x2[:, None])  # [len(x2), len(x1)]
        f1 = h2d[0, :]
        g0 = np.where(np.abs(f1[0]) > 0, f1[0], 1.0)
        f2 = h2d[:, 0] / g0
        # verify separability (exact by construction)
        assert np.allclose(np.outer(f2, f1), h2d, rtol=1e-12, atol=1e-300)
        out.append((np.asarray(f1), np.asarray(f2)))
    return out


def _rf_bundle(grid):
    """Separable factorization of the rotating-frame conservative-torque
    ingredients (cf. sources._rf_weights / RFWeights): per direction and
    side, the flux weight is a 2-term separable sum
    w(i,j) = f1(i) g1(j) + f2(i) g2(j); plus phi-hat / R-hat basis rows and
    the cylindrical radius, all over the PADDED axis extents."""
    g = grid.geom
    c = grid.coords
    n1 = len(g.xv1)
    n2 = len(g.xv2)
    z1 = np.zeros(n1)
    z2 = np.zeros(n2)
    o1 = np.ones(n1)
    o2 = np.ones(n2)
    # weights[d] = (lo_terms, hi_terms); each terms = ((f1,g1),(f2,g2))
    zterm = ((z1, z2), (z1, z2))
    weights = {1: (zterm, zterm), 2: (zterm, zterm), 3: (zterm, zterm)}
    rm, rp = g.xf1[:-1], g.xf1[1:]
    if c in ("cylindrical", "axisymmetric"):
        ans = 0.5 * (rm + rp) * (rp - rm)
        t = ((ans, o2), (z1, z2))
        weights[1] = (t, t)
    elif c == "spherical1D":
        rv = g.xv1
        weights[1] = ((((rv**2 - rm**2), o2), (z1, z2)),
                      (((rp**2 - rv**2), o2), (z1, z2)))
    elif c in ("spherical2D", "spherical3D"):
        rv = g.xv1
        stv2 = np.sin(g.xv2) ** 2
        weights[1] = (
            (((rv**2 - rm**2), stv2), (z1, z2)),
            (((rp**2 - rv**2), stv2), (z1, z2)))
        rface = 2.0 / 3.0 * (rm**2 + rm * rp + rp**2) / (rm + rp)
        stm2 = np.sin(g.xf2[:-1]) ** 2
        stp2 = np.sin(g.xf2[1:]) ** 2
        weights[2] = (
            ((rv**2, stv2), (-rface**2, stm2)),
            ((-rv**2, stv2), (rface**2, stp2)))
    # basis rows (phi-hat / R-hat / z-hat components of the problem basis)
    # and Rcyl
    if c in ("cylindrical",):
        phihat = [(z1, z2), (o1, o2), (z1, z2)]
        rhat = [(o1, o2), (z1, z2), (z1, z2)]
        zhat = [(z1, z2), (z1, z2), (o1, o2)]
        Rcyl = (g.xv1, o2)
    elif c == "axisymmetric":
        phihat = [(z1, z2), (z1, z2), (o1, o2)]
        rhat = [(o1, o2), (z1, z2), (z1, z2)]
        zhat = [(z1, z2), (o1, o2), (z1, z2)]
        Rcyl = (g.xv1, o2)
    elif c == "spherical1D":
        phihat = [(z1, z2), (z1, z2), (o1, o2)]
        rhat = [(o1, o2), (z1, z2), (z1, z2)]
        zhat = [(z1, z2), (z1, z2), (z1, z2)]
        Rcyl = (g.xv1, o2)
    elif c in ("spherical2D", "spherical3D"):
        phihat = [(z1, z2), (z1, z2), (o1, o2)]
        rhat = [(o1, np.sin(g.xv2)), (o1, np.cos(g.xv2)), (z1, z2)]
        zhat = [(o1, np.cos(g.xv2)), (o1, -np.sin(g.xv2)), (z1, z2)]
        Rcyl = (g.xv1, np.sin(g.xv2))
    else:
        phihat = [(z1, z2)] * 3
        rhat = [(z1, z2)] * 3
        zhat = [(z1, z2)] * 3
        Rcyl = (z1, z2)
    return weights, phihat, rhat, zhat, Rcyl


def _rotation_factors(grid, omf):
    """Separable (f1, f2) factors of the rotation velocity component per
    coordinate direction (RotatingFrame::RotationVelocity)."""
    g = grid.geom
    c = grid.coords
    n1, n2 = len(g.xv1), len(g.xv2)
    zero = (np.zeros(n1), np.zeros(n2))
    one2 = np.ones(n2)
    if omf == 0.0 or geo.is_cartesian(c):
        return [zero, zero, zero]
    if c == "cylindrical" or c == "spherical1D":
        return [zero, (omf * g.xv1, one2), zero]
    if geo.is_spherical(c):
        return [zero, zero, (omf * g.xv1, np.sin(g.xv2))] \
            if c in ("spherical2D", "spherical3D") else [zero, zero, zero]
    if c == "axisymmetric":
        return [zero, zero, (omf * g.xv1, one2)]
    return [zero, zero, zero]


def _delta_rows(xv, two_sided: bool):
    """|x_i - x_{i-1}| (face-indexed at cell i) or |x_{i+1} - x_{i-1}|
    (cell-centered, two_sided) rows; edge entries cloned (never used at
    valid faces, mirrors the jnp path's np.roll wrap garbage)."""
    d = np.empty_like(xv)
    if two_sided:
        d[1:-1] = xv[2:] - xv[:-2]
        d[0], d[-1] = d[1], d[-2]
    else:
        d[1:] = xv[1:] - xv[:-1]
        d[0] = d[1]
    return np.abs(d)


def _dist_factors(grid, d: int, two_sided: bool):
    """Separable (f1, f2, f3) per-axis rows of the physical distance between
    neighbor centroids along axis d (chord distances; exactly the Cartesian
    centroid-to-centroid norms the jnp Diffusion computes, diffusion.py)."""
    g = grid.geom
    c = grid.coords
    o1 = np.ones_like(g.xv1)
    o2 = np.ones_like(g.xv2)
    o3 = np.ones_like(g.xv3)
    xv = {1: g.xv1, 2: g.xv2, 3: g.xv3}[d]
    dlin = _delta_rows(xv, two_sided)
    dang = 2.0 * np.sin(0.5 * dlin)  # chord of an angular separation
    f1, f2, f3 = o1, o2, o3
    if d == 1:
        f1 = dlin
    elif d == 2:
        if c == "cylindrical":                      # x2 = phi
            f1, f2 = g.xv1, dang
        elif geo.is_spherical(c):                   # x2 = theta
            f1, f2 = g.xv1, dang
        else:                                        # axisymmetric x2 = z
            f2 = dlin
    else:
        if c == "cylindrical":                       # x3 = z
            f3 = dlin
        elif geo.is_spherical(c):                    # x3 = phi
            f1, f2, f3 = g.xv1, np.sin(g.xv2), dang
        elif c == "axisymmetric":                    # x3 = phi
            f1, f3 = g.xv1, dang
        else:
            f3 = dlin
    return np.asarray(f1), np.asarray(f2), np.asarray(f3)


def _zcart_factors(grid):
    """Separable (f1, f2, f3) rows of the Cartesian z coordinate (for the
    spherical radius used by alpha viscosity: r^2 = Rcyl^2 + z^2)."""
    g = grid.geom
    c = grid.coords
    o1 = np.ones_like(g.xv1)
    o2 = np.ones_like(g.xv2)
    o3 = np.ones_like(g.xv3)
    z1 = np.zeros_like(g.xv1)
    if geo.is_spherical(c):
        return g.xv1, np.cos(g.xv2) if geo.x2dep(c) else o2 * 0.0, o3
    if c == "cylindrical":
        return o1, o2, g.xv3
    if c == "axisymmetric":
        return o1, g.xv2, o3
    return z1, o2, o3


# viscosity/conduction models the fused kernel can evaluate from separable
# coefficient rows (DiffusionCoeff<...>, diffusion_coeff.hpp)
_DIFF_KINDS = ("viscosity_plaw", "viscosity_alpha", "conductivity_plaw",
               "thermaldiff_plaw")


def _dp_tuple(dp):
    """Flatten DiffParams into the static tuple the kernel closes over:
    (kind, avg, a, b, c, d, e, f) with per-kind slot meanings (see
    mu_model in the kernel)."""
    if dp is None:
        return None
    if dp.kind == "viscosity_plaw":
        return (dp.kind, dp.avg, dp.nu_s, dp.eta, dp.r_exp, dp.R0, 0.0, 0.0)
    if dp.kind == "viscosity_alpha":
        return (dp.kind, dp.avg, dp.alpha, dp.eta, dp.R0, dp.Omega0, 0.0, 0.0)
    coef = dp.hcond_0 if dp.kind == "conductivity_plaw" else dp.kappa_0
    return (dp.kind, dp.avg, coef, 0.0, dp.temp_exp, dp.rho_exp, dp.T0, dp.d0)


class CurvCoeffs:
    """Per-grid coefficient bundle for the curvilinear stage kernel."""

    def __init__(self, grid, omf: float, dtype=np.float32, diff=None):
        g = grid.geom
        c = grid.coords
        self.coords = c
        ax = {d: _axis_pack(grid, d) for d in (1, 2, 3)}
        ng = grid.ng

        def cells(d, row):
            return ax[d][row]

        # --- per-direction update factors A_d/V split per axis ----------
        # d=1: face factor area1_f1(xf1)/..., cell transverse factors
        self.upd = {}
        vol = {1: g.vol1, 2: g.vol2, 3: g.vol3}
        areas = {
            1: (g.area1_f1, g.area1_c2, g.area1_c3),
            2: (g.area2_f2, g.area2_c1, g.area2_c3),
            3: (g.area3_f3, g.area3_c1, g.area3_c2),
        }
        for d in (1, 2, 3):
            af, cA, cB = areas[d]
            # face factor (indexed by lower-face of each cell, length n_d;
            # the upper face of the last interior cell is reachable because
            # the padded extent carries ghost cells beyond it)
            self.upd[d] = {
                "face": af,                # length n_d + 1
                "inv_vol_d": 1.0 / vol[d],
            }
            # transverse: cA/cB divided by the matching vol factors
            if d == 1:
                self.upd[d]["t2"] = cA / vol[2]
                self.upd[d]["t3"] = cB / vol[3]
            elif d == 2:
                self.upd[d]["t1"] = cA / vol[1]
                self.upd[d]["t3"] = cB / vol[3]
            else:
                self.upd[d]["t1"] = cA / vol[1]
                self.upd[d]["t2"] = cB / vol[2]

        self.recon = {d: (cells(d, "xv"), cells(d, "xf_lo"),
                          cells(d, "xf_hi"), cells(d, "dx")) for d in (1, 2, 3)}
        self.inv_dxc = {d: cells(d, "inv_dx") for d in (1, 2, 3)}
        self.face_h = {d: _face_h_factors(grid, d) for d in (1, 2, 3)}
        # hv factors (volume-averaged scale factors per component)
        self.hv = [(g.h1v_1, g.h1v_2), (g.h2v_1, g.h2v_2), (g.h3v_1, g.h3v_2)]
        # connection rows
        self.conn1 = (np.zeros_like(g.dh2dx1), g.dh2dx1, g.dh3dx1)  # x1 rows
        self.conn2 = g.dh3dx2                                        # x2 row
        self.x1dep = geo.x1dep(c)
        self.x2dep = geo.x2dep(c) and grid.nx[1] > 1
        self.vrot = _rotation_factors(grid, omf)
        self.rf = _rf_bundle(grid)
        # physical widths for the CFL denominator: w_d = dx_d * h_d(xv)
        hvx = lambda comp: g.hx(comp, g.xv1[None, :], g.xv2[:, None])
        self.inv_w = {}
        for d in (1, 2, 3):
            h2d = hvx(d)  # [n2, n1]
            f1 = h2d[0, :]
            f2 = h2d[:, 0] / np.where(np.abs(f1[0]) > 0, f1[0], 1.0)
            if d == 1:
                self.inv_w[d] = (1.0 / (g.dx1 * f1), 1.0 / f2)
            elif d == 2:
                self.inv_w[d] = (1.0 / f1, 1.0 / (g.dx2 * f2))
            else:
                # h3 separable f1(x1) f2(x2); width = dx3 * f1 * f2: store
                # per-x1 and per-x2 inverse factors; dx3 handled separately
                self.inv_w[d] = (1.0 / f1, 1.0 / f2)
        self.dx3 = g.dx3
        self.dtype = dtype
        self.zc = _zcart_factors(grid)  # cartesian z rows (rsph, gravity)
        # raw padded cell-center coordinates (NOT the shifted recon rows):
        # the Cartesian xyz gravity mode needs absolute positions
        self.xyzc = (g.xv1, g.xv2, g.xv3)
        # --- fused diffusion (viscosity/conduction) coefficient rows -----
        self.diff = None
        if diff is not None:
            if geo.is_cartesian(c):
                # the coefficient models factor through the cylindrical
                # radius, which is NOT (x)*(y)-separable on a Cartesian
                # grid (Rcyl rows above are zeros there) — raise so the
                # Driver falls back to the jnp diffusion pass
                raise ValueError("fused diffusion rows are not separable "
                                 "on Cartesian grids")
            for dp in (diff.visc, diff.cond):
                if dp is not None and dp.kind not in _DIFF_KINDS:
                    raise ValueError(f"unsupported diffusion kind {dp.kind}")
            self.diff = diff
            self.dims = [d for d in (1, 2, 3) if grid.active(d)]
            self.dist1 = {d: _dist_factors(grid, d, False) for d in self.dims}
            self.dist2 = {d: _dist_factors(grid, d, True) for d in self.dims}

    def pack(self):
        """Pack every row into three matrices CX [*, n1], CY [*, n2],
        CZ [*, n3] (f32) + an index map."""
        rows_x, rows_y, rows_z = [], [], []
        ix = {}
        # raw-coordinate rows exist only for the Cartesian xyz gravity
        # mode; on curvilinear grids they would also break the sharded
        # rows-identical-across-shards reuse check (absolute coordinates
        # are not translation-invariant)
        cart_rows = geo.is_cartesian(self.coords)

        def add(rows, key, arr):
            rows.append(np.asarray(arr, self.dtype))
            return len(rows) - 1

        # X rows
        for d in (1, 2, 3):
            if d == 1:
                xv, xlo, xhi, dx = self.recon[1]
                ix["recon1"] = tuple(add(rows_x, None, a)
                                     for a in (xv, xlo, xhi, dx))
                ix["upd1_face"] = add(rows_x, None, self.upd[1]["face"][:-1])
                ix["upd1_facep"] = add(rows_x, None, self.upd[1]["face"][1:])
                ix["upd1_iv"] = add(rows_x, None, self.upd[1]["inv_vol_d"])
                ix["idx1"] = add(rows_x, None, self.inv_dxc[1])
            ix[f"upd{d}_t1"] = add(rows_x, None, self.upd[d].get(
                "t1", np.ones_like(self.recon[1][0])))
            ix[f"fh{d}_1"] = tuple(add(rows_x, None, self.face_h[d][cmp][0])
                                   for cmp in range(3))
        ix["hv_1"] = tuple(add(rows_x, None, self.hv[cmp][0]) for cmp in range(3))
        ix["conn1"] = tuple(add(rows_x, None, a) for a in self.conn1)
        ix["vrot_1"] = tuple(add(rows_x, None, self.vrot[cmp][0])
                             for cmp in range(3))
        ix["invw_1"] = tuple(add(rows_x, None, self.inv_w[d][0])
                             for d in (1, 2, 3))
        weights, phihat, rhat, zhat, Rcyl = self.rf
        for d in (1, 2, 3):
            lo_t, hi_t = weights[d]
            ix[f"rfw{d}_lo_1"] = tuple(add(rows_x, None, t[0]) for t in lo_t)
            ix[f"rfw{d}_hi_1"] = tuple(add(rows_x, None, t[0]) for t in hi_t)
        ix["phihat_1"] = tuple(add(rows_x, None, phihat[c][0]) for c in range(3))
        ix["rhat_1"] = tuple(add(rows_x, None, rhat[c][0]) for c in range(3))
        ix["zhat_1"] = tuple(add(rows_x, None, zhat[c][0]) for c in range(3))
        ix["rcyl_1"] = add(rows_x, None, Rcyl[0])
        ix["zc_1"] = add(rows_x, None, self.zc[0])
        if cart_rows:
            ix["gx_1"] = add(rows_x, None, self.xyzc[0])

        # Y rows
        xv, xlo, xhi, dx = self.recon[2]
        ix["recon2"] = tuple(add(rows_y, None, a) for a in (xv, xlo, xhi, dx))
        ix["upd2_face"] = add(rows_y, None, self.upd[2]["face"][:-1])
        ix["upd2_facep"] = add(rows_y, None, self.upd[2]["face"][1:])
        ix["upd2_iv"] = add(rows_y, None, self.upd[2]["inv_vol_d"])
        ix["idx2"] = add(rows_y, None, self.inv_dxc[2])
        for d in (1, 3):
            ix[f"upd{d}_t2"] = add(rows_y, None, self.upd[d]["t2"])
        for d in (1, 2, 3):
            ix[f"fh{d}_2"] = tuple(add(rows_y, None, self.face_h[d][cmp][1])
                                   for cmp in range(3))
        ix["hv_2"] = tuple(add(rows_y, None, self.hv[cmp][1]) for cmp in range(3))
        ix["conn2"] = add(rows_y, None, self.conn2)
        ix["vrot_2"] = tuple(add(rows_y, None, self.vrot[cmp][1])
                             for cmp in range(3))
        ix["invw_2"] = tuple(add(rows_y, None, self.inv_w[d][1])
                             for d in (1, 2, 3))
        weights, phihat, rhat, zhat, Rcyl = self.rf
        for d in (1, 2, 3):
            lo_t, hi_t = weights[d]
            ix[f"rfw{d}_lo_2"] = tuple(add(rows_y, None, t[1]) for t in lo_t)
            ix[f"rfw{d}_hi_2"] = tuple(add(rows_y, None, t[1]) for t in hi_t)
        ix["phihat_2"] = tuple(add(rows_y, None, phihat[c][1]) for c in range(3))
        ix["rhat_2"] = tuple(add(rows_y, None, rhat[c][1]) for c in range(3))
        ix["zhat_2"] = tuple(add(rows_y, None, zhat[c][1]) for c in range(3))
        ix["rcyl_2"] = add(rows_y, None, Rcyl[1])
        ix["zc_2"] = add(rows_y, None, self.zc[1])
        if cart_rows:
            ix["gy_2"] = add(rows_y, None, self.xyzc[1])

        # Z rows
        xv, xlo, xhi, dx = self.recon[3]
        ix["recon3"] = tuple(add(rows_z, None, a) for a in (xv, xlo, xhi, dx))
        ix["upd3_face"] = add(rows_z, None, self.upd[3]["face"][:-1])
        ix["upd3_facep"] = add(rows_z, None, self.upd[3]["face"][1:])
        ix["upd3_iv"] = add(rows_z, None, self.upd[3]["inv_vol_d"])
        ix["idx3"] = add(rows_z, None, self.inv_dxc[3])
        for d in (1, 2):
            ix[f"upd{d}_t3"] = add(rows_z, None, self.upd[d]["t3"])
        ix["inv_dx3"] = add(rows_z, None, 1.0 / self.dx3)
        ix["zc_3"] = add(rows_z, None, self.zc[2])
        if cart_rows:
            ix["gz_3"] = add(rows_z, None, self.xyzc[2])

        # diffusion rows (distance chords)
        if self.diff is not None:
            for d in self.dims:
                for nm, bundle in (("d1", self.dist1), ("d2", self.dist2)):
                    f1, f2, f3 = bundle[d]
                    ix[f"{nm}_{d}_1"] = add(rows_x, None, f1)
                    ix[f"{nm}_{d}_2"] = add(rows_y, None, f2)
                    ix[f"{nm}_{d}_3"] = add(rows_z, None, f3)

        CX = np.stack(rows_x)
        CY = np.stack(rows_y)
        CZ = np.stack(rows_z)
        return CX, CY, CZ, ix


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _plm_g(q, axis, lo, count, xv, xlo, xhi, dx, pcm, uniform=False):
    """Mignone PLM L/R face states along ``axis`` for faces [lo, lo+count);
    the coordinate rows are 1-D jnp arrays aligned with q's axis extent.
    ``uniform=True`` (Cartesian grids) uses the uniform-limiter PLM
    (plm.hpp:31-47 form, matching ops/recon.py plm_uniform op-for-op) —
    algebraically the Mignone limiter's uniform-spacing reduction, minus
    the coordinate-ratio arithmetic."""

    def sl(a, start, num):
        s = [slice(None)] * a.ndim
        s[axis] = slice(start, start + num)
        return a[tuple(s)]

    def rsl(r, start, num):
        return r[start:start + num]

    def bc(r):
        # broadcast shape from ``axis`` to the end only: Mosaic cannot
        # reshape a 1-D vector to rank 4, and leading singleton dims are
        # supplied by broadcasting anyway
        shp = [1] * (q.ndim - axis)
        shp[0] = -1
        return r.reshape(shp)

    if pcm:
        return sl(q, lo - 1, count), sl(q, lo, count)
    n = q.shape[axis]
    qm = sl(q, 0, n - 2)
    q0 = sl(q, 1, n - 2)
    qp = sl(q, 2, n - 2)
    if uniform:
        dql = q0 - qm
        dqr = qp - q0
        dq2 = dql * dqr
        denom = jnp.where(dq2 > 0.0, dql + dqr, 1.0)
        dqm_ = jnp.where(dq2 > 0.0, dq2 / denom, 0.0)
        ql = q0 + dqm_
        qr = q0 - dqm_
        return sl(ql, lo - 2, count), sl(qr, lo - 1, count)
    xvm = bc(rsl(xv, 0, n - 2))
    xv0 = bc(rsl(xv, 1, n - 2))
    xvp = bc(rsl(xv, 2, n - 2))
    dx0 = bc(rsl(dx, 1, n - 2))
    xlo0 = bc(rsl(xlo, 1, n - 2))
    xhi0 = bc(rsl(xhi, 1, n - 2))
    # all coordinate ratios are row-level (1-D) arithmetic on rows already
    # resident in VMEM; keeping the divisions out of the tile-wide ops
    # replaces 4 broadcast tile divisions per call with tile multiplies
    rl = dx0 / (xv0 - xvm)
    rr = dx0 / (xvp - xv0)
    dql = (q0 - qm) * rl
    dqr = (qp - q0) * rr
    dq2 = dql * dqr
    cr = (xvp - xv0) / (xhi0 - xv0)
    cl = (xv0 - xvm) / (xv0 - xlo0)
    denom = dql * dql + dqr * dqr + dq2 * (cl + cr - 2.0)
    denom = jnp.where(dq2 > 0.0, denom, 1.0)
    dqm_ = jnp.where(dq2 > 0.0, dq2 * (cr * dql + cl * dqr) / denom, 0.0)
    fl = (xhi0 - xv0) / dx0
    fr = (xv0 - xlo0) / dx0
    ql = q0 + dqm_ * fl
    qr = q0 - dqm_ * fr
    # cells 1..n-2 hold ql/qr at index cell-1; face f: wl=ql[f-2], wr=qr[f-1]
    return sl(ql, lo - 2, count), sl(qr, lo - 1, count)


def _uniform_dxs(grid, coeffs):
    """Static (dx1, dx2, dx3) cell sizes when the grid is uniform
    Cartesian (the lean-body precondition), else None."""
    if not geo.is_cartesian(coeffs.coords):
        return None
    import numpy as _np

    g = grid.geom
    out = []
    for xf in (g.xf1, g.xf2, g.xf3):
        d = _np.diff(_np.asarray(xf, _np.float64))
        if d.size == 0:
            out.append(1.0)
            continue
        if not _np.allclose(d, d[0], rtol=1e-12, atol=0.0):
            return None
        out.append(float(d[0]))
    return tuple(out)


def _stage_kernel_curv(bdt_ref, gdt_ref, u0_ref, u1_ref, wp_hbm, cx_ref,
                       cyw_ref, czw_ref, u_ref, w_ref, dm_ref, scratch, sem,
                       *, ng, nx, tz, ty, active_z, pcm, gamma, gam0, gam1,
                       dfloor, siefloor, de_switch, ix, full, x1dep, x2dep,
                       has_rot, rf_omega, rsolver="hllc", diff=None, cv=1.5,
                       grav=None, cart=False, dxs=None):
    """Padded-array frontend: each block DMAs its ghost-filled slab."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    zsz = tz + 4 if active_z else 1
    ys = (ty + 4 + 7) // 8 * 8
    dma = pltpu.make_async_copy(
        wp_hbm.at[:, pl.ds(i * tz, zsz), pl.ds(j * ty, ys), :],
        scratch, sem)
    dma.start()
    bdt = bdt_ref[0]
    dma.wait()
    s = scratch[...][:, :, :ty + 4]       # [6, zsz, ty+4, xp]
    _curv_body(s, bdt, gdt_ref, u0_ref, u1_ref, cx_ref, cyw_ref, czw_ref,
               u_ref, w_ref, dm_ref, ng=ng, nx=nx, tz=tz, ty=ty,
               active_z=active_z, pcm=pcm, gamma=gamma, gam0=gam0, gam1=gam1,
               dfloor=dfloor, siefloor=siefloor, de_switch=de_switch, ix=ix,
               full=full, x1dep=x1dep, x2dep=x2dep, has_rot=has_rot,
               rf_omega=rf_omega, rsolver=rsolver, diff=diff, cv=cv,
               grav=grav, cart=cart, dxs=dxs)


def _curv_body(s, bdt, gdt_ref, u0_ref, u1_ref, cx_ref, cyw_ref, czw_ref,
               u_ref, w_ref, dm_ref, *, ng, nx, tz, ty, active_z, pcm, gamma,
               gam0, gam1, dfloor, siefloor, de_switch, ix, full, x1dep,
               x2dep, has_rot, rf_omega, rsolver, diff, cv, grav,
               cart=False, dxs=None, sdx_ref=None, lead=False):
    """The fused stage math on an assembled VMEM slab ``s``
    ([6, zsz, ty+4, >=nx+2ng]; ``lead=True``: node-batched kernel —
    grid is (node, z, y) and every coefficient/register block and the
    dmax output carry a leading node axis).

    ``dxs`` (static (dx1, dx2, dx3) floats) marks a UNIFORM Cartesian
    grid: every geometry coefficient row degenerates to a constant, so
    the update/PdV/C2P/CFL arithmetic uses compile-time scalars instead
    of broadcast row products (the lean Cartesian body; only the folded
    point-gravity still reads coordinate rows).  Algebraically identical
    to the row path (A_d/V = 1/dx_d on uniform Cartesian grids).
    ``sdx_ref`` is the node-batched equivalent: an SMEM [N, 3] array of
    RECIPROCAL cell sizes (per-node dx differs across tree levels, so
    the lean scalars ride SMEM instead of the compile-time constants)."""
    i = pl.program_id(1 if lead else 0)
    j = pl.program_id(2 if lead else 1)
    lean = (cart and (dxs is not None or sdx_ref is not None)
            and diff is None and rf_omega == 0.0)
    zsz = tz + 4 if active_z else 1
    CX = cx_ref[...][0] if lead else cx_ref[...]

    # --- coefficient row windows -------------------------------------
    # X rows: full padded extent (static slices)
    def rx(k):
        return CX[k]

    # Y/Z rows arrive pre-windowed per block via BlockSpec (cyw/czw hold
    # the [ty+4]/[tz+4] window of every row for this block) so all
    # in-kernel slices are static — Mosaic cannot lower dynamic unaligned
    # lane-offset loads.
    def ry_pad(k):
        return cyw_ref[0, 0, k] if lead else cyw_ref[0, k]

    def ry(k):
        return cyw_ref[0, 0, k, 2:2 + ty] if lead \
            else cyw_ref[0, k, 2:2 + ty]

    # Z rows load as 2-D (n, 1) — the trailing singleton is stored in the
    # packed array because Mosaic cannot relayout a 1-D lane vector into the
    # sublane/implicit dims ((n,) -> (n,1,1) reshape fails; (n,1) -> (n,1,1)
    # is supported)
    def rz_pad(k):
        return czw_ref[0, 0, k] if lead else czw_ref[0, k]

    def rz(k):
        if lead:
            return czw_ref[0, 0, k, 2:2 + tz] if active_z \
                else czw_ref[0, 0, k, 0:1]
        if not active_z:
            return czw_ref[0, k, 0:1]
        return czw_ref[0, k, 2:2 + tz]

    Z = tz if active_z else 1

    def b1(r):      # x row -> [1,1,len]
        return r.reshape(1, 1, -1)

    def b2(r):      # y row -> [1,len,1]
        return r.reshape(1, -1, 1)

    def b3(r):      # z row -> [len,1,1]
        return r.reshape(-1, 1, 1)

    def hllc6(wl, wr, d):
        ivx = d
        ivy = (d % 3) + 1
        ivz = ((d + 1) % 3) + 1
        return RIEMANN[rsolver](tuple(wl[c] for c in range(6)),
                                tuple(wr[c] for c in range(6)),
                                ivx, ivy, ivz, gamma)

    zc = slice(2, 2 + Z) if active_z else slice(0, 1)

    def ax(a, axis, s0, s1):
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(s0, s1)
        return a[tuple(sl)]

    # ---- X sweep -----------------------------------------------------
    # metric-independent axes (x1dep/x2dep traits; x3 always) reduce the
    # Mignone limiter to the uniform-spacing PLM on these uniformly
    # spaced meshes — mirrors ops/recon.py reconstruct's selection so the
    # kernel stays bit-equal to the jnp path
    wx = s[:, zc, 2:2 + ty, :]
    xv, xlo, xhi, dxr = (rx(k) for k in ix["recon1"])
    wl, wr = _plm_g(wx, 3, ng, nx + 1, xv, xlo, xhi, dxr, pcm,
                    uniform=not x1dep)
    Fx, pfx, vfx = hllc6(wl, wr, 1)
    # momentum-flux scaling at x faces: fh = f1(face) * f2(ycell)
    # (unit rows on Cartesian grids -- skipped there)
    if not cart:
        f2y = {c: b2(ry(ix[f"fh1_2"][c])) for c in range(3)}
        for c in range(3):
            f1 = rx(ix["fh1_1"][c])  # lower-face cell-indexed: face f -> [f]
            fh = b1(f1[ng:ng + nx + 1]) * f2y[c]
            Fx[1 + c] = Fx[1 + c] * fh

    # ---- Y sweep -----------------------------------------------------
    wy = s[:, zc, :, ng:ng + nx]
    yv, ylo, yhi, dyr = (ry_pad(k) for k in ix["recon2"])
    wl, wr = _plm_g(wy, 2, 2, ty + 1, yv, ylo, yhi, dyr, pcm,
                    uniform=not x2dep)
    Fy, pfy, vfy = hllc6(wl, wr, 2)
    if not cart:
        for c in range(3):
            f1 = b1(rx(ix[f"fh2_1"][c])[ng:ng + nx])
            f2full = (cyw_ref[0, 0, ix[f"fh2_2"][c], 2:2 + ty + 1]
                      if lead
                      else cyw_ref[0, ix[f"fh2_2"][c], 2:2 + ty + 1])
            Fy[1 + c] = Fy[1 + c] * (f2full.reshape(1, -1, 1) * f1)

    # ---- Z sweep -----------------------------------------------------
    if active_z:
        wz = s[:, :, 2:2 + ty, ng:ng + nx]
        zv, zlo, zhi, dzr = (rz_pad(k) for k in ix["recon3"])
        wl, wr = _plm_g(wz, 1, 2, tz + 1, zv, zlo, zhi, dzr, pcm,
                        uniform=True)  # x3dep is False in every system
        Fz, pfz, vfz = hllc6(wl, wr, 3)
        if not cart:
            for c in range(3):
                fh3 = b1(rx(ix[f"fh3_1"][c])[ng:ng + nx]) \
                    * b2(ry(ix[f"fh3_2"][c]))
                Fz[1 + c] = Fz[1 + c] * fh3

    # ---- update: divF with exact A/V factors --------------------------
    if lean:
        # uniform Cartesian: A_lo = A_hi and A/V = 1/dx_d — one scalar
        # multiply per direction (the lean Cartesian form)
        if dxs is not None:
            sdx1, sdx2, sdx3 = (1.0 / dxs[0], 1.0 / dxs[1], 1.0 / dxs[2])
        else:
            # per-node 1/dx rows are indexed by the NODE grid axis — only
            # the node-batched (lead) launch has one at program_id(0)
            assert lead, "sdx_ref requires the node-batched (lead) grid"
            n0 = pl.program_id(0)
            sdx1 = sdx_ref[n0, 0]
            sdx2 = sdx_ref[n0, 1]
            sdx3 = sdx_ref[n0, 2]
        divf = []
        for c in range(6):
            dv = (ax(Fx[c], 2, 0, nx) - ax(Fx[c], 2, 1, nx + 1)) * sdx1
            dv = dv + (ax(Fy[c], 1, 0, ty) - ax(Fy[c], 1, 1, ty + 1)) * sdx2
            if active_z:
                dv = dv + (ax(Fz[c], 0, 0, tz)
                           - ax(Fz[c], 0, 1, tz + 1)) * sdx3
            divf.append(dv)
    else:
        af1 = b1(rx(ix["upd1_face"])[ng:ng + nx])
        af1p = b1(rx(ix["upd1_facep"])[ng:ng + nx])
        iv1 = b1(rx(ix["upd1_iv"])[ng:ng + nx])
        t2_1 = b2(ry(ix["upd1_t2"]))
        t3_1 = b3(rz(ix["upd1_t3"]))
        c1 = iv1 * t2_1 * t3_1
        af2 = b2(ry(ix["upd2_face"]))
        af2p = b2(ry(ix["upd2_facep"]))
        iv2 = b2(ry(ix["upd2_iv"]))
        t1_2 = b1(rx(ix["upd2_t1"])[ng:ng + nx])
        t3_2 = b3(rz(ix["upd2_t3"]))
        c2 = iv2 * t1_2 * t3_2
        if active_z:
            af3 = b3(rz(ix["upd3_face"]))
            af3p = b3(rz(ix["upd3_facep"]))
            iv3 = b3(rz(ix["upd3_iv"]))
            t1_3 = b1(rx(ix["upd3_t1"])[ng:ng + nx])
            t2_3 = b2(ry(ix["upd3_t2"]))
            c3 = iv3 * t1_3 * t2_3

        divf = []
        for c in range(6):
            dv = (ax(Fx[c], 2, 0, nx) * af1
                  - ax(Fx[c], 2, 1, nx + 1) * af1p) * c1
            dv = dv + (ax(Fy[c], 1, 0, ty) * af2
                       - ax(Fy[c], 1, 1, ty + 1) * af2p) * c2
            if active_z:
                dv = dv + (ax(Fz[c], 0, 0, tz) * af3
                           - ax(Fz[c], 0, 1, tz + 1) * af3p) * c3
            divf.append(dv)
    u = rk_blend(u0_ref, u1_ref, gam0, gam1, divf, bdt, lead=lead)

    # ---- pressure-gradient + PdV flux sources -------------------------
    pxl, pxh = ax(pfx, 2, 0, nx), ax(pfx, 2, 1, nx + 1)
    vxl, vxh = ax(vfx, 2, 0, nx), ax(vfx, 2, 1, nx + 1)
    pyl, pyh = ax(pfy, 1, 0, ty), ax(pfy, 1, 1, ty + 1)
    vyl, vyh = ax(vfy, 1, 0, ty), ax(vfy, 1, 1, ty + 1)
    if lean:
        u[1] = u[1] + (bdt * sdx1) * (pxl - pxh)
        u[2] = u[2] + (bdt * sdx2) * (pyl - pyh)
        u[5] = u[5] - (bdt * sdx1) * 0.5 * (pxl + pxh) * (vxh - vxl)
        u[5] = u[5] - (bdt * sdx2) * 0.5 * (pyl + pyh) * (vyh - vyl)
        if active_z:
            pzl, pzh = ax(pfz, 0, 0, tz), ax(pfz, 0, 1, tz + 1)
            vzl, vzh = ax(vfz, 0, 0, tz), ax(vfz, 0, 1, tz + 1)
            u[3] = u[3] + (bdt * sdx3) * (pzl - pzh)
            u[5] = u[5] - (bdt * sdx3) * 0.5 * (pzl + pzh) * (vzh - vzl)
    else:
        idx1 = b1(rx(ix["idx1"])[ng:ng + nx])
        idx2 = b2(ry(ix["idx2"]))
        u[1] = u[1] + bdt * idx1 * (pxl - pxh)
        u[2] = u[2] + bdt * idx2 * (pyl - pyh)
        u[5] = u[5] - bdt * 0.5 * (pxl + pxh) * (
            ax(vfx, 2, 1, nx + 1) * af1p - ax(vfx, 2, 0, nx) * af1) * c1
        u[5] = u[5] - bdt * 0.5 * (pyl + pyh) * (
            ax(vfy, 1, 1, ty + 1) * af2p - ax(vfy, 1, 0, ty) * af2) * c2
        if active_z:
            idx3 = b3(rz(ix["idx3"]))
            pzl, pzh = ax(pfz, 0, 0, tz), ax(pfz, 0, 1, tz + 1)
            u[3] = u[3] + bdt * idx3 * (pzl - pzh)
            u[5] = u[5] - bdt * 0.5 * (pzl + pzh) * (
                ax(vfz, 0, 1, tz + 1) * af3p - ax(vfz, 0, 0, tz) * af3) * c3

    # ---- connection sources (curvilinear momenta) ---------------------
    if x1dep or x2dep:
        wint = s[:, zc, 2:2 + ty, ng:ng + nx]
        rho_w = wint[0]
        vt = []
        for c in range(3):
            v = wint[1 + c]
            if has_rot:
                v = v + b1(rx(ix["vrot_1"][c])[ng:ng + nx]) \
                    * b2(ry(ix["vrot_2"][c]))
            vt.append(v)
        rdt = rho_w * bdt
        if x1dep:
            cc = [b1(rx(k)[ng:ng + nx]) for k in ix["conn1"]]
            u[1] = u[1] + rdt * (cc[0] * vt[0] ** 2 + cc[1] * vt[1] ** 2
                                 + cc[2] * vt[2] ** 2)
        if x2dep:
            c2r = b2(ry(ix["conn2"]))
            u[2] = u[2] + rdt * c2r * vt[2] ** 2

    # ---- rotating-frame conservative torque (folded; curvilinear form,
    # rotating_frame_impl.hpp:96-170): mass-flux divergence weighted by
    # +/-(<R^2>_pm - <R^2>), plus centrifugal work from averaged fluxes
    if rf_omega != 0.0:
        om0 = rf_omega
        omdt = om0 * bdt
        om2dt = om0 * om0 * bdt

        def wrow(dd, side, fidx_lo, fidx_n, which_axis_sl):
            # 2-term separable weight at the cells of this block
            terms = []
            for t in range(2):
                f1r = rx(ix[f"rfw{dd}_{side}_1"][t])[ng:ng + nx]
                g1r = ry(ix[f"rfw{dd}_{side}_2"][t])
                terms.append(b1(f1r) * b2(g1r))
            return terms[0] + terms[1]

        Fm_x_lo = ax(Fx[0], 2, 0, nx)
        Fm_x_hi = ax(Fx[0], 2, 1, nx + 1)
        Fm_y_lo = ax(Fy[0], 1, 0, ty)
        Fm_y_hi = ax(Fy[0], 1, 1, ty + 1)
        rdivf = (Fm_x_lo * af1 * wrow(1, "lo", 0, 0, None)
                 + Fm_x_hi * af1p * wrow(1, "hi", 0, 0, None)) * c1
        rdivf = rdivf + (Fm_y_lo * af2 * wrow(2, "lo", 0, 0, None)
                         + Fm_y_hi * af2p * wrow(2, "hi", 0, 0, None)) * c2
        favg = [0.5 * (Fm_x_lo + Fm_x_hi), 0.5 * (Fm_y_lo + Fm_y_hi), 0.0]
        if active_z:
            Fm_z_lo = ax(Fz[0], 0, 0, tz)
            Fm_z_hi = ax(Fz[0], 0, 1, tz + 1)
            rdivf = rdivf + (Fm_z_lo * af3 * wrow(3, "lo", 0, 0, None)
                             + Fm_z_hi * af3p * wrow(3, "hi", 0, 0, None)) * c3
            favg[2] = 0.5 * (Fm_z_lo + Fm_z_hi)
        for c in range(3):
            ph = b1(rx(ix["phihat_1"][c])[ng:ng + nx])                 * b2(ry(ix["phihat_2"][c]))
            u[1 + c] = u[1 + c] - omdt * rdivf * ph
        fdotr = 0.0
        for c in range(3):
            if c == 2 and not active_z:
                continue
            rh = b1(rx(ix["rhat_1"][c])[ng:ng + nx]) * b2(ry(ix["rhat_2"][c]))
            fdotr = fdotr + favg[c] * rh
        rcyl = b1(rx(ix["rcyl_1"])[ng:ng + nx]) * b2(ry(ix["rcyl_2"]))
        u[4] = u[4] + om2dt * rcyl * fdotr

    # ---- folded central point-mass gravity (Gravity gtype=point at the
    # origin, no sink; sources.py _point_accel/_kick).  The acceleration is
    # -gm r_vec / norm, decomposed onto the problem basis from separable
    # Rcyl/z and R-hat/z-hat rows; gdt carries the tstart/tstop window.
    if grav is not None:
        gm_, soft2_, gmode, gpos = grav
        gdt = gdt_ref[0]
        if gmode == "xyz":
            # Cartesian-grid point mass at any position: r_vec directly
            # from the (trivially separable) raw coordinate rows
            # (the recon rows are xv[0]-shifted and unusable as absolute
            # positions; point_mass.cpp Cartesian branch analogue)
            xr = b1(rx(ix["gx_1"])[ng:ng + nx]) - gpos[0]
            yr = b2(ry(ix["gy_2"])) - gpos[1]
            zr = b3(rz(ix["gz_3"])) - gpos[2]
            r2 = xr * xr + yr * yr + zr * zr
        else:
            Rc_i = b1(rx(ix["rcyl_1"])[ng:ng + nx]) * b2(ry(ix["rcyl_2"]))
            zc_i = b1(rx(ix["zc_1"])[ng:ng + nx]) * b2(ry(ix["zc_2"])) \
                * b3(rz(ix["zc_3"]))
            r2 = Rc_i * Rc_i + zc_i * zc_i
        inv_r = jax.lax.rsqrt(r2)
        if gmode == "sph":
            # spherical/axisymmetric branch: g = -gm/(r^2+soft^2) r-hat
            if soft2_ == 0.0:
                gmag = (-gm_) * inv_r * inv_r * inv_r
            else:
                gmag = -gm_ / (r2 + soft2_) * inv_r
        else:
            # general branch: g = -gm r_vec/(r^2+soft^2)^1.5
            if soft2_ == 0.0:
                gmag = (-gm_) * inv_r * inv_r * inv_r
            else:
                rs2 = r2 + soft2_
                irs = jax.lax.rsqrt(rs2)
                gmag = (-gm_) * irs * irs * irs
        wi_g = s[:, zc, 2:2 + ty, ng:ng + nx]
        rho_g = wi_g[0]
        vdotg = 0.0
        if gmode == "xyz":
            # unit basis + unit scale factors on Cartesian grids
            for c, rvec in enumerate((xr, yr, zr)):
                g_c = gmag * rvec
                u[1 + c] = u[1 + c] + gdt * rho_g * g_c
                vdotg = vdotg + wi_g[1 + c] * g_c
        else:
            hx_g = [b1(rx(ix["hv_1"][c])[ng:ng + nx])
                    * b2(ry(ix["hv_2"][c])) for c in range(3)]
            for c in range(3):
                rh = b1(rx(ix["rhat_1"][c])[ng:ng + nx]) \
                    * b2(ry(ix["rhat_2"][c]))
                zh = b1(rx(ix["zhat_1"][c])[ng:ng + nx]) \
                    * b2(ry(ix["zhat_2"][c]))
                g_c = gmag * (Rc_i * rh + zc_i * zh)
                u[1 + c] = u[1 + c] + gdt * rho_g * hx_g[c] * g_c
                vdotg = vdotg + wi_g[1 + c] * g_c
        u[4] = u[4] + gdt * rho_g * vdotg

    # ---- fused viscous/thermal diffusion (Diffusion.fluxes/update,
    # ops/diffusion.py; ref src/utils/diffusion/*.hpp).  All geometry
    # enters as separable per-axis rows; the stress stencil fits the
    # 2-cell slab halo exactly.
    den_diff = None
    if diff is not None:
        visc, cond = diff
        dims = [1, 2] + ([3] if active_z else [])
        ndim = len(dims)
        sW = s[:, :, :, :nx + 2 * ng]            # [6, Zw, ty+4, nx+4]
        Zw = sW.shape[1]

        def rxw(k):
            return rx(k)[:nx + 2 * ng]

        def _zsl(zr):
            return slice(zr[0], zr[0] + zr[1]) if active_z else slice(0, 1)

        def wv(a, zr, yr, xr):
            """Slice a [Zw, Yw, Xw] window value."""
            return a[_zsl(zr), yr[0]:yr[0] + yr[1], xr[0]:xr[0] + xr[1]]

        def prow(base, zr, yr, xr, clamp=None, inv=False):
            """Product of per-axis rows (kx, ky, kz index keys) over the
            given window ranges.  ``inv=True`` builds the reciprocal
            product from row-level reciprocals (1-D ops) so callers can
            multiply instead of dividing tile-wide."""
            kx, ky, kz = base

            def f(r):
                return 1.0 / r if inv else r

            out = 1.0
            if kx is not None:
                out = out * b1(f(rxw(kx)[xr[0]:xr[0] + xr[1]]))
            if ky is not None:
                out = out * b2(f(ryw(ky)[yr[0]:yr[0] + yr[1]]))
            if kz is not None:
                rzr = rzw(kz)
                out = out * b3(f(rzr[zr[0]:zr[0] + zr[1]] if active_z
                                 else rzr[0:1]))
            if clamp is not None:
                out = (jnp.minimum(out, 1.0 / clamp) if inv
                       else jnp.maximum(out, clamp))
            return out

        def ryw(k):
            return cyw_ref[0, 0, k] if lead else cyw_ref[0, k]

        def rzw(k):
            return czw_ref[0, 0, k] if lead else czw_ref[0, k]

        nsz = {1: nx, 2: ty, 3: tz if active_z else 1}
        W_INT = {1: (2, nx), 2: (2, ty), 3: (2, tz) if active_z else (0, 1)}

        def axr(d, what):
            """(zr, yr, xr) with range builder `what` on axis d, interior
            elsewhere."""
            zr, yr, xr = W_INT[3], W_INT[2], W_INT[1]
            n = nsz[d]
            if d == 1:
                xr = what(n)
            elif d == 2:
                yr = what(n)
            else:
                zr = what(n)
            return zr, yr, xr

        LO = lambda n: (1, n + 1)    # lower-neighbor cells of faces 0..n
        HI = lambda n: (2, n + 1)    # upper cells of faces 0..n
        INN = lambda n: (1, n + 2)   # cells with valid +/-1 neighbors

        tiny = 1e-30 if sW.dtype == jnp.float32 else 1e-300

        # window-wide fields -------------------------------------------
        FULLR = {1: (0, nx + 4), 2: (0, ty + 4),
                 3: (0, Zw) if active_z else (0, 1)}
        fz, fy, fx = FULLR[3], FULLR[2], FULLR[1]
        rho_w = sW[0]
        sie_w = sW[5]
        inv_h = []
        for cc in range(3):
            inv_h.append(prow((ix["hv_1"][cc], ix["hv_2"][cc], None),
                              fz, fy, fx, inv=True))
        vcon = [sW[1 + cc] * inv_h[cc] for cc in range(3)]

        def mu_model(dp):
            kind, avg, a_, b_, c_, d_, e_, f_ = dp
            if kind == "viscosity_plaw":
                # a=nu_s, b=eta, c=r_exp, d=R0
                Rc = prow((ix["rcyl_1"], ix["rcyl_2"], None), fz, fy, fx)
                out = a_ * rho_w
                if c_ != 0.0:
                    out = out * (Rc * (1.0 / d_)) ** c_
                return out
            if kind == "viscosity_alpha":
                # a=alpha, b=eta, c=R0, d=Omega0
                Rc = prow((ix["rcyl_1"], ix["rcyl_2"], None), fz, fy, fx)
                zc_w = prow((ix["zc_1"], ix["zc_2"], ix["zc_3"]), fz, fy, fx)
                r2 = (Rc * Rc + zc_w * zc_w) * (1.0 / (c_ * c_))
                # 1/Omega_K = (1/Om0) (r/R0)^1.5 = (1/Om0) r2^0.75, and
                # r2^0.75 = r2 * rsqrt(sqrt(r2)) — no tile division, no pow
                # (pow would lower to exp/log transcendentals on the VPU)
                iOmk = (1.0 / d_) * r2 * jax.lax.rsqrt(jnp.sqrt(r2))
                return a_ * gamma * (gamma - 1.0) * rho_w * sie_w * iOmk
            # conduction: a=coef, c=temp_exp, d=rho_exp, e=T0, f=d0
            T = sie_w * (1.0 / cv)
            base = 1.0
            if c_ != 0.0:
                base = base * (T * (1.0 / e_)) ** c_
            if d_ != 0.0:
                base = base * (rho_w * (1.0 / f_)) ** d_
            if kind == "conductivity_plaw":
                return a_ * base
            return a_ * base * rho_w * cv  # thermaldiff_plaw

        if visc is not None:
            mu_w = mu_model(visc)
            eta_b = visc[3]
            # divu on the inner window (cells with +/-1 neighbors)
            zi_r, yi_r, xi_r = ((INN(tz) if active_z else (0, 1)),
                                INN(ty), INN(nx))
            divv = 0.0
            upd_t = {1: (None, ix["upd1_t2"], ix["upd1_t3"]),
                     2: (ix["upd2_t1"], None, ix["upd2_t3"]),
                     3: (ix["upd3_t1"], ix["upd3_t2"], None)}
            upd_own = {1: (ix["upd1_face"], ix["upd1_facep"], ix["upd1_iv"]),
                       2: (ix["upd2_face"], ix["upd2_facep"], ix["upd2_iv"]),
                       3: (ix["upd3_face"], ix["upd3_facep"], ix["upd3_iv"])}

            def inn_shift(d, off):
                """Inner-window cells shifted by off along d."""
                zr, yr, xr = zi_r, yi_r, xi_r
                if d == 1:
                    xr = (xr[0] + off, xr[1])
                elif d == 2:
                    yr = (yr[0] + off, yr[1])
                else:
                    zr = (zr[0] + off, zr[1])
                return zr, yr, xr

            for d in dims:
                v = sW[d]  # physical velocity component (as jnp _divu)
                v0 = wv(v, *inn_shift(d, 0))
                vp = wv(v, *inn_shift(d, +1))
                vm = wv(v, *inn_shift(d, -1))
                kf, kfp, kiv = upd_own[d]
                zr, yr, xr = zi_r, yi_r, xi_r
                own_r = {1: xr, 2: yr, 3: zr}[d]
                rw = {1: rxw, 2: ryw, 3: rzw}[d]
                bO = {1: b1, 2: b2, 3: b3}[d]

                def own_row(k, rng):
                    r = rw(k)
                    if d == 3 and not active_z:
                        return bO(r[0:1])
                    return bO(r[rng[0]:rng[0] + rng[1]])

                af_lo = own_row(kf, own_r)
                af_hi = own_row(kfp, own_r)
                iv_d = own_row(kiv, own_r)
                tA, tB = [k for k in upd_t[d] if k is not None]
                # transverse factors live on the other two axes
                if d == 1:
                    tfac = b2(ryw(tA)[yr[0]:yr[0] + yr[1]]) * (
                        b3(rzw(tB)[zr[0]:zr[0] + zr[1]] if active_z
                           else rzw(tB)[0:1]))
                elif d == 2:
                    tfac = b1(rxw(tA)[xr[0]:xr[0] + xr[1]]) * (
                        b3(rzw(tB)[zr[0]:zr[0] + zr[1]] if active_z
                           else rzw(tB)[0:1]))
                else:
                    tfac = b1(rxw(tA)[xr[0]:xr[0] + xr[1]]) \
                        * b2(ryw(tB)[yr[0]:yr[0] + yr[1]])
                divv = divv + (af_hi * (v0 + vp) - af_lo * (v0 + vm)) \
                    * iv_d * tfac
            divv = divv * 0.5
            # src_i = v^k dh_i/dx_k on the full window
            src2 = vcon[0] * prow((ix["conn1"][1], None, None), fz, fy, fx)
            src3 = vcon[0] * prow((ix["conn1"][2], None, None), fz, fy, fx) \
                + vcon[1] * prow((None, ix["conn2"], None), fz, fy, fx)
            src = {1: jnp.zeros_like(rho_w), 2: src2, 3: src3}

        if cond is not None:
            kap_w = mu_model(cond)
            T_w = sie_w * (1.0 / cv)

        def face_avg(dp, a, d):
            lo = wv(a, *axr(d, LO))
            hi = wv(a, *axr(d, HI))
            if dp[1] == "harmonic":
                return 2.0 * lo * hi / (lo + hi)
            return 0.5 * (lo + hi)

        def ddiff(a, d):
            """a[hi cells] - a[lo cells] at faces along d."""
            return wv(a, *axr(d, HI)) - wv(a, *axr(d, LO))

        def fh_rows(d, comp):
            """Separable rows of h_comp at faces along d."""
            kx = ix[f"fh{d}_1"][comp]
            ky = ix[f"fh{d}_2"][comp]
            if d == 1:
                return rx(kx)[ng:ng + nx + 1], ryw(ky)[2:2 + ty]
            if d == 2:
                return rx(kx)[ng:ng + nx], ryw(ky)[2:2 + ty + 1]
            return rx(kx)[ng:ng + nx], ryw(ky)[2:2 + ty]

        def fh_prod(d, comp, face_axis_rng):
            """h_comp at faces along d (separable face_h factors)."""
            f1, f2 = fh_rows(d, comp)
            return b1(f1) * b2(f2)

        dF = {}
        diag_face = {}
        for d in dims:
            i1r = prow((ix[f"d1_{d}_1"], ix[f"d1_{d}_2"], ix[f"d1_{d}_3"]),
                       *axr(d, HI), clamp=tiny, inv=True)
            rows_f = None
            if visc is not None:
                mus = face_avg(visc, mu_w, d)
                f1d, f2d = fh_rows(d, d - 1)
                hdf = b1(f1d) * b2(f2d)
                rows_f = []
                for comp in (1, 2, 3):
                    if comp == d:
                        t = (2.0 * ddiff(vcon[d - 1], d) * i1r
                             + 0.5 * (wv(src[d], *axr(d, HI))
                                      + wv(src[d], *axr(d, LO))))
                        # divu lives on the inner window (offset -1)
                        dz_, dy_, dx_ = axr(d, HI)
                        davg_hi = divv[_zsl((dz_[0] - 1, dz_[1])),
                                       dy_[0] - 1:dy_[0] - 1 + dy_[1],
                                       dx_[0] - 1:dx_[0] - 1 + dx_[1]]
                        lz_, ly_, lx_ = axr(d, LO)
                        davg_lo = divv[_zsl((lz_[0] - 1, lz_[1])),
                                       ly_[0] - 1:ly_[0] - 1 + ly_[1],
                                       lx_[0] - 1:lx_[0] - 1 + lx_[1]]
                        f = hdf * mus * (
                            t - (1.0 / 3.0) * (1.0 - eta_b)
                            * (davg_hi + davg_lo))
                    else:
                        t = ddiff(vcon[comp - 1], d) * i1r
                        # (h_c/h_d)^2 at faces from squared row ratios —
                        # row-level divisions, one plane multiply
                        f1c, f2c = fh_rows(d, comp - 1)
                        ratio = (b1((f1c / f1d) ** 2)
                                 * b2((f2c / f2d) ** 2))
                        tt = 0.0
                        if comp in dims:
                            # transverse gradient ONCE at cells over the
                            # inner window along d, then slice the
                            # face-adjacent HI/LO cells — bit-identical to
                            # the per-face recompute, half the arithmetic
                            i2rc = prow((ix[f"d2_{comp}_1"],
                                         ix[f"d2_{comp}_2"],
                                         ix[f"d2_{comp}_3"]),
                                        *axr(d, INN), clamp=tiny, inv=True)

                            def shc(off_c):
                                zr, yr, xr = axr(d, INN)
                                rngs = {3: list(zr), 2: list(yr), 1: list(xr)}
                                rngs[comp][0] += off_c
                                return wv(vcon[d - 1],
                                          tuple(rngs[3]), tuple(rngs[2]),
                                          tuple(rngs[1]))

                            trc = (shc(+1) - shc(-1)) * i2rc
                            ad = 3 - d  # array axis of direction d
                            tr_hi = ax(trc, ad, 1, nsz[d] + 2)
                            tr_lo = ax(trc, ad, 0, nsz[d] + 1)
                            tt = 0.5 * (tr_hi + tr_lo)
                        f = hdf * mus * (tt + ratio * t)
                    rows_f.append(f)
                fen = 0.0
                for comp in range(3):
                    vavg = 0.5 * (wv(vcon[comp], *axr(d, HI))
                                  + wv(vcon[comp], *axr(d, LO)))
                    fen = fen + vavg * rows_f[comp]
                rows_f = rows_f + [fen]
            if cond is not None:
                kcond = face_avg(cond, kap_w, d)
                qf = kcond * ddiff(T_w, d) * i1r
                if rows_f is not None:
                    rows_f[3] = rows_f[3] + qf
                else:
                    z_ = jnp.zeros_like(qf)
                    rows_f = [z_, z_, z_, qf]
            dF[d] = rows_f
            if visc is not None:
                diag_face[d] = rows_f[d - 1]

        # divergence + connection sources (DiffusionUpdateImpl)
        ddv = [0.0, 0.0, 0.0, 0.0]
        afp = {1: (af1, af1p, c1), 2: (af2, af2p, c2)}
        if active_z:
            afp[3] = (af3, af3p, c3)
        diag_avg = {}
        for d in dims:
            aflo, afhi, cfac = afp[d]
            for r_ in range(4):
                Fr = dF[d][r_]
                lo_ = ax(Fr, 3 - d, 0, nsz[d])
                hi_ = ax(Fr, 3 - d, 1, nsz[d] + 1)
                ddv[r_] = ddv[r_] + (lo_ * aflo - hi_ * afhi) * cfac
            if visc is not None:
                diag_avg[d] = 0.5 * (ax(diag_face[d], 3 - d, 0, nsz[d])
                                     + ax(diag_face[d], 3 - d, 1, nsz[d] + 1))
        if visc is not None and (x1dep or x2dep):
            for d in dims:
                if x1dep and d >= 2:
                    cr = b1(rx(ix["conn1"][d - 1])[ng:ng + nx])
                    ddv[0] = ddv[0] + cr * diag_avg[d]
                if x2dep and d == 3:
                    ddv[1] = ddv[1] + b2(ry(ix["conn2"])) * diag_avg[d]
        # apply (sign convention: subtract (A F_lo - A F_hi)/vol)
        if visc is not None:
            u[1] = u[1] - bdt * ddv[0]
            u[2] = u[2] - bdt * ddv[1]
            u[3] = u[3] - bdt * ddv[2]
        u[4] = u[4] - bdt * ddv[3]
        heat = -bdt * ddv[3]
        if visc is not None:
            wi = s[:, zc, 2:2 + ty, ng:ng + nx]
            ihvi = [prow((ix["hv_1"][cc], ix["hv_2"][cc], None),
                         W_INT[3], W_INT[2], W_INT[1], inv=True)
                    for cc in range(3)]
            heat = heat + bdt * (ddv[0] * wi[1] * ihvi[0]
                                 + ddv[1] * wi[2] * ihvi[1]
                                 + ddv[2] * wi[3] * ihvi[2])
        u[5] = u[5] + heat

        if full:
            # diffusive CFL denominator: 2*ndim*nu_eff / min_dx^2
            iw = []
            for d in dims:
                val = b1(rx(ix["invw_1"][d - 1])[ng:ng + nx]) \
                    * b2(ry(ix["invw_2"][d - 1]))
                if d == 3:
                    val = val * b3(rz(ix["inv_dx3"]))
                iw.append(val)
            inv_mindx = iw[0]
            for v_ in iw[1:]:
                inv_mindx = jnp.maximum(inv_mindx, v_)
            rho_i = wv(rho_w, W_INT[3], W_INT[2], W_INT[1])
            den_diff = None
            for dp, mw in ((visc, mu_w if visc is not None else None),
                           (cond, kap_w if cond is not None else None)):
                if dp is None:
                    continue
                m_i = wv(mw, W_INT[3], W_INT[2], W_INT[1])
                if dp[0] == "conductivity_plaw":
                    m_i = m_i / (rho_i * cv)
                elif dp[0] in ("viscosity_plaw", "viscosity_alpha"):
                    m_i = m_i * (1.0 + (dp[3] > 1.0) * (dp[3] - 1.0)) / rho_i
                dd = 2.0 * ndim * m_i * inv_mindx * inv_mindx
                den_diff = dd if den_diff is None else jnp.maximum(den_diff, dd)

    if not full:
        if lead:
            u_ref[0] = jnp.stack(u)
            w_ref[0] = s[:, zc, 2:2 + ty, ng:ng + nx]
            dm_ref[pl.program_id(0), i, j] = \
                jnp.float32(0.0) + u[0][0, 0, 0] * 0.0
        else:
            u_ref[...] = jnp.stack(u)
            w_ref[...] = s[:, zc, 2:2 + ty, ng:ng + nx]
            dm_ref[i, j] = jnp.float32(0.0) + u[0][0, 0, 0] * 0.0
        return

    # ---- dual-energy + C2P/P2C with scale factors ----------------------
    if lean:
        # Cartesian: h == 1 everywhere — no scale-factor planes
        rho = jnp.maximum(u[0], dfloor)
        irho = 1.0 / rho
        m1, m2, m3 = u[1], u[2], u[3]
    else:
        hx = [b1(rx(ix["hv_1"][c])[ng:ng + nx]) * b2(ry(ix["hv_2"][c]))
              for c in range(3)]
        # reciprocal scale-factor planes from row-level reciprocals; one
        # tile-wide reciprocal (1/rho) then multiplies — replaces 7 tile
        # divisions in the C2P/dual-energy pass
        ihx = [b1(1.0 / rx(ix["hv_1"][c])[ng:ng + nx])
               * b2(1.0 / ry(ix["hv_2"][c])) for c in range(3)]
        rho = jnp.maximum(u[0], dfloor)
        irho = 1.0 / rho
        m1 = u[1] * ihx[0]
        m2 = u[2] * ihx[1]
        m3 = u[3] * ihx[2]
    ke = 0.5 * (m1 * m1 + m2 * m2 + m3 * m3) * irho
    ue = u[4] - ke
    sie = jnp.where(ue > de_switch * u[4], ue * irho, u[5] * irho)
    sie = jnp.maximum(sie, siefloor)
    eint0 = jnp.maximum(sie * rho, siefloor * rho)
    v1 = m1 * irho
    v2 = m2 * irho
    v3 = m3 * irho
    sie = jnp.maximum(eint0 * irho, siefloor)
    p = (gamma - 1.0) * rho * sie
    eint = sie * rho
    etot = eint + 0.5 * rho * (v1 * v1 + v2 * v2 + v3 * v3)
    if lean:
        u_out = jnp.stack([rho, rho * v1, rho * v2, rho * v3, etot, eint])
    else:
        u_out = jnp.stack([rho, rho * v1 * hx[0], rho * v2 * hx[1],
                           rho * v3 * hx[2], etot, eint])
    w_out = jnp.stack([rho, v1, v2, v3, p, sie])
    if lead:
        u_ref[0] = u_out
        w_ref[0] = w_out
    else:
        u_ref[...] = u_out
        w_ref[...] = w_out

    cs = jnp.sqrt(gamma * (gamma - 1.0) * sie)
    if lean:
        den = (jnp.abs(v1) + cs) * sdx1 + (jnp.abs(v2) + cs) * sdx2
        if active_z:
            den = den + (jnp.abs(v3) + cs) * sdx3
    else:
        iw1 = b1(rx(ix["invw_1"][0])[ng:ng + nx]) * b2(ry(ix["invw_2"][0]))
        iw2 = b1(rx(ix["invw_1"][1])[ng:ng + nx]) * b2(ry(ix["invw_2"][1]))
        den = (jnp.abs(v1) + cs) * iw1 + (jnp.abs(v2) + cs) * iw2
        if active_z:
            iw3 = b1(rx(ix["invw_1"][2])[ng:ng + nx]) \
                * b2(ry(ix["invw_2"][2])) * b3(rz(ix["inv_dx3"]))
            den = den + (jnp.abs(v3) + cs) * iw3
    if den_diff is not None:
        # diffusive dt limit folded into the same denominator
        # (dt = cfl / max(den); Diffusion::EstimateTimestep)
        den = jnp.maximum(den, den_diff)
    if lead:
        dm_ref[pl.program_id(0), i, j] = jnp.max(den)
    else:
        dm_ref[i, j] = jnp.max(den)


def _stage_kernel_curv_gather(bdt_ref, gdt_ref, u0_ref, u1_ref, w_hbm,
                              sx_lo, sx_hi, sy_lo, sy_hi, cx_ref, cyw_ref,
                              czw_ref, u_ref, w_ref, dm_ref, scratch, sxl_s,
                              sxh_s, syl_s, syh_s, sems, *, ng, nx, ny, nz,
                              tz, ty, active_z, pcm, gamma, gam0, gam1,
                              dfloor, siefloor, de_switch, ix, full, x1dep,
                              x2dep, has_rot, rf_omega, rsolver, diff, cv,
                              grav, cart=False, dxs=None):
    """In-kernel halo-gather frontend: consumes the UNPADDED interior
    primitives, wraps x3 periodically with modular DMAs and fills the
    x1/x2 ghosts from precomputed IC boundary strips — no padded array
    and no ghost-fill pass in HBM (the disk decks' ic/ic/periodic
    boundary layout; cf. the Cartesian periodic kernel).  All DMAs are
    unconditional (edge-vs-interior row sources are selected by value
    after the waits), so every semaphore is always signaled."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    z0 = i * tz
    y0 = j * ty
    nyb = ny // ty
    zsz = tz + 4 if active_z else 1

    # z regions: periodic wrap on the interior array (strips carry padded-z
    # extents and are sliced directly)
    zregs = [((z0 - 2) % nz, 2, 0), (z0, tz, 2), ((z0 + tz) % nz, 2, 2 + tz)]
    dmas = []
    sem_n = 0

    def start(src_ref, dst_ref):
        nonlocal sem_n
        d = pltpu.make_async_copy(src_ref, dst_ref, sems.at[sem_n])
        sem_n += 1
        d.start()
        dmas.append(d)

    ylo = pl.multiple_of(jnp.maximum(y0 - 8, 0), 8)
    yhi = pl.multiple_of(jnp.minimum(y0 + ty, ny - 8), 8)
    for (zs, zn, zd) in zregs:
        start(w_hbm.at[:, pl.ds(zs, zn), pl.ds(pl.multiple_of(y0, 8), ty), :],
              scratch.at[:, pl.ds(zd, zn), pl.ds(8, ty), :])
        start(w_hbm.at[:, pl.ds(zs, zn), pl.ds(ylo, 8), :],
              scratch.at[:, pl.ds(zd, zn), pl.ds(0, 8), :])
        start(w_hbm.at[:, pl.ds(zs, zn), pl.ds(yhi, 8), :],
              scratch.at[:, pl.ds(zd, zn), pl.ds(8 + ty, 8), :])
    # x2 IC strips (padded z extents: slice directly; real ghost rows at
    # 6..6+ng of the lo strip / 0..ng of the hi strip)
    start(sy_lo.at[:, pl.ds(z0, zsz), :, :], syl_s)
    start(sy_hi.at[:, pl.ds(z0, zsz), :, :], syh_s)
    # x1 IC strips (padded y/z extents; 128-lane padded)
    start(sx_lo.at[:, pl.ds(z0, zsz),
                   pl.ds(pl.multiple_of(y0, 8), _yst(ty)), :], sxl_s)
    start(sx_hi.at[:, pl.ds(z0, zsz),
                   pl.ds(pl.multiple_of(y0, 8), _yst(ty)), :], sxh_s)

    bdt = bdt_ref[0]
    for d in dmas:
        d.wait()

    # assemble the slab: used y rows 6..ty+10; edge blocks take their y
    # halo rows from the strips; x = [lo ghosts, interior, hi ghosts]
    sall = scratch[...]
    lo_band = jnp.where(j == 0, syl_s[...], sall[:, :, 0:8])
    hi_band = jnp.where(j == nyb - 1, syh_s[...], sall[:, :, 8 + ty:16 + ty])
    sc = jnp.concatenate([lo_band[:, :, 6:8], sall[:, :, 8:8 + ty],
                          hi_band[:, :, 0:2]], axis=2)
    xl = sxl_s[...][:, :, :ty + 4, :ng]
    xh = sxh_s[...][:, :, :ty + 4, :ng]
    s = jnp.concatenate([xl, sc, xh], axis=-1)
    _curv_body(s, bdt, gdt_ref, u0_ref, u1_ref, cx_ref, cyw_ref, czw_ref,
               u_ref, w_ref, dm_ref, ng=ng, nx=nx, tz=tz, ty=ty,
               active_z=active_z, pcm=pcm, gamma=gamma, gam0=gam0, gam1=gam1,
               dfloor=dfloor, siefloor=siefloor, de_switch=de_switch, ix=ix,
               full=full, x1dep=x1dep, x2dep=x2dep, has_rot=has_rot,
               rf_omega=rf_omega, rsolver=rsolver, diff=diff, cv=cv,
               grav=grav, cart=cart, dxs=dxs)


def _yst(ty: int) -> int:
    """x-strip y-window rows: ty + 4 halo rounded to the 8-row tiling."""
    return -(-(ty + 4) // 8) * 8


def prepare_gather_strips(grid, ic_caches):
    """Host-side strip arrays for the gather kernel from the ic BC value
    caches (make_ic_bc.shard_caches[0]): x1/x2 lo+hi ghost slabs over the
    padded transverse extents, DMA-aligned.

    x1 strips: [6, zp, yp+pad8, 128]  (real lanes 0..ng)
    x2 strips: [6, zp, 8, nx]         (real ghost rows at 6..8 for lo /
                                       0..ng for hi)
    """
    ng = grid.nghost
    nx, ny, nz = grid.nx
    g = ic_caches

    def arr(key):
        a = np.asarray(g[key])
        return a[0]  # [6, z, y, x] (single species)

    # x1 strips from cache[(1, side)]: [6, zp, yp, ng]
    out = {}
    for side, key in ((0, (1, 0)), (1, (1, 1))):
        a = arr(key)
        zp, yp = a.shape[1], a.shape[2]
        st = np.zeros((6, zp, yp + 8, 128), a.dtype)
        st[:, :, :yp, :ng] = a
        out[("x1", side)] = st
    # x2 strips from cache[(2, side)]: [6, zp, ng, xp] -> interior x lanes
    for side, key in ((0, (2, 0)), (1, (2, 1))):
        a = arr(key)
        zp = a.shape[1]
        st = np.zeros((6, zp, 8, nx), a.dtype)
        if side == 0:
            st[:, :, 6:6 + ng, :] = a[:, :, :, ng:ng + nx]
        else:
            st[:, :, 0:ng, :] = a[:, :, :, ng:ng + nx]
        out[("x2", side)] = st
    return out


def stage_curv_gather(w_int, u0, u1, grid, cfg, gam0, gam1, beta_dt,
                      force_pcm, coeffs, packed, strips, rf_omega=0.0,
                      grav=None, grav_dt=0.0, interpret=None):
    """Full-mode fused curvilinear stage with in-kernel halo gather
    (x3 periodic + x1/x2 ic strips); consumes UNPADDED interior prims."""
    from .pallas_stage import _interpret_mode

    if interpret is None:
        interpret = _interpret_mode()
    nx, ny, nz = grid.nx
    TY = _pick_ty(nx)                    # shadow: shape-aware y block
    YS = (TY + 4 + 7) // 8 * 8
    g1 = grid.ng[0]
    active_z = nz > 1
    wi = w_int[0]
    u0_ = u0[0]
    u1_ = u1[0]
    CX, CY, CZ, ix = packed
    pcm = force_pcm or cfg.recon == "pcm"
    tz = _pick_tz(nz) if active_z else 1

    diff_spec = None
    if coeffs.diff is not None:
        diff_spec = (_dp_tuple(coeffs.diff.visc), _dp_tuple(coeffs.diff.cond))
    kern = functools.partial(
        _stage_kernel_curv_gather, ng=g1, nx=nx, ny=ny, nz=nz, tz=tz, ty=TY,
        active_z=active_z, pcm=pcm, gamma=cfg.gamma, gam0=gam0, gam1=gam1,
        dfloor=cfg.dfloor, siefloor=cfg.siefloor, de_switch=cfg.de_switch,
        ix=ix, full=True, x1dep=coeffs.x1dep, x2dep=coeffs.x2dep,
        has_rot=any(np.any(f1 != 0) for f1, _ in coeffs.vrot),
        rf_omega=rf_omega, rsolver=cfg.rsolver, diff=diff_spec, cv=cfg.cv,
        grav=grav, cart=geo.is_cartesian(coeffs.coords),
        dxs=_uniform_dxs(grid, coeffs))
    dt = wi.dtype
    zsz = tz + 4 if active_z else 1
    nyb = ny // TY
    CXj = jnp.asarray(CX)
    CYW = np.stack([CY[:, jb * TY: jb * TY + TY + 4] for jb in range(nyb)])
    if active_z:
        nzb = nz // tz
        CZW = np.stack([CZ[:, ib * tz: ib * tz + tz + 4]
                        for ib in range(nzb)])
    else:
        nzb = 1
        CZW = CZ[None, :, :1]
    CZW = CZW[..., None]
    CYWj = jnp.asarray(CYW)
    CZWj = jnp.asarray(CZW)
    blk = (6, tz, TY, nx)
    imap = lambda i, j: (0, i, j, 0)
    u0_, u1_, spec0, spec1 = rk_register_blocks(u0_, u1_, gam0, gam1, blk,
                                                imap, dt)
    n_dmas = 16  # upper bound on per-block gather DMAs
    u_new, w_new, dmax = pl.pallas_call(
        kern,
        grid=(nzb, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec0,
            spec1,
            pl.BlockSpec(memory_space=pl.ANY),   # interior w
            pl.BlockSpec(memory_space=pl.ANY),   # x1 lo strip
            pl.BlockSpec(memory_space=pl.ANY),   # x1 hi strip
            pl.BlockSpec(memory_space=pl.ANY),   # x2 lo strip
            pl.BlockSpec(memory_space=pl.ANY),   # x2 hi strip
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + CYW.shape[1:], lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + CZW.shape[1:], lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((6, nz, ny, nx), dt),
            jax.ShapeDtypeStruct((6, nz, ny, nx), dt),
            jax.ShapeDtypeStruct((nzb, nyb), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((6, zsz, TY + 16, nx), dt),
            pltpu.VMEM((6, zsz, _yst(TY), 128), dt),
            pltpu.VMEM((6, zsz, _yst(TY), 128), dt),
            pltpu.VMEM((6, zsz, 8, nx), dt),
            pltpu.VMEM((6, zsz, 8, nx), dt),
            pltpu.SemaphoreType.DMA((n_dmas,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(beta_dt, dt), (1,)),
      jnp.reshape(jnp.asarray(grav_dt, dt), (1,)), u0_, u1_, wi,
      strips[("x1", 0)], strips[("x1", 1)], strips[("x2", 0)],
      strips[("x2", 1)], CXj, CYWj, CZWj)
    return u_new[None], w_new[None], dmax


def gather_supported(grid, cfg, bc_custom) -> bool:
    """Gate for the in-kernel-gather stage: disk-style boundary layout
    (x1/x2 = ic custom fills with value caches, x3 periodic), 3-D, and
    128-aligned interior x rows for the slab DMAs."""
    if not supported_curv(grid, cfg):
        return False
    if grid.nx[2] <= 1 or grid.nx[0] % 128 != 0:
        return False
    if grid.bc[2] != ("periodic", "periodic"):
        return False
    for d in (0, 1):
        if grid.bc[d] != ("ic", "ic"):
            return False
    ic = bc_custom.get("ic") if bc_custom else None
    caches = getattr(ic, "shard_caches", None)
    if not caches:
        return False
    # single-species value caches for all four boundaries
    need = [(1, 0), (1, 1), (2, 0), (2, 1)]
    return all(k in caches[0] for k in need)


def stage_curv(w_pad, u0, u1, grid, cfg, gam0, gam1, beta_dt, force_pcm,
               coeffs, packed, full=True, rf_omega=0.0, interpret=None,
               grav=None, grav_dt=0.0):
    """One fused curvilinear RK stage.  ``coeffs``/``packed`` come from
    ``CurvCoeffs(grid, omf)`` / ``.pack()`` (precompute once per driver).
    full=True also applies dual-energy + C2P/P2C and returns (u, w, dmax);
    full=False stops after the flux sources (w passthrough, dmax zeros)."""
    from .pallas_stage import _interpret_mode

    if interpret is None:
        interpret = _interpret_mode()
    nx, ny, nz = grid.nx
    TY = _pick_ty(nx)                    # shadow: shape-aware y block
    YS = (TY + 4 + 7) // 8 * 8
    g1 = grid.ng[0]
    active_z = nz > 1
    wp = w_pad[0]
    u0_ = u0[0]
    u1_ = u1[0]
    CX, CY, CZ, ix = packed
    pcm = force_pcm or cfg.recon == "pcm"
    tz = _pick_tz(nz) if active_z else 1

    diff_spec = None
    if coeffs.diff is not None:
        diff_spec = (_dp_tuple(coeffs.diff.visc), _dp_tuple(coeffs.diff.cond))
    kern = functools.partial(
        _stage_kernel_curv, ng=g1, nx=nx, tz=tz, ty=TY, active_z=active_z,
        pcm=pcm, gamma=cfg.gamma, gam0=gam0, gam1=gam1, dfloor=cfg.dfloor,
        siefloor=cfg.siefloor, de_switch=cfg.de_switch, ix=ix, full=full,
        x1dep=coeffs.x1dep, x2dep=coeffs.x2dep,
        has_rot=any(np.any(f1 != 0) for f1, _ in coeffs.vrot),
        rf_omega=rf_omega, rsolver=cfg.rsolver, diff=diff_spec, cv=cfg.cv,
        grav=grav, cart=geo.is_cartesian(coeffs.coords),
        dxs=_uniform_dxs(grid, coeffs))
    dt = wp.dtype
    zsz = tz + 4 if active_z else 1
    # alignment pads (same scheme as the Cartesian kernel); skipped when
    # the driver's ghost fill already produced aligned extents (one copy)
    xp_al = -(-(nx + 2 * g1) // 128) * 128
    y_tgt = ny + 4 + (YS - (TY + 4))
    if wp.shape[-1] != xp_al or wp.shape[-2] != y_tgt:
        wp = jnp.pad(wp, [(0, 0), (0, 0), (0, y_tgt - wp.shape[-2]),
                          (0, xp_al - wp.shape[-1])])
    # pad coefficient matrices to the padded-extent lengths used in-kernel
    CXj = jnp.asarray(np.pad(CX, [(0, 0), (0, xp_al - CX.shape[1])]))
    # Y/Z rows: pre-window per block (window j covers padded rows
    # [j*ty, j*ty + ty + 4), whose max exactly hits the padded extent) so
    # the kernel only ever does static slices into its own window
    nyb = ny // TY
    CYW = np.stack([CY[:, jb * TY: jb * TY + TY + 4] for jb in range(nyb)])
    if active_z:
        nzb = nz // tz
        CZW = np.stack([CZ[:, ib * tz: ib * tz + tz + 4] for ib in range(nzb)])
    else:
        nzb = 1
        CZW = CZ[None, :, :1]
    # trailing singleton: z rows must load as 2-D (see kernel comment)
    CZW = CZW[..., None]
    CYWj = jnp.asarray(CYW)
    CZWj = jnp.asarray(CZW)
    blk = (6, tz, TY, nx)
    imap = lambda i, j: (0, i, j, 0)
    u0_, u1_, spec0, spec1 = rk_register_blocks(u0_, u1_, gam0, gam1, blk,
                                                imap, dt)
    u_new, w_new, dmax = pl.pallas_call(
        kern,
        grid=(nz // tz if active_z else 1, ny // TY),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec0,
            spec1,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + CYW.shape[1:], lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + CZW.shape[1:], lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((6, nz, ny, nx), dt),
            jax.ShapeDtypeStruct((6, nz, ny, nx), dt),
            jax.ShapeDtypeStruct((nz // tz if active_z else 1, ny // TY), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((6, zsz, YS, xp_al), dt),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(beta_dt, dt), (1,)),
      jnp.reshape(jnp.asarray(grav_dt, dt), (1,)), u0_, u1_, wp,
      CXj, CYWj, CZWj)
    return u_new[None], w_new[None], dmax


def supported_curv(grid, cfg) -> bool:
    """Fast-path gate for the curvilinear fused stage."""
    import os

    if os.environ.get("ARTEMIS_PALLAS", "1") == "0":
        return False
    from .pallas_stage import _interpret_mode

    try:
        on_tpu = jax.devices()[0].platform == "tpu" or _interpret_mode()
    except Exception:  # pragma: no cover
        return False
    # Cartesian grids are admitted too (geometry rows degenerate to units,
    # uniform-limiter recon, xyz gravity): the Driver only routes them here
    # when the dedicated source-free Cartesian kernel does not apply.
    return (on_tpu and cfg is not None
            and cfg.fluid == "gas" and cfg.nspecies == 1
            and cfg.rsolver in ("hllc", "hlle") and cfg.recon in ("plm", "pcm")
            and grid.nghost == 2
            and grid.nx[1] % _pick_ty(grid.nx[0]) == 0 and grid.nx[1] > 1
            and grid.nx[0] > 1
            and (grid.nx[2] == 1 or grid.nx[2] % _pick_tz(grid.nx[2]) == 0))


# ---------------------------------------------------------------------------
# six-face strip gather: the AMR fast path.  Same in-kernel halo gather as
# stage_curv_gather, but ALL six boundaries come from strip arrays instead
# of a periodic x3 wrap — the root node feeds static ic-cache strips, a
# refinement patch feeds the per-stage prolonged ghost slabs.  Eliminates
# the per-stage padded-array copy (jnp.pad + ghost fill) on every node of
# the fused AMR tree (cf. Parthenon's boundary buffers: only O(surface)
# ghost data moves, never the O(volume) padded state).
# ---------------------------------------------------------------------------
def _stage_kernel_curv_gather6(bdt_ref, gdt_ref, u0_ref, u1_ref, w_hbm,
                               sx_lo, sx_hi, sy_lo, sy_hi, sz_lo, sz_hi,
                               cx_ref, cyw_ref, czw_ref, u_ref, w_ref,
                               dm_ref, scratch, sxl_s, sxh_s, syl_s, syh_s,
                               szl_s, szh_s, sems, *, ng, nx, ny, nz, tz,
                               ty, active_z, pcm, gamma, gam0, gam1, dfloor,
                               siefloor, de_switch, ix, full, x1dep, x2dep,
                               has_rot, rf_omega, rsolver, diff, cv, grav,
                               cart=False, dxs=None):
    """All DMAs are unconditional (edge-tile strip rows replace clamped
    interior rows by value after the waits), so every semaphore is always
    signaled."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    z0 = i * tz
    y0 = j * ty
    nyb = ny // ty
    nzb = nz // tz if active_z else 1
    zsz = tz + 4 if active_z else 1

    # z halo planes: clamped in-bounds interior sources; the i==0 /
    # i==nzb-1 tiles overwrite them with the x3 strips after the waits
    zlo_src = jnp.maximum(z0 - 2, 0)
    zhi_src = jnp.minimum(z0 + tz, nz - 2)
    zregs = [(zlo_src, 2, 0), (z0, tz, 2), (zhi_src, 2, 2 + tz)]
    dmas = []
    sem_n = 0

    def start(src_ref, dst_ref):
        nonlocal sem_n
        d = pltpu.make_async_copy(src_ref, dst_ref, sems.at[sem_n])
        sem_n += 1
        d.start()
        dmas.append(d)

    ylo = pl.multiple_of(jnp.maximum(y0 - 8, 0), 8)
    yhi = pl.multiple_of(jnp.minimum(y0 + ty, ny - 8), 8)
    for (zs, zn, zd) in zregs:
        start(w_hbm.at[:, pl.ds(zs, zn), pl.ds(pl.multiple_of(y0, 8), ty), :],
              scratch.at[:, pl.ds(zd, zn), pl.ds(8, ty), :])
        start(w_hbm.at[:, pl.ds(zs, zn), pl.ds(ylo, 8), :],
              scratch.at[:, pl.ds(zd, zn), pl.ds(0, 8), :])
        start(w_hbm.at[:, pl.ds(zs, zn), pl.ds(yhi, 8), :],
              scratch.at[:, pl.ds(zd, zn), pl.ds(8 + ty, 8), :])
    # x2 strips (padded-z extents: slice at the tile's padded-z origin)
    start(sy_lo.at[:, pl.ds(z0, zsz), :, :], syl_s)
    start(sy_hi.at[:, pl.ds(z0, zsz), :, :], syh_s)
    # x1 strips (padded y/z extents; 128-lane padded)
    start(sx_lo.at[:, pl.ds(z0, zsz),
                   pl.ds(pl.multiple_of(y0, 8), _yst(ty)), :], sxl_s)
    start(sx_hi.at[:, pl.ds(z0, zsz),
                   pl.ds(pl.multiple_of(y0, 8), _yst(ty)), :], sxh_s)
    # x3 strips: this block's y window; strip y row = interior y + 8
    if active_z:
        start(sz_lo.at[:, :, pl.ds(pl.multiple_of(y0, 8), ty + 16), :],
              szl_s)
        start(sz_hi.at[:, :, pl.ds(pl.multiple_of(y0, 8), ty + 16), :],
              szh_s)

    bdt = bdt_ref[0]
    for d in dmas:
        d.wait()

    sall = scratch[...]
    if active_z:
        zl = jnp.where(i == 0, szl_s[...], sall[:, 0:2])
        zh = jnp.where(i == nzb - 1, szh_s[...], sall[:, 2 + tz:4 + tz])
        sall = jnp.concatenate([zl, sall[:, 2:2 + tz], zh], axis=1)
    lo_band = jnp.where(j == 0, syl_s[...], sall[:, :, 0:8])
    hi_band = jnp.where(j == nyb - 1, syh_s[...], sall[:, :, 8 + ty:16 + ty])
    sc = jnp.concatenate([lo_band[:, :, 6:8], sall[:, :, 8:8 + ty],
                          hi_band[:, :, 0:2]], axis=2)
    xl = sxl_s[...][:, :, :ty + 4, :ng]
    xh = sxh_s[...][:, :, :ty + 4, :ng]
    s = jnp.concatenate([xl, sc, xh], axis=-1)
    _curv_body(s, bdt, gdt_ref, u0_ref, u1_ref, cx_ref, cyw_ref, czw_ref,
               u_ref, w_ref, dm_ref, ng=ng, nx=nx, tz=tz, ty=ty,
               active_z=active_z, pcm=pcm, gamma=gamma, gam0=gam0, gam1=gam1,
               dfloor=dfloor, siefloor=siefloor, de_switch=de_switch, ix=ix,
               full=full, x1dep=x1dep, x2dep=x2dep, has_rot=has_rot,
               rf_omega=rf_omega, rsolver=rsolver, diff=diff, cv=cv,
               grav=grav, cart=cart, dxs=dxs)


def _stage_kernel_curv_gather6b(bdt_ref, gdt_ref, u0_ref, u1_ref, w_hbm,
                                sx, sy_lo, sy_hi, sz_lo, sz_hi, cx_ref,
                                cyw_ref, czw_ref, u_ref, w_ref, dm_ref,
                                slab, xs, sems, *, ng, nx, ny, nz, tz, ty,
                                active_z, pcm, gamma, gam0, gam1, dfloor,
                                siefloor, de_switch, ix, full, x1dep,
                                x2dep, has_rot, rf_omega, rsolver, cv,
                                grav, cart=False, dxs=None):
    """Minimal-DMA gather frontend (v2): each of the five USED slab
    regions gets exactly one predicated DMA (edge tiles read the strip,
    interior tiles the neighbor rows), landing directly at its slab
    position — no value selects and no z/y reassembly concats.  The
    (z-halo x y-band) corners are never read by the x/y/z sweeps (each
    sweep extends exactly one axis), so they get no DMA at all; gated to
    diff=None (the stress stencil reads mixed corners).  x1 ghosts
    arrive as ONE merged strip (lo ghosts at lanes [0,ng), hi at
    [ng,2ng)) — half the v1 strip traffic, one DMA."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    z0 = i * tz
    y0 = j * ty
    nyb = ny // ty
    nzb = nz // tz if active_z else 1
    zsz = tz + 4 if active_z else 1
    zin = 2 if active_z else 0     # slab plane of the first interior z

    def pred_copy(cond, src_edge, src_int, dst, sem):
        """One DMA into ``dst``: the strip window on edge tiles, the
        interior window elsewhere.  Exactly one copy signals ``sem``
        (equal byte counts), so the wait is unconditional."""
        @pl.when(cond)
        def _():
            pltpu.make_async_copy(src_edge, dst, sem).start()

        @pl.when(jnp.logical_not(cond))
        def _():
            pltpu.make_async_copy(src_int, dst, sem).start()

        return pltpu.make_async_copy(src_int, dst, sem)

    waits = []
    # interior (z-mid, y-mid)
    d0 = pltpu.make_async_copy(
        w_hbm.at[:, pl.ds(z0, tz), pl.ds(pl.multiple_of(y0, 8), ty), :],
        slab.at[:, pl.ds(zin, tz), pl.ds(8, ty), :], sems.at[0])
    d0.start()
    waits.append(d0)
    # y-mid z halos (read by the z sweep)
    if active_z:
        waits.append(pred_copy(
            i == 0,
            sz_lo.at[:, :, pl.ds(pl.multiple_of(y0 + 8, 8), ty), :],
            w_hbm.at[:, pl.ds(jnp.maximum(z0 - 2, 0), 2),
                     pl.ds(pl.multiple_of(y0, 8), ty), :],
            slab.at[:, pl.ds(0, 2), pl.ds(8, ty), :], sems.at[1]))
        waits.append(pred_copy(
            i == nzb - 1,
            sz_hi.at[:, :, pl.ds(pl.multiple_of(y0 + 8, 8), ty), :],
            w_hbm.at[:, pl.ds(jnp.minimum(z0 + tz, nz - 2), 2),
                     pl.ds(pl.multiple_of(y0, 8), ty), :],
            slab.at[:, pl.ds(2 + tz, 2), pl.ds(8, ty), :], sems.at[2]))
    # y bands over the interior z planes only (the band z-halo planes are
    # corners no sweep reads; strips carry padded-z rows, so the strip
    # window starts zin planes in)
    ylo = pl.multiple_of(jnp.maximum(y0 - 8, 0), 8)
    yhi = pl.multiple_of(jnp.minimum(y0 + ty, ny - 8), 8)
    waits.append(pred_copy(
        j == 0,
        sy_lo.at[:, pl.ds(z0 + zin, tz), :, :],
        w_hbm.at[:, pl.ds(z0, tz), pl.ds(ylo, 8), :],
        slab.at[:, pl.ds(zin, tz), pl.ds(0, 8), :], sems.at[3]))
    waits.append(pred_copy(
        j == nyb - 1,
        sy_hi.at[:, pl.ds(z0 + zin, tz), :, :],
        w_hbm.at[:, pl.ds(z0, tz), pl.ds(yhi, 8), :],
        slab.at[:, pl.ds(zin, tz), pl.ds(8 + ty, 8), :], sems.at[4]))
    # merged x1 strip (lo lanes [0,ng), hi lanes [ng,2ng))
    d5 = pltpu.make_async_copy(
        sx.at[:, pl.ds(z0, zsz), pl.ds(pl.multiple_of(y0, 8), _yst(ty)), :],
        xs, sems.at[5])
    d5.start()
    waits.append(d5)

    bdt = bdt_ref[0]
    for d in waits:
        d.wait()

    sl = slab[...]
    # sublane-concat the used band rows + interior so the result carries
    # no sublane offset into the lane concat below (Mosaic cannot concat
    # offset slices along a non-concat dimension)
    sc = jnp.concatenate([sl[:, :, 6:8], sl[:, :, 8:8 + ty],
                          sl[:, :, 8 + ty:10 + ty]], axis=2)
    xg = xs[...][:, :, :ty + 4, :]
    # hi ghosts live at lanes [ng, 2ng); rotate them to lane 0 — Mosaic
    # cannot concat a lane-offset slice directly
    xh = jnp.roll(xg, -ng, axis=-1)
    s = jnp.concatenate([xg[..., :ng], sc, xh[..., :ng]], axis=-1)
    _curv_body(s, bdt, gdt_ref, u0_ref, u1_ref, cx_ref, cyw_ref, czw_ref,
               u_ref, w_ref, dm_ref, ng=ng, nx=nx, tz=tz, ty=ty,
               active_z=active_z, pcm=pcm, gamma=gamma, gam0=gam0,
               gam1=gam1, dfloor=dfloor, siefloor=siefloor,
               de_switch=de_switch, ix=ix, full=full, x1dep=x1dep,
               x2dep=x2dep, has_rot=has_rot, rf_omega=rf_omega,
               rsolver=rsolver, diff=None, cv=cv, grav=grav, cart=cart,
               dxs=dxs)


def stage_curv_gather6(w_int, u0, u1, grid, cfg, gam0, gam1, beta_dt,
                       force_pcm, coeffs, packed, strips, rf_omega=0.0,
                       grav=None, grav_dt=0.0, interpret=None):
    """Fused full-mode stage with six-face strip gather; consumes the
    UNPADDED interior prims plus {("x1"|"x2"|"x3", side): strip} arrays
    (layouts: prepare_gather6_root_strips).  Diffusion-free stages run
    the v2 minimal-DMA kernel; the stress stencil (mixed-corner reads)
    keeps the v1 full-assembly kernel."""
    from .pallas_stage import _interpret_mode

    if interpret is None:
        interpret = _interpret_mode()
    if coeffs.diff is None:
        return _stage_curv_gather6_v2(
            w_int, u0, u1, grid, cfg, gam0, gam1, beta_dt, force_pcm,
            coeffs, packed, strips, rf_omega=rf_omega, grav=grav,
            grav_dt=grav_dt, interpret=interpret)
    return _stage_curv_gather6_v1(
        w_int, u0, u1, grid, cfg, gam0, gam1, beta_dt, force_pcm,
        coeffs, packed, strips, rf_omega=rf_omega, grav=grav,
        grav_dt=grav_dt, interpret=interpret)


def _stage_curv_gather6_v1(w_int, u0, u1, grid, cfg, gam0, gam1, beta_dt,
                           force_pcm, coeffs, packed, strips, rf_omega=0.0,
                           grav=None, grav_dt=0.0, interpret=None):
    """v1 frontend: full 13-DMA gather with value-select assembly."""
    nx, ny, nz = grid.nx
    TY = _pick_ty(nx)                    # shadow: shape-aware y block
    YS = (TY + 4 + 7) // 8 * 8
    g1 = grid.ng[0]
    active_z = nz > 1
    wi = w_int[0]
    u0_ = u0[0]
    u1_ = u1[0]
    CX, CY, CZ, ix = packed
    pcm = force_pcm or cfg.recon == "pcm"
    tz = _pick_tz(nz) if active_z else 1

    diff_spec = None
    if coeffs.diff is not None:
        diff_spec = (_dp_tuple(coeffs.diff.visc), _dp_tuple(coeffs.diff.cond))
    kern = functools.partial(
        _stage_kernel_curv_gather6, ng=g1, nx=nx, ny=ny, nz=nz, tz=tz,
        ty=TY, active_z=active_z, pcm=pcm, gamma=cfg.gamma, gam0=gam0,
        gam1=gam1, dfloor=cfg.dfloor, siefloor=cfg.siefloor,
        de_switch=cfg.de_switch, ix=ix, full=True, x1dep=coeffs.x1dep,
        x2dep=coeffs.x2dep,
        has_rot=any(np.any(f1 != 0) for f1, _ in coeffs.vrot),
        rf_omega=rf_omega, rsolver=cfg.rsolver, diff=diff_spec, cv=cfg.cv,
        grav=grav, cart=geo.is_cartesian(coeffs.coords),
        dxs=_uniform_dxs(grid, coeffs))
    dt = wi.dtype
    zsz = tz + 4 if active_z else 1
    nyb = ny // TY
    CXj = jnp.asarray(CX)
    CYW = np.stack([CY[:, jb * TY: jb * TY + TY + 4] for jb in range(nyb)])
    if active_z:
        nzb = nz // tz
        CZW = np.stack([CZ[:, ib * tz: ib * tz + tz + 4]
                        for ib in range(nzb)])
    else:
        nzb = 1
        CZW = CZ[None, :, :1]
    CZW = CZW[..., None]
    CYWj = jnp.asarray(CYW)
    CZWj = jnp.asarray(CZW)
    blk = (6, tz, TY, nx)
    imap = lambda i, j: (0, i, j, 0)
    from .pallas_stage import rk_register_blocks as _rrb

    u0_, u1_, spec0, spec1 = _rrb(u0_, u1_, gam0, gam1, blk, imap, dt)
    zstrip = (6, 2, ny + 16, nx)
    sz0 = strips.get(("x3", 0))
    sz1 = strips.get(("x3", 1))
    if sz0 is None:           # 2-D (inactive z): dummy rows, never read
        sz0 = jnp.zeros((6, 1, ny + 16, nx), dt)
        sz1 = sz0
        zstrip = (6, 1, ny + 16, nx)
    n_dmas = 18  # upper bound on per-block gather DMAs
    u_new, w_new, dmax = pl.pallas_call(
        kern,
        grid=(nzb, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec0,
            spec1,
            pl.BlockSpec(memory_space=pl.ANY),   # interior w
            pl.BlockSpec(memory_space=pl.ANY),   # x1 lo strip
            pl.BlockSpec(memory_space=pl.ANY),   # x1 hi strip
            pl.BlockSpec(memory_space=pl.ANY),   # x2 lo strip
            pl.BlockSpec(memory_space=pl.ANY),   # x2 hi strip
            pl.BlockSpec(memory_space=pl.ANY),   # x3 lo strip
            pl.BlockSpec(memory_space=pl.ANY),   # x3 hi strip
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + CYW.shape[1:], lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + CZW.shape[1:], lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((6, nz, ny, nx), dt),
            jax.ShapeDtypeStruct((6, nz, ny, nx), dt),
            jax.ShapeDtypeStruct((nzb, nyb), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((6, zsz, TY + 16, nx), dt),
            pltpu.VMEM((6, zsz, _yst(TY), 128), dt),
            pltpu.VMEM((6, zsz, _yst(TY), 128), dt),
            pltpu.VMEM((6, zsz, 8, nx), dt),
            pltpu.VMEM((6, zsz, 8, nx), dt),
            pltpu.VMEM((6, zstrip[1], TY + 16, nx), dt),
            pltpu.VMEM((6, zstrip[1], TY + 16, nx), dt),
            pltpu.SemaphoreType.DMA((n_dmas,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(beta_dt, dt), (1,)),
      jnp.reshape(jnp.asarray(grav_dt, dt), (1,)), u0_, u1_, wi,
      strips[("x1", 0)], strips[("x1", 1)], strips[("x2", 0)],
      strips[("x2", 1)], sz0, sz1, CXj, CYWj, CZWj)
    return u_new[None], w_new[None], dmax


def _stage_curv_gather6_v2(w_int, u0, u1, grid, cfg, gam0, gam1, beta_dt,
                           force_pcm, coeffs, packed, strips, rf_omega=0.0,
                           grav=None, grav_dt=0.0, interpret=None):
    """v2 frontend: 6 predicated region DMAs per block, merged x1 strip."""
    nx, ny, nz = grid.nx
    TY = _pick_ty(nx)                    # shadow: shape-aware y block
    YS = (TY + 4 + 7) // 8 * 8
    g1 = grid.ng[0]
    active_z = nz > 1
    wi = w_int[0]
    u0_ = u0[0]
    u1_ = u1[0]
    CX, CY, CZ, ix = packed
    pcm = force_pcm or cfg.recon == "pcm"
    tz = _pick_tz(nz) if active_z else 1

    kern = functools.partial(
        _stage_kernel_curv_gather6b, ng=g1, nx=nx, ny=ny, nz=nz, tz=tz,
        ty=TY, active_z=active_z, pcm=pcm, gamma=cfg.gamma, gam0=gam0,
        gam1=gam1, dfloor=cfg.dfloor, siefloor=cfg.siefloor,
        de_switch=cfg.de_switch, ix=ix, full=True, x1dep=coeffs.x1dep,
        x2dep=coeffs.x2dep,
        has_rot=any(np.any(f1 != 0) for f1, _ in coeffs.vrot),
        rf_omega=rf_omega, rsolver=cfg.rsolver, cv=cfg.cv,
        grav=grav, cart=geo.is_cartesian(coeffs.coords),
        dxs=_uniform_dxs(grid, coeffs))
    dt = wi.dtype
    zsz = tz + 4 if active_z else 1
    nyb = ny // TY
    CXj = jnp.asarray(CX)
    CYW = np.stack([CY[:, jb * TY: jb * TY + TY + 4] for jb in range(nyb)])
    if active_z:
        nzb = nz // tz
        CZW = np.stack([CZ[:, ib * tz: ib * tz + tz + 4]
                        for ib in range(nzb)])
    else:
        nzb = 1
        CZW = CZ[None, :, :1]
    CZW = CZW[..., None]
    CYWj = jnp.asarray(CYW)
    CZWj = jnp.asarray(CZW)
    blk = (6, tz, TY, nx)
    imap = lambda i, j: (0, i, j, 0)
    from .pallas_stage import rk_register_blocks as _rrb

    u0_, u1_, spec0, spec1 = _rrb(u0_, u1_, gam0, gam1, blk, imap, dt)
    # merged x1 strip: lo ghost lanes [0,ng), hi ghost lanes [ng,2ng)
    sxl = strips[("x1", 0)]
    sxh = strips[("x1", 1)]
    sxm = jnp.concatenate([sxl[..., :g1], sxh[..., :g1]], axis=-1)
    sxm = jnp.pad(sxm, [(0, 0), (0, 0), (0, 0), (0, 128 - 2 * g1)])
    zstrip = (6, 2, ny + 16, nx)
    sz0 = strips.get(("x3", 0))
    sz1 = strips.get(("x3", 1))
    if sz0 is None:           # 2-D (inactive z): dummy rows, never read
        sz0 = jnp.zeros((6, 1, ny + 16, nx), dt)
        sz1 = sz0
        zstrip = (6, 1, ny + 16, nx)
    u_new, w_new, dmax = pl.pallas_call(
        kern,
        grid=(nzb, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec0,
            spec1,
            pl.BlockSpec(memory_space=pl.ANY),   # interior w
            pl.BlockSpec(memory_space=pl.ANY),   # merged x1 strip
            pl.BlockSpec(memory_space=pl.ANY),   # x2 lo strip
            pl.BlockSpec(memory_space=pl.ANY),   # x2 hi strip
            pl.BlockSpec(memory_space=pl.ANY),   # x3 lo strip
            pl.BlockSpec(memory_space=pl.ANY),   # x3 hi strip
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + CYW.shape[1:], lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + CZW.shape[1:], lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((6, nz, ny, nx), dt),
            jax.ShapeDtypeStruct((6, nz, ny, nx), dt),
            jax.ShapeDtypeStruct((nzb, nyb), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((6, zsz, TY + 16, nx), dt),   # slab
            pltpu.VMEM((6, zsz, _yst(TY), 128), dt),  # merged x strip
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(beta_dt, dt), (1,)),
      jnp.reshape(jnp.asarray(grav_dt, dt), (1,)), u0_, u1_, wi,
      sxm, strips[("x2", 0)], strips[("x2", 1)], sz0, sz1,
      CXj, CYWj, CZWj)
    return u_new[None], w_new[None], dmax


def _stage_kernel_curv_gather6n(bdt_ref, gdt_ref, u0_ref, u1_ref, w_hbm,
                                sx, sy_lo, sy_hi, sz_lo, sz_hi, cx_ref,
                                cyw_ref, czw_ref, sdx_ref, u_ref, w_ref,
                                dm_ref, slab, xs, sems, *, ng, nx, ny, nz,
                                tz, ty, active_z, pcm, gamma, gam0, gam1,
                                dfloor, siefloor, de_switch, ix, full,
                                x1dep, x2dep, has_rot, rf_omega, rsolver,
                                cv, grav, cart=False, lean_smem=False):
    """Node-batched v2 gather frontend: grid = (node, z, y) over a STACK
    of same-shaped tree nodes — one pallas_call advances every level, so
    the per-launch pipeline warmup/dispatch amortizes over the whole
    tree (the kernel family runs ~2.5x faster per zone at large grids).
    Inputs arrive stacked on a leading node axis; the manual gather DMAs
    index it with program_id(0)."""
    i0 = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nyb = ny // ty
    nzb = nz // tz if active_z else 1
    zsz = tz + 4 if active_z else 1
    zin = 2 if active_z else 0

    def pred_copy(cond, src_edge, src_int, dst, sem):
        @pl.when(cond)
        def _():
            pltpu.make_async_copy(src_edge, dst, sem).start()

        @pl.when(jnp.logical_not(cond))
        def _():
            pltpu.make_async_copy(src_int, dst, sem).start()

        return pltpu.make_async_copy(src_int, dst, sem)

    waits = []
    d0 = pltpu.make_async_copy(
        w_hbm.at[i0, :, pl.ds(i * tz, tz),
                 pl.ds(pl.multiple_of(j * ty, 8), ty), :],
        slab.at[:, pl.ds(zin, tz), pl.ds(8, ty), :], sems.at[0])
    d0.start()
    waits.append(d0)
    z0 = i * tz
    y0 = j * ty
    if active_z:
        waits.append(pred_copy(
            i == 0,
            sz_lo.at[i0, :, :, pl.ds(pl.multiple_of(y0 + 8, 8), ty), :],
            w_hbm.at[i0, :, pl.ds(jnp.maximum(z0 - 2, 0), 2),
                     pl.ds(pl.multiple_of(y0, 8), ty), :],
            slab.at[:, pl.ds(0, 2), pl.ds(8, ty), :], sems.at[1]))
        waits.append(pred_copy(
            i == nzb - 1,
            sz_hi.at[i0, :, :, pl.ds(pl.multiple_of(y0 + 8, 8), ty), :],
            w_hbm.at[i0, :, pl.ds(jnp.minimum(z0 + tz, nz - 2), 2),
                     pl.ds(pl.multiple_of(y0, 8), ty), :],
            slab.at[:, pl.ds(2 + tz, 2), pl.ds(8, ty), :], sems.at[2]))
    ylo = pl.multiple_of(jnp.maximum(y0 - 8, 0), 8)
    yhi = pl.multiple_of(jnp.minimum(y0 + ty, ny - 8), 8)
    waits.append(pred_copy(
        j == 0,
        sy_lo.at[i0, :, pl.ds(z0 + zin, tz), :, :],
        w_hbm.at[i0, :, pl.ds(z0, tz), pl.ds(ylo, 8), :],
        slab.at[:, pl.ds(zin, tz), pl.ds(0, 8), :], sems.at[3]))
    waits.append(pred_copy(
        j == nyb - 1,
        sy_hi.at[i0, :, pl.ds(z0 + zin, tz), :, :],
        w_hbm.at[i0, :, pl.ds(z0, tz), pl.ds(yhi, 8), :],
        slab.at[:, pl.ds(zin, tz), pl.ds(8 + ty, 8), :], sems.at[4]))
    d5 = pltpu.make_async_copy(
        sx.at[i0, :, pl.ds(z0, zsz),
              pl.ds(pl.multiple_of(y0, 8), _yst(ty)), :],
        xs, sems.at[5])
    d5.start()
    waits.append(d5)

    bdt = bdt_ref[0]
    for d in waits:
        d.wait()

    sl = slab[...]
    sc = jnp.concatenate([sl[:, :, 6:8], sl[:, :, 8:8 + ty],
                          sl[:, :, 8 + ty:10 + ty]], axis=2)
    xg = xs[...][:, :, :ty + 4, :]
    xh = jnp.roll(xg, -ng, axis=-1)
    s = jnp.concatenate([xg[..., :ng], sc, xh[..., :ng]], axis=-1)
    _curv_body(s, bdt, gdt_ref, u0_ref, u1_ref, cx_ref, cyw_ref, czw_ref,
               u_ref, w_ref, dm_ref, ng=ng, nx=nx, tz=tz, ty=ty,
               active_z=active_z, pcm=pcm, gamma=gamma, gam0=gam0,
               gam1=gam1, dfloor=dfloor, siefloor=siefloor,
               de_switch=de_switch, ix=ix, full=full, x1dep=x1dep,
               x2dep=x2dep, has_rot=has_rot, rf_omega=rf_omega,
               rsolver=rsolver, diff=None, cv=cv, grav=grav, cart=cart,
               sdx_ref=sdx_ref if lean_smem else None, lead=True)


def stage_curv_gather6_batched(ws, u0s, u1s, grid, cfg, gam0, gam1,
                               beta_dt, force_pcm, coeffs_list,
                               packed_list, strips_list, rf_omega=0.0,
                               grav=None, grav_dt=0.0, dxs_list=None,
                               interpret=None):
    """One fused RK stage for N same-shaped tree nodes in ONE launch.

    ``ws``/``u0s``/``u1s``: per-node [1,6,nz,ny,nx] arrays (stacked
    here); ``coeffs_list``/``packed_list``/``strips_list``: per-node
    CurvCoeffs / pack() / gather6 strip dicts.  The grav/rf scalars must
    be shared (per-node geometry enters through the coefficient rows).
    ``dxs_list`` (per-node uniform-Cartesian (dx1,dx2,dx3) tuples, or
    None entries) enables the lean Cartesian body with the per-node
    1/dx scalars riding SMEM — per-node dx differs across tree levels,
    so they cannot be the single-launch compile-time constants.
    Returns (u_all, w_all, dmax) with a leading node axis."""
    from .pallas_stage import _interpret_mode

    if interpret is None:
        interpret = _interpret_mode()
    nx, ny, nz = grid.nx
    TY = _pick_ty(nx)                    # shadow: shape-aware y block
    YS = (TY + 4 + 7) // 8 * 8
    g1 = grid.ng[0]
    active_z = nz > 1
    N = len(ws)
    w_all = jnp.stack([w[0] for w in ws])
    u0_all = jnp.stack([u[0] for u in u0s])
    u1_all = jnp.stack([u[0] for u in u1s])
    CX0, CY0, CZ0, ix = packed_list[0]
    pcm = force_pcm or cfg.recon == "pcm"
    tz = _pick_tz(nz) if active_z else 1
    co0 = coeffs_list[0]

    cart = geo.is_cartesian(co0.coords)
    lean_smem = (cart and dxs_list is not None
                 and all(d is not None for d in dxs_list))
    kern = functools.partial(
        _stage_kernel_curv_gather6n, ng=g1, nx=nx, ny=ny, nz=nz, tz=tz,
        ty=TY, active_z=active_z, pcm=pcm, gamma=cfg.gamma, gam0=gam0,
        gam1=gam1, dfloor=cfg.dfloor, siefloor=cfg.siefloor,
        de_switch=cfg.de_switch, ix=ix, full=True, x1dep=co0.x1dep,
        x2dep=co0.x2dep,
        has_rot=any(np.any(f1 != 0) for f1, _ in co0.vrot),
        rf_omega=rf_omega, rsolver=cfg.rsolver, cv=cfg.cv,
        grav=grav, cart=cart, lean_smem=lean_smem)
    dt = w_all.dtype
    if lean_smem:
        sdx = jnp.asarray(np.array([[1.0 / d[0], 1.0 / d[1], 1.0 / d[2]]
                                    for d in dxs_list], np.float64), dt)
    else:   # dummy, never read (lean_smem is a compile-time gate)
        sdx = jnp.zeros((N, 3), dt)
    zsz = tz + 4 if active_z else 1
    nyb = ny // TY
    nzb = nz // tz if active_z else 1
    CXs = jnp.asarray(np.stack([pk[0] for pk in packed_list]))
    CYWs = np.stack([
        np.stack([pk[1][:, jb * TY: jb * TY + TY + 4] for jb in range(nyb)])
        for pk in packed_list])
    if active_z:
        CZWs = np.stack([
            np.stack([pk[2][:, ib * tz: ib * tz + tz + 4]
                      for ib in range(nzb)]) for pk in packed_list])
    else:
        CZWs = np.stack([pk[2][None, :, :1] for pk in packed_list])
    CZWs = CZWs[..., None]
    CYWj = jnp.asarray(CYWs)
    CZWj = jnp.asarray(CZWs)
    blk = (1, 6, tz, TY, nx)
    imap = lambda i0, i, j: (i0, 0, i, j, 0)
    live = pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)
    dead = pl.BlockSpec((1, 6, 1, 1, 128),
                        lambda i0, i, j: (0, 0, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    dummy = jnp.zeros((1, 6, 1, 1, 128), dt)
    spec0, spec1 = live, live
    if gam0 == 0.0:
        u0_all, spec0 = dummy, dead
    if gam1 == 0.0:
        u1_all, spec1 = dummy, dead
    # stacked strips; x1 merged (lo ghosts at lanes [0,ng), hi at [ng,2ng))
    sxm = jnp.stack([
        jnp.pad(jnp.concatenate([st[("x1", 0)][..., :g1],
                                 st[("x1", 1)][..., :g1]], axis=-1),
                [(0, 0), (0, 0), (0, 0), (0, 128 - 2 * g1)])
        for st in strips_list])
    sy0 = jnp.stack([st[("x2", 0)] for st in strips_list])
    sy1 = jnp.stack([st[("x2", 1)] for st in strips_list])
    if active_z:
        sz0 = jnp.stack([st[("x3", 0)] for st in strips_list])
        sz1 = jnp.stack([st[("x3", 1)] for st in strips_list])
    else:
        sz0 = jnp.zeros((N, 6, 1, ny + 16, nx), dt)
        sz1 = sz0
    u_new, w_new, dmax = pl.pallas_call(
        kern,
        grid=(N, nzb, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec0,
            spec1,
            pl.BlockSpec(memory_space=pl.ANY),   # stacked interior w
            pl.BlockSpec(memory_space=pl.ANY),   # merged x1 strips
            pl.BlockSpec(memory_space=pl.ANY),   # x2 lo strips
            pl.BlockSpec(memory_space=pl.ANY),   # x2 hi strips
            pl.BlockSpec(memory_space=pl.ANY),   # x3 lo strips
            pl.BlockSpec(memory_space=pl.ANY),   # x3 hi strips
            pl.BlockSpec((1,) + CXs.shape[1:],
                         lambda i0, i, j: (i0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1) + CYWs.shape[2:],
                         lambda i0, i, j: (i0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1) + CZWs.shape[2:],
                         lambda i0, i, j: (i0, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # per-node 1/dx
        ],
        out_specs=(
            live,
            live,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, 6, nz, ny, nx), dt),
            jax.ShapeDtypeStruct((N, 6, nz, ny, nx), dt),
            jax.ShapeDtypeStruct((N, nzb, nyb), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((6, zsz, TY + 16, nx), dt),
            pltpu.VMEM((6, zsz, _yst(TY), 128), dt),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(beta_dt, dt), (1,)),
      jnp.reshape(jnp.asarray(grav_dt, dt), (1,)), u0_all, u1_all, w_all,
      sxm, sy0, sy1, sz0, sz1, CXs, CYWj, CZWj, sdx)
    return u_new, w_new, dmax


def gather6_batch_ok(nodes, bundles):
    """May the whole tree run as ONE node-batched gather6 launch?  Every
    node must share the grid shape, ghost width, Cartesian-lean body
    (no diffusion / folded RF), and identical grav scalars."""
    if len(nodes) < 2:
        return False
    g0 = nodes[0].grid
    gs0 = bundles[0][3]
    for node, (co, _, rfo, gspec, *_rest) in zip(nodes, bundles):
        g = node.grid
        if (g.nx != g0.nx or g.ng != g0.ng or node.curv
                or co.diff is not None or rfo != 0.0):
            return False
        if (gspec is None) != (gs0 is None):
            return False
        if gspec is not None and tuple(gspec) != tuple(gs0):
            return False
    return True


def prepare_gather6_root_strips(grid, ic_caches):
    """Static six-face strips for a root node whose boundaries are all
    ``ic`` value caches.  x1/x2 layouts match prepare_gather_strips; the
    x3 strips are [6, ng, ny+16, nx] with interior y at row 8 (margin
    rows edge-replicated; they are replaced by the x1/x2 strips in the
    kernel's band assembly)."""
    out = prepare_gather_strips(grid, ic_caches)
    ng = grid.nghost
    nx, ny, nz = grid.nx
    if nz <= 1:
        return out
    for side in (0, 1):
        a = np.asarray(ic_caches[(3, side)])[0]   # [6, ng, yp, xp]
        st = np.zeros((6, ng, ny + 16, nx), a.dtype)
        st[:, :, 8:8 + ny, :] = a[:, :, ng:ng + ny, ng:ng + nx]
        st[:, :, :8, :] = st[:, :, 8:9, :]
        st[:, :, 8 + ny:, :] = st[:, :, 7 + ny:8 + ny, :]
        out[("x3", side)] = st
    return out


def gather6_supported(grid) -> bool:
    """Grid-shape gate for the six-face strip kernel (boundary sourcing
    is the caller's responsibility: ic caches or prolonged slabs)."""
    nx, ny, nz = grid.nx
    return (grid.nghost == 2 and nx % 128 == 0 and ny % _pick_ty(nx) == 0
            and nz > 1 and nz % _pick_tz(nz) == 0)
