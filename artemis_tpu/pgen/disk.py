"""Protoplanetary disk problem (reference: src/pgen/disk.hpp).

Axisymmetric sub-Keplerian disk in pressure-rotational equilibrium around a
point mass: vertically isothermal or polytropic structure, cavity /
exponential cutoffs, optional viscous ``mdot`` steady state, dust at the
Keplerian flow.  Centrifugal balance is built from the *numerical* pressure
gradient on the actual grid (ComputeDiskProfile, disk.hpp:130-243) so the
initial state is discretely stationary.

Custom boundaries: ``ic`` (re-evaluate the IC in ghosts), ``extrap``
(log-extrapolation on cylinders, disk.hpp:637-815), ``visc`` (viscous
steady-state inflow, disk.hpp:418-592).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from . import Problem
from ..geometry import geometry as geo

FUZZ = 1e-300


@dataclass
class DiskParams:
    r0: float
    h0: float
    p: float
    q: float
    flare: float
    rho0: float
    dens_min: float
    pres_min: float
    gm: float
    Omega0: float
    l0: float
    omf: float
    dust_to_gas: float
    rexp: float
    rcav: float
    Gamma: float
    gamma_gas: float
    alpha: float
    nu0: float
    nu_indx: float
    mdot: float
    temp_soft2: float
    quiet_start: bool


def make_params(pin, gas_cfg, gm: float, omf: float) -> DiskParams:
    r0 = pin.get_or_add_real("problem", "r0", 1.0)
    Omega0 = math.sqrt(gm / r0**3)
    rho0 = pin.get_or_add_real("problem", "rho0", 1.0)
    gamma_gas = gas_cfg.gamma
    Gamma = pin.get_or_add_real("problem", "polytropic_index", gamma_gas)
    q = pin.get_or_add_real("problem", "tslope", -1e300)
    flare = pin.get_or_add_real("problem", "flare", -1e300)
    if flare == -1e300 and q == -1e300:
        raise ValueError("Set flare or tslope in <problem>")
    if flare == -1e300:
        flare = 0.5 * (1.0 + q)
    elif q == -1e300:
        q = 2.0 * flare - 1.0
    else:
        raise ValueError("Set either flare or tslope in <problem>, not both!")

    alpha, nu0, nu_indx, mdot = 0.0, 0.0, 0.0, 0.0
    if pin.get_or_add_bool("physics", "viscosity", False):
        vtype = pin.get_str("gas/viscosity", "type")
        if vtype == "alpha":
            alpha = pin.get_real("gas/viscosity", "alpha")
            nu0 = alpha * gamma_gas * (pin.get_or_add_real("problem", "h0", 0.05)
                                       * r0 * Omega0) ** 2
            nu_indx = 1.5 + q
        elif vtype == "powerlaw":
            nu0 = pin.get_real("gas/viscosity", "nu")
            nu_indx = pin.get_or_add_real("gas/viscosity", "r_exp", 0.0)
        else:
            raise ValueError("Disk pgen needs alpha or powerlaw viscosity")
        if pin.exists("problem", "mdot"):
            mdot = pin.get_real("problem", "mdot")
            rho0 = mdot / (3.0 * math.pi * nu0)
        else:
            mdot = 3.0 * math.pi * nu0 * rho0
    return DiskParams(
        r0=r0,
        h0=pin.get_or_add_real("problem", "h0", 0.05),
        p=pin.get_or_add_real("problem", "dslope", -2.25),
        q=q,
        flare=flare,
        rho0=rho0,
        dens_min=pin.get_or_add_real("problem", "dens_min", 1.0e-5),
        pres_min=pin.get_or_add_real("problem", "pres_min", 1.0e-8),
        gm=gm,
        Omega0=Omega0,
        l0=pin.get_or_add_real("problem", "l0", 0.0),
        omf=omf,
        dust_to_gas=pin.get_or_add_real("problem", "dust_to_gas", 0.01),
        rexp=pin.get_or_add_real("problem", "rexp", 0.0),
        rcav=pin.get_or_add_real("problem", "rcav", 0.0),
        Gamma=Gamma,
        gamma_gas=gamma_gas,
        alpha=alpha,
        nu0=nu0,
        nu_indx=nu_indx,
        mdot=mdot,
        temp_soft2=pin.get_or_add_real("problem", "temp_soft", 0.0),
        quiet_start=pin.get_or_add_bool("problem", "quiet_start", False),
    )


def den_profile(dp: DiskParams, R, z):
    """Density at cylindrical (R, z) (DenProfile, disk.hpp:72-90)."""
    r = np.sqrt(R * R + z * z)
    h = dp.h0 * (R / dp.r0) ** dp.flare
    exp_fac = 1.0 if dp.rexp == 0.0 else np.exp(-((R / dp.rexp) ** 2))
    dmid = (dp.rho0 * (R / dp.r0) ** dp.p
            * (1.0 - dp.l0 * np.sqrt(dp.r0 / R))
            * (dp.dens_min / dp.rho0
               + (1.0 - dp.dens_min / dp.rho0) * np.exp(-((dp.rcav / R) ** 12)))
            * exp_fac)
    sint = np.where(r == 0.0, 1.0, R / np.where(r == 0.0, 1.0, r))
    efac = (1.0 - sint) / (h * h)
    if dp.Gamma == 1.0:
        return np.maximum(dp.dens_min, dmid * np.exp(-efac))
    pfac = 1.0 - (dp.Gamma - 1.0) * efac
    return np.maximum(dp.dens_min,
                      dmid * np.maximum(pfac, 0.0) ** (1.0 / (dp.Gamma - 1.0)))


def temp_profile(dp: DiskParams, R, z):
    """Temperature at cylindrical (R, z) (TempProfile, disk.hpp:96-106)."""
    rho = den_profile(dp, R, z)
    rho0 = den_profile(dp, R, 0.0 * z)
    H = R * dp.h0 * (R / dp.r0) ** dp.flare
    ir1 = 1.0 / np.sqrt(R * R + dp.temp_soft2)
    omk2 = dp.Omega0**2 * ir1**3
    T0 = omk2 * H * H / dp.Gamma
    return T0 * (rho / rho0) ** (dp.Gamma - 1.0)


def pres_profile(dp: DiskParams, cv, R, z, T=None):
    """max(pres_min, P(rho, T)) (PresProfile, disk.hpp:112-116)."""
    df = den_profile(dp, R, z)
    tf = temp_profile(dp, R, z) if T is None else T
    P = (dp.gamma_gas - 1.0) * df * cv * tf
    return np.maximum(dp.pres_min, P)


def viscosity_profile(dp: DiskParams, R):
    return dp.nu0 * (R / dp.r0) ** dp.nu_indx


def make_rt_fn(pin, grid, gm):
    """Potential-radius proxy for nbody_temp disks: rt = -gm/Phi_nbody(x)
    with the softened potential of all particles at t=0 (disk.hpp:146-218,
    NBodyPotential nbody_gravity.hpp:224-234).  Returns rt(x1,x2,x3)."""
    from ..nbody import setup_particles
    from ..units import Constants, Units

    constants = Constants.from_units(Units.from_input(pin))
    G = constants.G_code
    parts, _ = setup_particles(pin, G, pin.get_or_add_real("nbody", "mtot", -1.0))

    def idr1(rs, spline, dr2):
        # numpy replica of Particle::idr1 (particle_base.hpp:115-141)
        fz = 1e-300
        rs2 = rs * rs
        if not spline:
            return 1.0 / np.sqrt(dr2 + rs2 + fz)
        dr1 = np.sqrt(dr2)
        hinv = 1.0 / (rs + fz)
        # both where-branches evaluate; outside the softening radius the
        # unused inner branch may overflow (u ~ dr/rs huge when rs ~ 0) —
        # harmless, silence the numpy warnings
        with np.errstate(invalid="ignore", over="ignore"):
            u2 = dr2 / (rs2 + fz)
            u = np.sqrt(u2)
            u3, u4 = u * u2, u2 * u2
            u5 = u4 * u
            inner = np.where(
                u < 0.5,
                hinv * (14.0 / 5.0 - 16.0 / 3.0 * u2 + 48.0 / 5.0 * u4
                        - 32.0 / 5.0 * u5),
                hinv * (16.0 / 5.0 - 32.0 / 3.0 * u2 + 16.0 * u3
                        - 48.0 / 5.0 * u4 + 32.0 / 15.0 * u5
                        - 1.0 / (15.0 * u + fz)))
            return np.where(dr2 >= rs2, 1.0 / (dr1 + fz), inner)

    def rt(x1, x2, x3):
        cx, cy, cz = geo.convert_to_cart(grid.coords, x1, x2, x3)
        pot = 0.0
        for p in parts.values():
            dr2 = (cx - p.x) ** 2 + (cy - p.y) ** 2 + (cz - p.z) ** 2
            pot = pot - G * p.m * idr1(p.rs, p.spline, dr2)
        return -gm / pot

    return rt


def disk_ic(dp: DiskParams, grid, cv, sl=None, do_dust=False, rt_fn=None):
    """Evaluate the equilibrium IC on (a slice of) the padded grid.

    Returns (w_gas [6,...], w_dust [4,...] or None) numpy arrays over the
    region selected by ``sl`` (a [z,y,x] slice tuple into the entire grid;
    None = interior).
    """
    g = grid.geom
    if sl is None:
        sl = grid.int_slices
    s3, s2, s1 = sl
    x1v = g.xv1[s1][None, None, :]
    x2v = g.xv2[s2][None, :, None]
    x3v = g.xv3[s3][:, None, None]
    shape = (len(g.xv3[s3]), len(g.xv2[s2]), len(g.xv1[s1]))
    c = grid.coords

    Rc, phic, zc = geo.convert_to_cyl(c, x1v, x2v, x3v)
    ex = geo.vec_to_cyl(c, x1v, x2v, x3v)   # rows: problem basis in (R,phi,z)

    gdens = den_profile(dp, Rc, zc)
    # nbody_temp: temperature radius from the particle potential proxy
    rtc = rt_fn(x1v, x2v, x3v) if rt_fn is not None else Rc
    gtemp = temp_profile(dp, rtc, zc)

    # numerical grad(P) from the 6 cell-face points (disk.hpp:151-210)
    xf1 = (g.xf1[s1.start:s1.stop][None, None, :],
           g.xf1[s1.start + 1:s1.stop + 1][None, None, :])
    xf2 = (g.xf2[s2.start:s2.stop][None, :, None],
           g.xf2[s2.start + 1:s2.stop + 1][None, :, None])
    xf3 = (g.xf3[s3.start:s3.stop][:, None, None],
           g.xf3[s3.start + 1:s3.stop + 1][:, None, None])
    h = lambda d: g.hx(d, x1v, x2v)
    widths = [h(1) * (xf1[1] - xf1[0]), h(2) * (xf2[1] - xf2[0]),
              h(3) * (xf3[1] - xf3[0])]

    pgrad = []
    faces = [
        ((xf1[0], x2v, x3v), (xf1[1], x2v, x3v)),
        ((x1v, xf2[0], x3v), (x1v, xf2[1], x3v)),
        ((x1v, x2v, xf3[0]), (x1v, x2v, xf3[1])),
    ]
    for d in range(3):
        (fm, fp) = faces[d]
        Rm, _, zm = geo.convert_to_cyl(c, *fm)
        Rp, _, zp = geo.convert_to_cyl(c, *fp)
        Tm = temp_profile(dp, rt_fn(*fm), zm) if rt_fn is not None else None
        Tp = temp_profile(dp, rt_fn(*fp), zp) if rt_fn is not None else None
        pfm = pres_profile(dp, cv, Rm, zm, T=Tm)
        pfp = pres_profile(dp, cv, Rp, zp, T=Tp)
        # if either face pressure floors out, zero the gradient
        # (disk.hpp:173-175 clamps both to pres_min)
        floored = np.logical_or(pfm <= dp.pres_min, pfp <= dp.pres_min)
        grad = np.where(floored, 0.0, (pfp - pfm) / widths[d])
        pgrad.append(grad)

    eR = [ex[0][0], ex[1][0], ex[2][0]]
    dpdr = sum(pgrad[d] * eR[d] for d in range(3))

    r = rtc if rt_fn is not None else np.sqrt(Rc * Rc + zc * zc)
    omk2 = dp.gm / np.maximum(r, FUZZ) ** 3
    vk2 = omk2 * Rc * Rc
    vp = np.sqrt(np.maximum(vk2 + dpdr * Rc / gdens, 0.0))
    nu = viscosity_profile(dp, rtc)
    vr = 0.0 if dp.quiet_start else -1.5 * nu / Rc
    vcyl = [vr * np.ones_like(vp), vp - dp.omf * Rc, np.zeros_like(vp)]
    gv = [sum(vcyl[m] * ex[i][m] for m in range(3)) for i in range(3)]

    b = lambda a: np.ascontiguousarray(np.broadcast_to(a, shape))
    sie = cv * gtemp
    pres = (dp.gamma_gas - 1.0) * gdens * sie
    w_gas = np.stack([b(gdens), b(gv[0]), b(gv[1]), b(gv[2]), b(pres), b(sie)])[None]

    w_dust = None
    if do_dust:
        ddens = dp.dust_to_gas * gdens
        vkep = [np.zeros_like(vp), np.sqrt(vk2) - dp.omf * Rc, np.zeros_like(vp)]
        dv = [sum(vkep[m] * ex[i][m] for m in range(3)) for i in range(3)]
        w_dust = np.stack([b(ddens), b(dv[0]), b(dv[1]), b(dv[2])])[None]
    return w_gas, w_dust


# ---------------------------------------------------------------------------
# boundary conditions
# ---------------------------------------------------------------------------
def _ghost_slices(grid, d, side):
    """[z,y,x] slice tuple of the ghost slab for boundary (d, side).

    Transverse dims use absolute extents (not slice(None)): the padded
    array may carry trailing DMA-alignment rows beyond shape_entire that
    the precomputed ghost caches must not be required to cover."""
    ng = grid.nghost
    n = grid.nx[d - 1]
    se = grid.shape_entire
    sl = [slice(0, se[0]), slice(0, se[1]), slice(0, se[2])]
    sl[3 - d] = slice(0, ng) if side == 0 else slice(ng + n, n + 2 * ng)
    return tuple(sl)


def make_ic_bc(dp: DiskParams, grid, cv, nd_dust: int, rt_fn=None):
    """``ic`` BC: the IC evaluated in the ghost zones (DiskBoundaryIC)."""
    gas_cache = {}
    dust_cache = {}
    # full-extent slices (all of the non-boundary dims incl. their ghosts)
    full = (slice(0, grid.shape_entire[0]), slice(0, grid.shape_entire[1]),
            slice(0, grid.shape_entire[2]))

    for d in (1, 2, 3):
        if not grid.active(d):
            continue
        for side in (0, 1):
            sl = list(full)
            sl[3 - d] = _ghost_slices(grid, d, side)[3 - d]
            wg, wd = disk_ic(dp, grid, cv, tuple(sl), do_dust=nd_dust > 0,
                             rt_fn=rt_fn)
            gas_cache[(d, side)] = wg
            if wd is not None:
                dust_cache[(d, side)] = np.broadcast_to(
                    wd, (nd_dust,) + wd.shape[1:]).copy()

    def ic_bc(w, grid_, fluid, d, side):
        sl = _ghost_slices(grid_, d, side)
        cache = gas_cache if fluid == "gas" else dust_cache
        return w.at[(slice(None), slice(None)) + sl].set(
            jnp.asarray(cache[(d, side)]))

    # expose the value caches so the sharded driver can swap entries for
    # per-shard views (the fill reads them through jnp.asarray)
    ic_bc.shard_caches = (gas_cache, dust_cache)
    return ic_bc


def _bc_geom(dp, grid, d, side):
    """Precomputed coordinate data for extrap/visc boundaries."""
    g = grid.geom
    ng = grid.nghost
    n = grid.nx[d - 1]
    lnx = grid.coords != "cartesian"
    xv = {1: g.xv1, 2: g.xv2, 3: g.xv3}[d]
    ia = ng if side == 0 else ng + n - 1
    ip1 = ia + 1 if side == 0 else ia
    im1 = ia if side == 0 else ia - 1

    def along(vals, idx):
        shape = [1, 1, 1]
        shape[3 - d] = -1
        return np.reshape(np.atleast_1d(vals[idx]), shape)

    ghosts = list(range(0, ng)) if side == 0 else list(range(ng + n, n + 2 * ng))
    if lnx:
        xma = [math.log(xv[gi] / xv[ia]) for gi in ghosts]
        dx = math.log(xv[ip1] / xv[im1])
    else:
        xma = [xv[gi] - xv[ia] for gi in ghosts]
        dx = xv[ip1] - xv[im1]
    xmadx = [x / dx for x in xma]

    # cylindrical coords + basis rows over the full padded grid
    x1v = g.xv1[None, None, :]
    x2v = g.xv2[None, :, None]
    x3v = g.xv3[:, None, None]
    xcyl = geo.convert_to_cyl(grid.coords, x1v, x2v, x3v)
    ex = geo.vec_to_cyl(grid.coords, x1v, x2v, x3v)
    shape = grid.shape_entire
    Rcyl = np.broadcast_to(xcyl[0], shape)
    rows = [[np.broadcast_to(ex[i][m], shape) for m in range(3)] for i in range(3)]
    return dict(ia=ia, ip1=ip1, im1=im1, ghosts=ghosts, xmadx=xmadx,
                Rcyl=Rcyl, rows=rows)


def make_extrap_bc(dp: DiskParams, grid, cv):
    """``extrap`` BC: log extrapolation on cylinders (DiskBoundaryExtrap)."""
    cache = {}

    def extrap_bc(w, grid_, fluid, d, side):
        key = (d, side)
        if key not in cache:
            cache[key] = _bc_geom(dp, grid_, d, side)
        geom = cache[key]
        ax = w.ndim - d  # boundary axis in the padded array
        is_gas = fluid == "gas"

        def take(i):
            sl = [slice(None)] * w.ndim
            sl[ax] = i
            return tuple(sl)

        def cell(arrs, i):
            # returns numpy (kept concrete so host formulas like the
            # viscosity profile can use it at trace time)
            sl = [slice(None)] * 3
            sl[3 - d] = i
            return np.ascontiguousarray(arrs[tuple(sl)])

        ia, ip1, im1 = geom["ia"], geom["ip1"], geom["im1"]
        rowsR = [geom["rows"][i][0] for i in range(3)]
        rowsP = [geom["rows"][i][1] for i in range(3)]
        rowsZ = [geom["rows"][i][2] for i in range(3)]

        rho_a = w[take(ia)][:, 0]
        rho_p = w[take(ip1)][:, 0]
        rho_m = w[take(im1)][:, 0]
        dgrho = jnp.log(rho_p / rho_m)
        v_a = [w[take(ia)][:, 1 + c] for c in range(3)]
        v_p = [w[take(ip1)][:, 1 + c] for c in range(3)]
        v_m = [w[take(im1)][:, 1 + c] for c in range(3)]
        Ra = cell(geom["Rcyl"], ia)
        Rp1 = cell(geom["Rcyl"], ip1)
        Rm1 = cell(geom["Rcyl"], im1)
        vp_a = sum(v_a[c] * cell(rowsP[c], ia) for c in range(3)) + dp.omf * Ra
        vR_a = sum(v_a[c] * cell(rowsR[c], ia) for c in range(3))
        vz_a = sum(v_a[c] * cell(rowsZ[c], ia) for c in range(3))
        vp_p1 = sum(v_p[c] * cell(rowsP[c], ip1) for c in range(3)) + dp.omf * Rp1
        vp_m1 = sum(v_m[c] * cell(rowsP[c], im1) for c in range(3)) + dp.omf * Rm1
        dgvp = jnp.log(vp_p1 / vp_m1)
        if is_gas:
            sie_a = w[take(ia)][:, 5]
            dgsie = jnp.log(w[take(ip1)][:, 5] / w[take(im1)][:, 5])

        for gi, xmadx in zip(geom["ghosts"], geom["xmadx"]):
            Rg = cell(geom["Rcyl"], gi)
            rho_g = rho_a * jnp.exp(dgrho * xmadx)
            vp_g = vp_a * jnp.exp(dgvp * xmadx) - dp.omf * Rg
            vcyl = [vR_a, vp_g, vz_a]
            vg = [sum(vcyl[m] * cell(geom["rows"][i][m], gi) for m in range(3))
                  for i in range(3)]
            new = (w[take(gi)]
                   .at[:, 0].set(rho_g)
                   .at[:, 1].set(vg[0])
                   .at[:, 2].set(vg[1])
                   .at[:, 3].set(vg[2]))
            if is_gas:
                sie_g = sie_a * jnp.exp(dgsie * xmadx)
                new = new.at[:, 5].set(sie_g).at[:, 4].set(
                    (dp.gamma_gas - 1.0) * rho_g * sie_g)
            w = w.at[take(gi)].set(new)
        return w

    return extrap_bc


def make_visc_bc(dp: DiskParams, grid, cv):
    """``visc`` BC: viscous steady-state inflow (DiskBoundaryVisc,
    disk.hpp:418-592).  x1 boundaries only."""
    cache = {}

    def visc_bc(w, grid_, fluid, d, side):
        if d != 1:
            raise ValueError("visc BC only supports x1 boundaries")
        key = (d, side)
        if key not in cache:
            cache[key] = _bc_geom(dp, grid_, d, side)
        geom = cache[key]
        ax = w.ndim - d
        is_gas = fluid == "gas"

        def take(i):
            sl = [slice(None)] * w.ndim
            sl[ax] = i
            return tuple(sl)

        def cell(arrs, i):
            # returns numpy (kept concrete so host formulas like the
            # viscosity profile can use it at trace time)
            sl = [slice(None)] * 3
            sl[3 - d] = i
            return np.ascontiguousarray(arrs[tuple(sl)])

        ia, ip1, im1 = geom["ia"], geom["ip1"], geom["im1"]
        rowsR = [geom["rows"][i][0] for i in range(3)]
        rowsP = [geom["rows"][i][1] for i in range(3)]
        rowsZ = [geom["rows"][i][2] for i in range(3)]
        Ra = cell(geom["Rcyl"], ia)
        rho_a = w[take(ia)][:, 0]
        v_a = [w[take(ia)][:, 1 + c] for c in range(3)]
        v_p = [w[take(ip1)][:, 1 + c] for c in range(3)]
        v_m = [w[take(im1)][:, 1 + c] for c in range(3)]
        Rp1 = cell(geom["Rcyl"], ip1)
        Rm1 = cell(geom["Rcyl"], im1)
        vp_a = sum(v_a[c] * cell(rowsP[c], ia) for c in range(3)) + dp.omf * Ra
        vz_a = sum(v_a[c] * cell(rowsZ[c], ia) for c in range(3))
        vp_p1 = sum(v_p[c] * cell(rowsP[c], ip1) for c in range(3)) + dp.omf * Rp1
        vp_m1 = sum(v_m[c] * cell(rowsP[c], im1) for c in range(3)) + dp.omf * Rm1
        dgvp = jnp.log(vp_p1 / vp_m1)
        nua = viscosity_profile(dp, Ra)
        if is_gas:
            sie_a = w[take(ia)][:, 5]
            dgsie = jnp.log(w[take(ip1)][:, 5] / w[take(im1)][:, 5])

        for gi, xmadx in zip(geom["ghosts"], geom["xmadx"]):
            Rg = cell(geom["Rcyl"], gi)
            nug = viscosity_profile(dp, Rg)
            vp_g = vp_a * jnp.exp(dgvp * xmadx)
            if side == 0:
                rho_g = rho_a * (nua / nug)
                vR_g = -1.5 * nug / Rg
            else:
                lg = Rg * vp_g
                la = Ra * vp_a
                rho_g = (3.0 * math.pi * rho_a * nua * la
                         + dp.mdot * (lg - la)) / (3.0 * math.pi * nug * lg)
                vR_g = -dp.mdot / (2.0 * math.pi * Rg * rho_g)
            vcyl = [vR_g, vp_g - dp.omf * Rg, vz_a]
            vg = [sum(vcyl[m] * cell(geom["rows"][i][m], gi) for m in range(3))
                  for i in range(3)]
            new = (w[take(gi)]
                   .at[:, 0].set(rho_g)
                   .at[:, 1].set(vg[0])
                   .at[:, 2].set(vg[1])
                   .at[:, 3].set(vg[2]))
            if is_gas:
                sie_g = sie_a * jnp.exp(dgsie * xmadx)
                new = new.at[:, 5].set(sie_g).at[:, 4].set(
                    (dp.gamma_gas - 1.0) * rho_g * sie_g)
            w = w.at[take(gi)].set(new)
        return w

    return visc_bc


def build(pin, grid, gas_cfg, dust_cfg=None) -> Problem:
    if not pin.get_or_add_bool("physics", "gravity", False):
        raise ValueError("disk pgen requires gravity")
    # gm from the gravity block (point or binary)
    from ..units import Constants, Units

    units = Units.from_input(pin)
    constants = Constants.from_units(units)
    if pin.has_block("gravity/point"):
        gm = constants.G_code * pin.get_or_add_real("gravity/point", "mass", 1.0) \
            if not pin.exists("gravity/point", "gm") \
            else pin.get_real("gravity/point", "gm")
    elif pin.has_block("gravity/binary"):
        gm = constants.G_code * pin.get_or_add_real("gravity/binary", "total_mass", 1.0)
    elif pin.has_block("gravity/nbody"):
        # gm = G * (total particle mass), as the nbody package computes it
        from ..nbody import setup_particles

        _, mtot = setup_particles(pin, constants.G_code,
                                  pin.get_or_add_real("nbody", "mtot", -1.0))
        gm = constants.G_code * mtot
    else:
        raise ValueError("disk pgen requires point, binary, or nbody gravity")
    omf = 0.0
    if pin.get_or_add_bool("physics", "rotating_frame", False):
        omf = pin.get_or_add_real("rotating_frame", "omega", 0.0)

    dp = make_params(pin, gas_cfg, gm, omf)
    cv = gas_cfg.cv
    nd = dust_cfg.nspecies if dust_cfg is not None else 0

    # nbody-potential temperature (disk.hpp:328-329: requires do_nbody)
    rt_fn = None
    if (pin.get_or_add_bool("problem", "nbody_temp", False)
            and pin.get_or_add_bool("physics", "nbody", False)):
        rt_fn = make_rt_fn(pin, grid, gm)

    w_gas, w_dust = disk_ic(dp, grid, cv, do_dust=nd > 0, rt_fn=rt_fn)
    prims = {"gas": w_gas}
    if nd:
        prims["dust"] = np.broadcast_to(w_dust, (nd,) + w_dust.shape[1:]).copy()

    visc_bc = make_visc_bc(dp, grid, cv)
    bc_custom = {
        "ic": make_ic_bc(dp, grid, cv, nd, rt_fn=rt_fn),
        "extrap": make_extrap_bc(dp, grid, cv),
        "visc": visc_bc,
        "viscous": visc_bc,
    }
    return Problem(prims=prims, bc_custom=bc_custom)
