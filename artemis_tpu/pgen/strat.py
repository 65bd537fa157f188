"""Stratified / unstratified shearing box (reference: src/pgen/strat.hpp).

Background shear vy = -q Omega x with vertically Gaussian density (3-D),
run in the Cartesian rotating frame (shearing box forces).  Custom BCs:
``extrap`` on x1 (copy + no-inflow vx + linear vy extrapolation,
strat.hpp:154-260), ``inflow`` on x2 (upstream rows reset to the
background shear, downstream no-inflow, strat.hpp:262-420), and
``extrap`` on x3 (no-inflow vz + geometric density extrapolation of the
stratified profile into the vertical ghosts, strat.hpp:477-639).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import Problem


def build(pin, grid, gas_cfg, dust_cfg=None) -> Problem:
    if grid.coords != "cartesian":
        raise ValueError("problem = strat only works for Cartesian coordinates!")
    if not pin.get_or_add_bool("physics", "rotating_frame", False):
        raise ValueError("strat requires the rotating frame")
    q = pin.get_or_add_real("rotating_frame", "qshear", 0.0)
    Om0 = pin.get_or_add_real("rotating_frame", "omega", 0.0)
    h = pin.get_or_add_real("problem", "h", 1.0)
    rho0 = pin.get_or_add_real("problem", "rho0", 1.0)
    dens_min = pin.get_or_add_real("problem", "dens_min", 1.0e-5)
    pin.get_or_add_real("problem", "pres_min", 1.0e-8)  # parsed as in strat.hpp:68
    d2g = pin.get_or_add_real("problem", "dust_to_gas", 0.01)
    temp0 = (h * Om0) ** 2
    cv = gas_cfg.cv
    gamma = gas_cfg.gamma

    shape = tuple(reversed(grid.nx))
    x1v, _, x3v = grid.cell_centers()
    three_d = grid.active(3)

    vx2 = np.broadcast_to(-q * Om0 * x1v, shape)
    efac = np.exp(-(x3v**2) / (2.0 * h * h)) if three_d else 1.0
    dens = np.broadcast_to(np.maximum(dens_min, efac * rho0), shape)
    sie = np.full(shape, cv * temp0)
    zero = np.zeros(shape)
    pres = (gamma - 1.0) * dens * sie
    prims = {"gas": np.stack([dens, zero, vx2, zero, pres, sie])[None]}
    if dust_cfg is not None:
        wd = np.stack([dens * d2g, zero, vx2, zero])
        prims["dust"] = np.broadcast_to(wd, (dust_cfg.nspecies,) + wd.shape).copy()

    # -- custom BCs -----------------------------------------------------
    g = grid.geom
    ng = grid.nghost

    def extrap_bc(w, grid_, fluid, d, side):
        """x1: copy edge + no-inflow vx + linear vy slope (strat.hpp:154-260).
        x3: no-inflow vz + geometric density extrapolation rho_edge *
        (rho_next/rho_edge)**((z-z0)/dz) of the stratified profile
        (strat.hpp:477-639)."""
        n = grid_.nx[d - 1]
        ax = w.ndim - d
        edge = ng if side == 0 else ng + n - 1
        nxt = edge + 1 if side == 0 else edge - 1
        xv = {1: g.xv1, 2: g.xv2, 3: g.xv3}[d]
        x0, x1 = xv[edge], xv[nxt]
        dx = x1 - x0

        def take(i):
            sl = [slice(None)] * w.ndim
            sl[ax] = i
            return tuple(sl)

        we = w[take(edge)]
        wn = w[take(nxt)]
        ghosts = range(0, ng) if side == 0 else range(ng + n, n + 2 * ng)
        for gi in ghosts:
            x = xv[gi]
            new = we
            vnorm = we[:, d]
            vnorm = jnp.minimum(vnorm, 0.0) if side == 0 else jnp.maximum(vnorm, 0.0)
            new = new.at[:, d].set(vnorm)
            if d == 1:  # linear extrapolation of vy in x (strat.hpp:216-220)
                vy = we[:, 2] + (wn[:, 2] - we[:, 2]) * (x - x0) / dx
                new = new.at[:, 2].set(vy)
            elif d == 3:
                # Geometric extrapolation of the vertically stratified
                # density (strat.hpp:526-529, 608-611): the inner/outer
                # forms both reduce to rho_e*(rho_n/rho_e)**((z-z0)/dz)
                # with the signed dz = z_next - z_edge used here.
                frac = (x - x0) / dx
                rho = we[:, 0] * (wn[:, 0] / we[:, 0]) ** frac
                new = new.at[:, 0].set(rho)
                if fluid == "gas":  # keep pres consistent with copied sie
                    new = new.at[:, 4].set((gamma - 1.0) * rho * new[:, 5])
            w = w.at[take(gi)].set(new)
        return w

    def inflow_bc(w, grid_, fluid, d, side):
        """x2: upstream rows -> background shear; downstream no-inflow."""
        if d != 2:
            raise ValueError("strat inflow BC is an x2 boundary")
        n = grid_.nx[1]
        ax = w.ndim - 2
        edge = ng if side == 0 else ng + n - 1

        def take(i):
            sl = [slice(None)] * w.ndim
            sl[ax] = i
            return tuple(sl)

        we = w[take(edge)]
        # upstream half: inner-x2 at x<0, outer-x2 at x>0 (radial shear sense)
        xf = g.xf1[None, :]  # faces along x1 -> lower face per cell
        xf_lo = g.xf1[:-1][None, None, :]  # [1,1,nx] lower x-face of each cell
        vy0 = -q * Om0 * g.xv1[None, None, :]
        vy0 = jnp.asarray(np.broadcast_to(vy0, we[:, 2].shape[-3:]))
        xlo = jnp.asarray(np.broadcast_to(xf_lo, we[:, 2].shape[-3:]))
        vy_e = we[:, 2]
        if side == 0:
            vy_new = jnp.where(xlo >= 0, jnp.minimum(vy_e, 0.0), vy0)
        else:
            vy_new = jnp.where(xlo < 0, jnp.maximum(vy_e, 0.0), vy0)
        new = we.at[:, 2].set(vy_new)
        ghosts = range(0, ng) if side == 0 else range(ng + n, n + 2 * ng)
        for gi in ghosts:
            w = w.at[take(gi)].set(new)
        return w

    return Problem(prims=prims,
                   bc_custom={"extrap": extrap_bc, "inflow": inflow_bc})
