"""Gray radiation transport: deterministic flux-limited diffusion.

TPU-native replacement for the reference's jaybenne implicit-Monte-Carlo
package (src/radiation/imc/, SURVEY.md §2.6 item 7): instead of stochastic
photon swarms migrating between blocks, the radiation field is a gray energy
density Er evolved by an operator-split step after the unsplit hydro tasks
(ArtemisDriver::Step, artemis_driver.cpp:111):

1. implicit matter-radiation exchange (backward-Euler + Newton on T):
       dEr/dt = c kap rho (a T^4 - Er),  rho cv dT/dt = -c kap rho (a T^4-Er)
2. flux-limited diffusion with the Levermore-Pomraning limiter
       dEr/dt = div( c lambda/(kap rho) grad Er ),
   solved implicitly with a matrix-free conjugate-gradient iteration (pure
   jnp stencil matvecs — jit/TPU friendly, no sparse assembly).

Opacity models mirror the reference's reduced singularity-opac variants
(src/utils/opacity/opacity.hpp:20-56; gas.cpp:124-166): none/constant
(gray), thermalization (c = 1, a_rad = 1), shocktube_a (powerlaw with
c = 1732.05, a_rad = 7.716e-4), plus gray/constant scattering.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclass(frozen=True)
class RadiationCfg:
    opacity_model: str = "constant"   # none|constant|shocktube_a|thermalization
    kappa_a: float = 0.0
    coef_kappa_a: float = 0.0
    rho_exp: float = 0.0
    temp_exp: float = 0.0
    kappa_s: float = 0.0              # gray scattering
    c_code: float = 1.0
    arad: float = 1.0
    dt_rad: float = 1.0e38            # max radiation (and hence global) dt
    cg_tol: float = 1.0e-10
    cg_maxiter: int = 200
    coupled_iters: int = 4            # Newton outer iterations of the
    #                                   coupled exchange+diffusion solve


def radiation_from_input(pin, constants, gas_cfg):
    """Build RadiationCfg from the deck (cf. gas.cpp:124-166 for opacity and
    the custom unit systems in opacity.hpp)."""
    model = pin.get_or_add_str("gas/opacity/absorption", "opacity_model", "constant")
    kappa_a = pin.get_or_add_real("gas/opacity/absorption", "kappa_a", 0.0)
    coef = pin.get_or_add_real("gas/opacity/absorption", "coef_kappa_a", 0.0)
    rho_exp = pin.get_or_add_real("gas/opacity/absorption", "rho_exp", 0.0)
    temp_exp = pin.get_or_add_real("gas/opacity/absorption", "temp_exp", 0.0)
    smodel = pin.get_or_add_str("gas/opacity/scattering", "scattering_model", "none")
    kappa_s = pin.get_or_add_real("gas/opacity/scattering", "kappa_s", 0.0) \
        if smodel == "constant" else 0.0

    if model == "thermalization":
        c_code, arad = 1.0, 1.0
    elif model == "shocktube_a":
        # custom units for the Lowrie-Edwards radiative shock problem
        c_code, arad = 1732.05, 7.716e-4
    else:
        c_code = constants.c_code
        arad = constants.ar_code

    # f32-safe "no limit" sentinel (flows into jnp.minimum with an f32 dt)
    dt_rad = min(1.0e38, pin.get_or_add_real("jaybenne", "dt", 1.0e38)) \
        if pin.has_block("jaybenne") else 1.0e38

    return RadiationCfg(
        opacity_model=model, kappa_a=kappa_a, coef_kappa_a=coef,
        rho_exp=rho_exp, temp_exp=temp_exp, kappa_s=kappa_s,
        c_code=c_code, arad=arad, dt_rad=dt_rad,
    )


class Radiation:
    """Operator-split gray FLD radiation step bound to a Hydro/grid."""

    def __init__(self, cfg: RadiationCfg, grid, hyd, gas_cfg):
        if grid.coords != "cartesian":
            raise ValueError("radiation currently requires Cartesian geometry "
                             "(as does the reference IMC, artemis.cpp:113-114)")
        self.cfg = cfg
        self.grid = grid
        self.hyd = hyd
        self.gas = gas_cfg
        self.dims = hyd.dims
        # physical cell widths per dim (cartesian: uniform arrays)
        self.widths = hyd.widths
        # multi-chip hooks (enable_sharding): neighbor shifts become
        # ppermute halo exchanges along the sharded axis; CG dot products
        # become psum reductions (the jaybenne equivalent is photon swarm
        # migration + MPI reductions)
        self._axis_name = None
        self._axis_d = None
        self._nshards = 1
        # deck-BC Dirichlet edges: {d: (lo_value_or_None, hi_value_or_None)}
        # scalars (broadcastable), set for `ic` hydro BCs so the radiation
        # field is pinned to the IC equilibrium outside the domain instead
        # of reflecting at a zero-flux wall (the reference's ix1_bc=ic
        # philosophy; jaybenne instead reflects photons — shock.hpp decks)
        self._edge_dirichlet = {}
        # uniform cell widths (dx, dy, dz) + max domain extent, static —
        # the Pallas FLD kernels' gate (ops/pallas_fld.py): the fused
        # setup/matvec path needs compile-time 1/w^2 scalars
        wu = []
        for d in (1, 2, 3):
            arr = np.asarray(self.widths[d - 1])
            if arr.size and float(arr.max()) == float(arr.min()):
                wu.append(float(arr.ravel()[0]))
        self._wuni = tuple(wu) if len(wu) == 3 else None
        self._ext = (max(grid.nx[d - 1] * wu[d - 1] for d in self.dims)
                     if self._wuni and self.dims else 0.0)

    def set_edge_dirichlet(self, d: int, lo=None, hi=None):
        """Pin the radiation field outside the physical edge(s) along dim
        ``d`` to fixed scalar values (Dirichlet ghosts one cell out)."""
        self._edge_dirichlet[d] = (lo, hi)

    def enable_sharding(self, axis_d: int, axis_name: str, nshards: int):
        self._axis_d = axis_d
        self._axis_name = axis_name
        self._nshards = nshards

    def _psum(self, x):
        if self._axis_name is None:
            return x
        return lax.psum(x, self._axis_name)

    def _shift(self, E, d, sign):
        """jnp.roll(E, -sign, axis=-d) with the wrapped plane replaced by
        the neighbor shard's boundary plane when d is the sharded axis."""
        out = jnp.roll(E, -sign, axis=-d)
        if self._axis_name is None or d != self._axis_d:
            return out
        ax = E.ndim - d
        n = E.shape[ax]

        def take(i):
            sl = [slice(None)] * E.ndim
            sl[ax] = slice(i, i + 1)
            return E[tuple(sl)]

        perm = [(i, (i - sign) % self._nshards) for i in range(self._nshards)]
        plane = take(0) if sign > 0 else take(n - 1)
        recv = lax.ppermute(plane, self._axis_name, perm)
        sl = [slice(None)] * E.ndim
        sl[ax] = slice(n - 1, n) if sign > 0 else slice(0, 1)
        return out.at[tuple(sl)].set(recv)

    def _edge_masks(self, E, d):
        """(first, last) boolean masks for the PHYSICAL domain edges along
        d (per-shard aware)."""
        ax = E.ndim - d
        n = E.shape[ax]
        idx = jnp.arange(n)
        shape = [1] * E.ndim
        shape[ax] = n
        idx = idx.reshape(shape)
        first = idx == 0
        last = idx == n - 1
        if self._axis_name is not None and d == self._axis_d:
            sidx = lax.axis_index(self._axis_name)
            first = jnp.logical_and(first, sidx == 0)
            last = jnp.logical_and(last, sidx == self._nshards - 1)
        return first, last

    # -- opacity ---------------------------------------------------------
    def kappa(self, rho, T):
        cfg = self.cfg
        if cfg.opacity_model in ("constant", "thermalization"):
            return jnp.full_like(rho, cfg.kappa_a)
        if cfg.opacity_model == "shocktube_a":
            return cfg.coef_kappa_a * rho**cfg.rho_exp * T**cfg.temp_exp
        return jnp.zeros_like(rho)

    # -- step ------------------------------------------------------------
    def step(self, state, dt, ghosts=None, with_iters=False):
        """One operator-split radiation update (exchange + diffusion).

        ``with_iters``: also return the per-Newton-outer CG iteration
        counts (tools/prof_rad.py — the counts ARE the radiation cost
        model: coupled_iters x CG(7-pt matvec) full-grid passes/step).

        ``ghosts``: optional {d: (E_lo_plane, E_hi_plane)} Dirichlet
        boundary planes (one cell outside the domain along d) for AMR
        patch solves — the fine level's radiation field couples to the
        parent through prolonged ghost values instead of the zero-flux
        physical edges (cf. jaybenne photons crossing refinement
        boundaries via Parthenon swarm comm)."""
        cfg = self.cfg
        gas = self.gas
        u = state["gas"]["u"]
        Er0 = state["rad"]["Er"]
        rho = jnp.maximum(u[:1, 0], gas.dfloor)
        eint = u[:1, 5]
        T0 = eint / (rho * gas.cv)
        rcv = rho * gas.cv

        # FLD coefficients, frozen at the pre-step state (standard
        # linearization: the limiter/diffusivity lag one step)
        kap_t = self.kappa(rho, T0) + cfg.kappa_s  # transport opacity
        chi = kap_t * rho  # 1/mfp
        ftiny = float(jnp.finfo(Er0.dtype).tiny)

        def grad_mag(E):
            g2 = 0.0
            for d in self.dims:
                w = jnp.asarray(self.widths[d - 1])
                gp = (self._shift(E, d, 1) - self._shift(E, d, -1)) / (2 * w)
                g2 = g2 + gp * gp
            return jnp.sqrt(g2)

        R = grad_mag(Er0) / (chi * jnp.maximum(Er0, ftiny) + ftiny)
        lam = (2.0 + R) / (6.0 + 3.0 * R + R * R)  # Levermore-Pomraning
        Dcell = cfg.c_code * lam / (chi + ftiny)
        # FLD validity cap.  In a flat-field optically thin region the
        # limiter stays at its diffusive value (R -> 0, lam = 1/3) while
        # 1/chi -> inf, so D = c/(3 chi) is unbounded: on the disk-RHD
        # corners (rho at dfloor) dt*D/w^2 reaches ~1e8, which both breaks
        # f32 CG (attainable residual ~ eps*cond) and over-propagates Er
        # the moment a gradient appears.  Cap D at c*L (L = node domain
        # extent): a transparent region then equilibrates within one
        # light-crossing time of the domain, which is FLD's own accuracy
        # floor in the streaming limit (optically thick problems, e.g.
        # the Lowrie-Edwards rad_shock anchor, never reach the cap).
        ext = 0.0
        for d in self.dims:
            w = jnp.asarray(self.widths[d - 1])
            s = jnp.max(jnp.sum(w, axis=w.ndim - d))
            if self._axis_name is not None and d == self._axis_d:
                # block-sharded axis: the NODE extent is nshards shard
                # windows (keeps the cap identical to the serial solve)
                s = s * self._nshards
            ext = jnp.maximum(ext, s)
        Dcell = jnp.minimum(Dcell, cfg.c_code * ext)

        # Merge the deck-BC Dirichlet edges (scalars from `ic` BCs) with
        # the per-call AMR ghost planes; AMR planes take precedence (a
        # fine patch never also owns a physical `ic` edge of its own).
        gh = dict(ghosts) if ghosts else {}
        for d, (lo_v, hi_v) in self._edge_dirichlet.items():
            if d not in gh:
                gh[d] = (lo_v, hi_v)

        # Pallas fused path (TPU): one kernel computes limiter + capped D
        # + masked face coefficients + Jacobi diagonal (ops/pallas_fld.py
        # — the jnp setup's ~25 roll materializations dominated the
        # radiation cost at production shape, not the ~4 CG iterations),
        # and a second fuses the 7-point CG matvec.  Coefficients differ
        # from the jnp path only in op order (last-ULP); the energy
        # bookkeeping below conserves exactly for ANY operator because it
        # charges the gas with the actual residual-corrected gain.
        from .ops import pallas_fld as _pf

        pal = (_pf.enabled() and self._axis_name is None
               and len(self.dims) == 3 and self._wuni is not None
               and _pf.supported(Er0.shape[-3]))
        if pal:
            shp3 = Er0.shape[-3:]
            lead = Er0.shape[:-3]
            flags = []
            for d in (1, 2, 3):
                lo_g, hi_g = gh.get(d, (None, None))
                flags.append((lo_g is not None, hi_g is not None))
            A6, dg3, Dc3 = _pf.fld_coeffs(
                Er0.reshape(shp3), jnp.broadcast_to(chi, Er0.shape)
                .reshape(shp3), dt, self._wuni, cfg.c_code, self._ext,
                flags)
            diag_geo = dg3.reshape(Er0.shape)
            b_ghost = 0.0
            for d in (1, 2, 3):
                lo_g, hi_g = gh.get(d, (None, None))
                if lo_g is None and hi_g is None:
                    continue
                if isinstance(b_ghost, float):
                    b_ghost = jnp.zeros_like(Er0)
                iw2 = 1.0 / self._wuni[d - 1] ** 2
                ax = Er0.ndim - d
                n = Er0.shape[ax]
                Dc_f = Dc3.reshape(Er0.shape)
                if hi_g is not None:
                    sl = [slice(None)] * Er0.ndim
                    sl[ax] = slice(n - 1, n)
                    b_ghost = b_ghost.at[tuple(sl)].add(
                        (dt * iw2) * Dc_f[tuple(sl)] * hi_g)
                if lo_g is not None:
                    sl = [slice(None)] * Er0.ndim
                    sl[ax] = slice(0, 1)
                    b_ghost = b_ghost.at[tuple(sl)].add(
                        (dt * iw2) * Dc_f[tuple(sl)] * lo_g)

            def matvec(E, sf):
                sf3 = jnp.broadcast_to(sf, E.shape).reshape(shp3)
                out = _pf.fld_matvec(E.reshape(shp3), A6, dg3, sf3)
                return out.reshape(lead + shp3)

            return self._solve_coupled(state, u, Er0, rho, rcv, T0, dt,
                                       matvec, diag_geo, b_ghost,
                                       with_iters)

        # Face coefficients of the operator (I - dt div D grad), hoisted
        # out of the CG loop: DH/DL fold the arithmetic face average, the
        # boundary masking, and the 1/w^2 factors.  At zero-flux edges the
        # face coefficient is 0 (which also kills the wrapped roll plane);
        # at Dirichlet faces (AMR ghost planes, or deck-BC `ic` edge
        # values) it is the one-sided Dcell/w^2 and ZH/ZL zero the wrapped
        # neighbor value in the homogeneous operator (the ghost values
        # enter the RHS below).  Each side is independent: a side whose
        # ghost entry is None stays zero-flux.
        DH, DL, ZH, ZL = {}, {}, {}, {}
        for d in self.dims:
            w = jnp.asarray(self.widths[d - 1])
            D_hi = 0.5 * (Dcell + self._shift(Dcell, d, 1))
            D_lo = 0.5 * (Dcell + self._shift(Dcell, d, -1))
            first, last = self._edge_masks(Dcell, d)
            lo_g, hi_g = gh.get(d, (None, None))
            if hi_g is not None:
                D_hi = jnp.where(last, Dcell, D_hi)
                ZH[d] = jnp.where(last, 0.0, 1.0)
            else:
                D_hi = jnp.where(last, 0.0, D_hi)
                ZH[d] = None
            if lo_g is not None:
                D_lo = jnp.where(first, Dcell, D_lo)
                ZL[d] = jnp.where(first, 0.0, 1.0)
            else:
                D_lo = jnp.where(first, 0.0, D_lo)
                ZL[d] = None
            iw2 = 1.0 / (w * w)
            DH[d] = D_hi * iw2
            DL[d] = D_lo * iw2

        # Dirichlet ghost contributions to the RHS: at the masked faces
        # the affine flux is DH*eg_hi / DL*eg_lo (independent of the
        # exchange linearization, so hoisted out of the outer loop)
        b_ghost = 0.0
        for d in self.dims:
            lo_g, hi_g = gh.get(d, (None, None))
            if hi_g is not None:
                b_ghost = b_ghost + dt * DH[d] * (1.0 - ZH[d]) * hi_g
            if lo_g is not None:
                b_ghost = b_ghost + dt * DL[d] * (1.0 - ZL[d]) * lo_g

        # geometric part of the Jacobi diagonal (the sf term is added per
        # outer iteration)
        diag_geo = jnp.ones_like(Er0)
        for d in self.dims:
            diag_geo = diag_geo + dt * (DH[d] + DL[d])

        # off-diagonal face coefficients with the Dirichlet masks FOLDED
        # in (AH = DH*ZH, AL = DL*ZL), scaled by dt once: the CG matvec
        # is the hot loop — hoisting the masks and regrouping around the
        # precomputed diagonal cuts its per-dim op count ~40%:
        #   matvec(E, sf) = (diag_geo + sf) E - sum_d (AH_d E+ + AL_d E-)
        AH, AL = {}, {}
        for d in self.dims:
            AH[d] = dt * (DH[d] * ZH[d] if ZH[d] is not None else DH[d])
            AL[d] = dt * (DL[d] * ZL[d] if ZL[d] is not None else DL[d])

        def matvec(E, sf):
            out = (diag_geo + sf) * E
            for d in self.dims:
                out = out - (AH[d] * self._shift(E, d, 1)
                             + AL[d] * self._shift(E, d, -1))
            return out

        return self._solve_coupled(state, u, Er0, rho, rcv, T0, dt,
                                   matvec, diag_geo, b_ghost, with_iters)

    def _solve_coupled(self, state, u, Er0, rho, rcv, T0, dt, matvec,
                       diag_geo, b_ghost, with_iters):
        """Newton-outer coupled exchange+diffusion solve with exact
        energy bookkeeping, shared by the jnp and Pallas operator paths
        (``matvec``/``diag_geo``/``b_ghost`` define the operator)."""
        cfg = self.cfg

        def cg(b, x0, sf, diag):
            r = b - matvec(x0, sf)
            rs = self._psum(jnp.sum(r * r))
            bb = self._psum(jnp.sum(b * b))
            # dtype-aware tolerance: under <artemis> precision=float32 the
            # deck default 1e-10 sits far below f32 roundoff, so an
            # unclamped tolerance would burn cg_maxiter iterations on
            # every radiation step; ~50*eps is the reliably reachable
            # relative-residual floor.
            fi = jnp.finfo(b.dtype)
            tol = max(self.cfg.cg_tol, 50.0 * float(fi.eps))
            tiny = float(fi.tiny)

            # Jacobi-preconditioned CG: z = r/diag halves-or-better the
            # iteration count when dt*D/w^2 >> 1 (optically thin zones).
            # The initial search direction MUST be the preconditioned
            # residual z (not r): seeding p = r while the loop updates
            # p = z + beta*p loses conjugacy and stalls exactly where
            # dt*D/w^2 is large (the radiative precursor).
            z = r / diag
            p = z
            rz = self._psum(jnp.sum(r * z))

            def body(carry):
                x, r, z, p, rz, rs, it = carry
                Ap = matvec(p, sf)
                pAp = self._psum(jnp.sum(p * Ap))
                # Breakdown guard: the operator is SPD, but near the
                # attainable-residual floor f32 roundoff can drive the
                # summed p.Ap to <= 0; dividing by max(pAp, tiny) then
                # yields an ~1e38 alpha and x + alpha*p - alpha*p = NaN.
                # On breakdown freeze x/r and force rs to 0 so the loop
                # exits with the best iterate.
                ok = pAp > tiny
                alpha = jnp.where(ok, rz, 0.0) / jnp.where(ok, pAp, 1.0)
                x = x + alpha * p
                r = r - alpha * Ap
                z = r / diag
                rz_new = self._psum(jnp.sum(r * z))
                rs_new = jnp.where(ok, self._psum(jnp.sum(r * r)), 0.0)
                p = z + (rz_new / jnp.maximum(rz, tiny)) * p
                return (x, r, z, p, rz_new, rs_new, it + 1)

            def cond(carry):
                _, _, _, _, _, rs_c, it = carry
                return jnp.logical_and(rs_c > tol * tol * bb,
                                       it < self.cfg.cg_maxiter)

            x, r, _, _, _, _, it = lax.while_loop(
                cond, body, (x0, r, z, p, rz, rs, 0))
            # r is the maintained residual b - matvec(x, sf): returned so
            # the caller can recover matvec(x, 0) without another matvec
            return x, r, it

        # Coupled implicit exchange + diffusion.  A Lie split (local
        # implicit exchange, then implicit diffusion) has a steady state
        # with the exchange coefficient reduced to c*chi/(1+sig) — for
        # sig = c*kap*rho*dt >> 1 that widens the radiative-shock
        # precursor by ~sqrt(sig).  Instead, Newton-linearize the
        # emission (aT^4 ~ aTk^4 + 4aTk^3 (T-Tk)), eliminate the local
        # matter equation, and fold the resulting effective coupling
        # sf = sig * rcv/(rcv + 4 a Tk^3 sig) into the CG operator:
        #   (1 + sf) Er - dt div D grad Er = Er0 + sf*emis.
        # The fixed point of the coupled backward-Euler step satisfies
        # the exact steady equation, so steady profiles are
        # dt-independent (anchored by analysis/rad_shock_exact.py).
        a_r = cfg.arad
        fi0 = jnp.finfo(Er0.dtype)
        tol_outer = 50.0 * float(fi0.eps)
        Tscale = jnp.max(jnp.abs(T0))
        if self._axis_name is not None:
            # the outer trip count must be UNIFORM across shards (the CG
            # body runs collectives): make the convergence scale global
            Tscale = lax.pmax(Tscale, self._axis_name)
        Tscale = Tscale + float(fi0.tiny)

        def outer_body(carry):
            Er_k, Tk, _r, _b, _sf, k, iters = carry
            kap = self.kappa(rho, Tk)
            sig = dt * cfg.c_code * kap * rho
            beta = 4.0 * a_r * Tk**3
            f = rcv / (rcv + sig * beta)
            sf = sig * f
            emis = a_r * Tk**4 + beta * (T0 - Tk)
            b = Er0 + sf * emis + b_ghost
            Er_k, r, it = cg(b, Er_k, sf, diag_geo + sf)
            Tk2 = T0 - sf * (emis - Er_k) / rcv
            dT = jnp.max(jnp.abs(Tk2 - Tk))
            if self._axis_name is not None:
                dT = lax.pmax(dT, self._axis_name)
            iters = iters.at[k].set(it)
            return (Er_k, Tk2, r, b, sf, k + 1, iters), dT

        def outer_cond(carry_dT):
            carry, dT = carry_dT
            k = carry[5]
            # the first outer always runs; later ones only while the
            # Newton temperature iterate still moves at f32 resolution —
            # in near-equilibrium flows (the disk bench) outers 2..N are
            # converged no-ops and this skips their matvec+setup passes
            return jnp.logical_and(k < cfg.coupled_iters,
                                   jnp.logical_or(k < 1,
                                                  dT > tol_outer * Tscale))

        def outer_step(carry_dT):
            carry, _ = carry_dT
            return outer_body(carry)

        zero = jnp.zeros_like(Er0)
        init = ((Er0, T0, zero, zero, zero, 0,
                 jnp.zeros(cfg.coupled_iters, jnp.int32)),
                jnp.asarray(jnp.inf, Er0.dtype))
        (Er_new, Tk, r_fin, b_fin, sf_fin, _, cg_iters), _ = \
            lax.while_loop(outer_cond, outer_step, init)

        # Gas internal-energy change: charge the gas with the radiation
        # field's ACTUAL gain net of diffusion (not the linearized
        # emission) so total energy conservation is exact to FP summation
        # even at finite CG residual.  matvec(E, 0) - E = -dt div D grad E
        # (homogeneous part); b_ghost restores the Dirichlet-face fluxes.
        # CG maintains r = b - matvec(Er, sf), so the homogeneous part is
        # recovered WITHOUT another matvec:
        #   matvec(Er, 0) = b - r - sf * Er.
        LEr = b_fin - r_fin - sf_fin * Er_new - Er_new
        de = -(Er_new - Er0 + LEr - b_ghost)

        u = u.at[:1, 5].add(de).at[:1, 4].add(de)

        new = dict(state)
        new["gas"] = {"u": u, "w": state["gas"]["w"]}
        new["rad"] = {"Er": Er_new}
        if with_iters:
            return new, cg_iters
        return new

    def sync_gas(self, state):
        """Re-sync gas prims after the split update (IMC::SyncFields
        equivalent, imc.hpp:28-58).

        The split radiation update only changes the gas ENERGY
        components (u4 += de, u5 += de); every other variable is already
        a fixed point of the C2P/P2C round trip on entry (the fused
        stage ends with an in-pass re-sync, and the pass's restriction
        deposits only the energy components).  So the full-state sync
        reduces to the energy-component subchain — identical math to
        cons_to_prim + prim_to_cons restricted to (p, sie, E, e), at a
        third of the HBM traffic."""
        cfg = self.gas
        u = state["gas"]["u"]
        w = state["gas"]["w"]
        rho = w[:, 0]                      # = max(u0, dfloor) on entry
        sie = jnp.maximum(u[:, 5] / rho, cfg.siefloor)
        p = (cfg.gamma - 1.0) * rho * sie
        eint = sie * rho
        ke = 0.5 * rho * (w[:, 1] ** 2 + w[:, 2] ** 2 + w[:, 3] ** 2)
        u = u.at[:, 5].set(eint.astype(u.dtype)) \
             .at[:, 4].set((eint + ke).astype(u.dtype))
        w = w.at[:, 4].set(p.astype(w.dtype)) \
             .at[:, 5].set(sie.astype(w.dtype))
        new = dict(state)
        new["gas"] = {"u": u, "w": w}
        return new


def initialize_radiation(state, gas_cfg, cfg: RadiationCfg):
    """Er = a T^4 from the current gas temperature (the reference's
    jaybenne::InitializeRadiation)."""
    w = state["gas"]["w"]
    T = w[:1, 5] / gas_cfg.cv
    return {"Er": cfg.arad * T**4}
