"""Semi-analytic steady radiative-shock profile for the artemis_tpu
radiation model (gray FLD + implicit matter-radiation exchange).

This is the Lowrie & Edwards (2008, Shock Waves 18:129) construction
specialized to the exact model equations solved by artemis_tpu.radiation
(cf. /root/reference/inputs/radiation/rad_shock.in, whose end states this
deck family shares):

    mass        m  = rho u                      = const
    momentum    P  = rho u^2 + p                = const   (no rad force)
    gas energy  d/dx [ m (gamma cv T + u^2/2) ] = -S
    radiation   d/dx F = S,   F = -(c lam(R)/chi) dEr/dx  (FLD flux)
    exchange    S = c chi (a T^4 - Er),  chi = kappa rho
    limiter     lam = (2+R)/(6+3R+R^2),  R = |dEr/dx|/(chi Er)

(the FLD step advects no Er and deposits no radiation momentum, so the
steady shock-frame solution closes with only these fluxes).

Construction: gas energy flux + radiative flux is globally conserved
(Fg + F = C), so for a given F the gas state is algebraic -- a quadratic
in u with a supersonic (precursor) and a subsonic (relaxation) branch.
The solution is two heteroclinic trajectories in the (Er, F) phase plane:
one leaving the upstream equilibrium on the supersonic branch, one
entering the downstream equilibrium on the subsonic branch, connected by
an embedded pure-gas shock at the point where the trajectories intersect
(Er and F are both continuous across the jump; only the gas branch
switches). x-profiles follow from dx = dEr / g.
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import solve_ivp
from scipy.optimize import brentq


class RadShockExact:
    def __init__(self, rho1, u1, T1, gamma, cv, chi, c, arad):
        self.gamma, self.cv = gamma, cv
        self.chi, self.c, self.a = chi, c, arad
        self.m = rho1 * u1
        self.P = rho1 * u1 * u1 + rho1 * (gamma - 1.0) * cv * T1
        self.C = self.m * (gamma * cv * T1 + 0.5 * u1 * u1)
        # downstream end state from the gas Rankine-Hugoniot of the same
        # invariants (radiative flux vanishes at both equilibria)
        gcv = gamma * cv
        A, B = 0.5 - gcv, gcv * self.P / self.m
        disc = B * B - 2.0 * A * (-self.C / self.m) * 2.0  # reused below
        self.u1, self.T1 = u1, T1
        u2 = self._u_of_F(0.0, supersonic=False)
        self.u2 = u2
        self.T2 = (self.P - self.m * u2) * u2 / (self.m * (gamma - 1.0) * cv)
        self.rho2 = self.m / u2

    # -- algebraic gas closure at given radiative flux F ------------------
    def _disc(self, F):
        g, m, P = self.gamma, self.m, self.P
        gcv_r = g / (g - 1.0)
        a = 0.5 * m - gcv_r * m
        b = gcv_r * P
        return b * b + 4.0 * a * (self.C - F)

    def _u_of_F(self, F, supersonic):
        """Roots of  m(gamma cv T(u) + u^2/2) = C - F  with
        T(u) = (P - m u) u / (m (gamma-1) cv)."""
        g, m, P = self.gamma, self.m, self.P
        gcv_r = g / (g - 1.0)  # gamma cv / ((gamma-1) cv)
        a = 0.5 * m - gcv_r * m
        b = gcv_r * P
        disc = self._disc(F)
        if disc < 0.0:
            raise ValueError("no gas state at this radiative flux")
        r = np.sqrt(disc)
        up = (-b + r) / (2.0 * a)
        um = (-b - r) / (2.0 * a)
        lo, hi = min(up, um), max(up, um)
        return hi if supersonic else lo

    def _T_of_u(self, u):
        return (self.P - self.m * u) * u / (self.m * (self.gamma - 1.0) * self.cv)

    def _grad_of_F(self, F, Er):
        """Invert F = -(c lam(R)/chi) g with R = |g|/(chi Er) for g.

        Closed form: with y = |F|/(c Er),  y = R(2+R)/(6+3R+R^2)  is a
        quadratic in R:  (y-1) R^2 + (3y-2) R + 6y = 0."""
        if F == 0.0:
            return 0.0
        c, chi = self.c, self.chi
        # free-streaming bound: |F| < c Er (lam*R -> 1 as R -> inf)
        y = min(abs(F) / (c * Er), 1.0 - 1e-12)
        a, b, cc = y - 1.0, 3.0 * y - 2.0, 6.0 * y
        disc = b * b - 4.0 * a * cc
        R = (-b - np.sqrt(disc)) / (2.0 * a)  # positive root for y in (0,1)
        return -np.sign(F) * R * chi * Er

    def _rhs_phase(self, Er, F, supersonic):
        """(dF/dEr, dx/dEr) on a gas branch."""
        u = self._u_of_F(F, supersonic)
        T = self._T_of_u(u)
        S = self.c * self.chi * (self.a * T**4 - Er)
        g = self._grad_of_F(F, Er)
        return S / g, 1.0 / g

    # -- heteroclinic trajectories ----------------------------------------
    def _trajectory(self, supersonic):
        """Integrate (Er, F)(x) away from an equilibrium fixed point.

        Precursor (supersonic branch): leaves the upstream equilibrium
        along its unstable manifold, integrated forward in +x.  Relaxation
        (subsonic): approaches the downstream equilibrium along its stable
        manifold as x -> +inf, so it is integrated backward in x.  Both
        terminate when the gas branch ceases to exist (sonic point) or the
        interior Er bound is reached."""
        a, c, chi = self.a, self.c, self.chi
        T0 = self.T1 if supersonic else self.T2
        Er0 = a * T0**4
        Er1, Er2 = a * self.T1**4, a * self.T2**4
        eps = 1e-7 * Er0
        sgn_x = 1.0 if supersonic else -1.0  # integration direction

        def rhs(_, y):
            Er, F = y
            u = self._u_of_F(F, supersonic)
            T = self._T_of_u(u)
            S = c * chi * (a * T**4 - Er)
            g = self._grad_of_F(F, Er)
            return [sgn_x * g, sgn_x * S]

        # numerical Jacobian (in true x) at the fixed point
        J = np.zeros((2, 2))
        y0 = np.array([Er0, 0.0])
        dy = np.array([eps, eps * c])
        for j in range(2):
            yp = y0.copy(); yp[j] += dy[j]
            ym = y0.copy(); ym[j] -= dy[j]
            fp = np.array(rhs(0.0, yp)) * sgn_x
            fm = np.array(rhs(0.0, ym)) * sgn_x
            J[:, j] = (fp - fm) / (2.0 * dy[j])
        evals, evecs = np.linalg.eig(J)
        # precursor leaves along the unstable (positive) eigenvector in +x;
        # relaxation leaves the downstream point along the stable (negative)
        # eigenvector when walked backward in x.
        idx = int(np.argmax(evals.real)) if supersonic else int(np.argmin(evals.real))
        v = np.real(evecs[:, idx])
        if v[0] == 0.0:
            raise RuntimeError("degenerate eigenvector")
        v = v / v[0]
        # Er moves into the interior: up from upstream, down from downstream
        v = v if supersonic else -v
        y = y0 + eps * v

        tiny_disc = 1e-12 * self._disc(0.0)

        def ev_sonic(_, yv):
            return self._disc(yv[1]) - tiny_disc
        ev_sonic.terminal = True

        def ev_er(_, yv):
            # stop just shy of the opposite equilibrium Er
            return (Er2 * (1.0 - 1e-10) - yv[0]) if supersonic \
                else (yv[0] - Er1)
        ev_er.terminal = True

        k = abs(evals.real[idx])
        xmax = 200.0 / k  # decades of growth; events stop earlier
        sol = solve_ivp(rhs, (0.0, xmax), y, method="LSODA",
                        rtol=1e-11, atol=[1e-18, 1e-14],
                        events=[ev_sonic, ev_er], dense_output=True,
                        max_step=xmax / 200.0)
        if not sol.success:
            raise RuntimeError(f"trajectory integration failed: {sol.message}")
        # return as arrays of (x_signed, Er, F); x measured in true x
        xs = sgn_x * sol.t
        return xs, sol.y[0], sol.y[1]

    def solve(self, n=4096):
        """Return dict of arrays x, rho, u, T, Er for the full profile
        (x = 0 at the embedded gas shock)."""
        a = self.a
        xp, Ep, Fp = self._trajectory(True)    # precursor, x increasing
        xr, Er_, Fr = self._trajectory(False)  # relaxation, x decreasing

        # intersection in the (Er, F) plane: F_pre(Er) = F_rel(Er).
        # Both trajectories have monotone Er in the interior.
        Fp_of = lambda E: np.interp(E, Ep, Fp)
        o = np.argsort(Er_)
        Fr_of = lambda E: np.interp(E, Er_[o], Fr[o])
        lo = max(Ep.min(), Er_.min())
        hi = min(Ep.max(), Er_.max())
        if not lo < hi:
            raise RuntimeError("trajectories do not overlap in Er")

        def dF(E):
            return Fp_of(E) - Fr_of(E)

        Es = np.linspace(lo, hi, 4000)
        vals = dF(Es)
        flips = np.nonzero(np.diff(np.sign(vals)))[0]
        if len(flips) == 0:
            raise RuntimeError("no phase-plane intersection found")
        k = flips[-1]
        Er_s = brentq(dF, Es[k], Es[k + 1], rtol=1e-13)
        F_s = float(Fp_of(Er_s))

        # assemble x-profiles, anchored so x=0 at the shock
        x_pre_s = np.interp(Er_s, Ep, xp)
        x_rel_s = np.interp(Er_s, Er_[o], xr[o])
        mp = Ep <= Er_s
        mr = Er_ >= Er_s
        xpa = xp[mp] - x_pre_s
        xra = xr[mr] - x_rel_s

        def gas(Farr, supersonic):
            u = np.array([self._u_of_F(F, supersonic) for F in Farr])
            T = self._T_of_u(u)
            return u, T

        up_, Tp = gas(Fp[mp], True)
        ur_, Tr = gas(Fr[mr], False)
        x = np.concatenate([xpa, xra])
        Er = np.concatenate([Ep[mp], Er_[mr]])
        u = np.concatenate([up_, ur_])
        T = np.concatenate([Tp, Tr])
        order = np.argsort(x, kind="stable")
        x, Er, u, T = x[order], Er[order], u[order], T[order]
        rho = self.m / u
        return {"x": x, "rho": rho, "u": u, "T": T, "Er": Er,
                "Er_shock": Er_s, "F_shock": F_s}

    def sample(self, xq, xshock=0.0):
        """Profile sampled at query points xq with the shock at xshock."""
        prof = self.solve()
        out = {}
        xs = xq - xshock
        for key in ("rho", "u", "T", "Er"):
            lo_val = prof[key][0]
            hi_val = prof[key][-1]
            out[key] = np.interp(xs, prof["x"], prof[key],
                                 left=lo_val, right=hi_val)
        return out
