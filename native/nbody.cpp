// artemis_tpu native few-body integrator.
//
// TPU-native replacement for the reference's embedded REBOUND C library
// (SURVEY.md §2.6 item 4): a deterministic, replicated few-body integrator
// with IAS15-class accuracy.  The N-body state is tiny (N ~ dozens), so it
// lives on the host; every process computes identical trajectories, which
// removes the reference's rank-0 + MPI_Bcast pattern entirely.
//
// Integrators:
//   0 = ias15    adaptive 15th-order Gauss-Radau (Everhart / Rein & Spiegel
//                2015 formulation; implemented here via a direct polynomial
//                solve at the Radau nodes rather than the incremental g/b
//                recurrences — mathematically the same collocation scheme)
//   1 = leapfrog fixed-step kick-drift-kick
//   2 = none     (no motion)
//
// Extras: optional post-Newtonian pair forces (1, 2, 2.5 PN; Blanchet 2006
// conventions as in the reference's nbody_extras.cpp) and collision
// detection with bound-pair merging.
//
// C ABI for ctypes.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr int KMAX = 8;  // Radau nodes (including h=0)

// Gauss-Radau spacings for IAS15
const double H[KMAX] = {0.0,
                        0.0562625605369221464656522,
                        0.1802406917368923649875799,
                        0.3526247171131696373739078,
                        0.5471536263305553830014486,
                        0.7342101772154105315232106,
                        0.8853209468390957680903598,
                        0.9775206135612875018911745};

struct Sim {
  int n = 0;
  double G = 1.0;
  int pn_order = 0;
  double c_light = 1.0;
  int pn2 = 1;
  std::vector<double> m, pos, vel, radius;
  std::vector<int> alive;
  // mercurius encounter-subsystem extras (zero/empty = plain N-body):
  // central 1/r^2 attractor of strength central_mu at the origin, and a
  // per-particle changeover radius; pair forces are weighted by
  // (1 - K(r / max(rcrit_i, rcrit_j))) when kweight is set.
  double central_mu = 0.0;
  int kweight = 0;
  std::vector<double> rcrit;
};

// MERCURIUS changeover function (Rein et al. 2019 eq. 10): smooth quintic
// ramp from 0 (r <= 0.1 rc, fully direct) to 1 (r >= rc, fully symplectic).
double kchange(double r, double rc) {
  const double y = (r / rc - 0.1) / 0.9;
  if (y <= 0.0) return 0.0;
  if (y >= 1.0) return 1.0;
  return y * y * y * (10.0 + y * (-15.0 + 6.0 * y));
}

// ---------------------------------------------------------------------------
// accelerations: softening-free mutual gravity + optional PN corrections
void accel(const Sim &s, const double *x, const double *v, double *a) {
  const int n = s.n;
  std::fill(a, a + 3 * n, 0.0);
  for (int i = 0; i < n; i++) {
    if (!s.alive[i]) continue;
    for (int j = i + 1; j < n; j++) {
      if (!s.alive[j]) continue;
      double dx[3] = {x[3 * i] - x[3 * j], x[3 * i + 1] - x[3 * j + 1],
                      x[3 * i + 2] - x[3 * j + 2]};
      double r2 = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2];
      double r = std::sqrt(r2);
      double ir3 = 1.0 / (r2 * r + 1e-300);
      if (s.kweight) {
        const double rc = std::max(s.rcrit[i], s.rcrit[j]);
        ir3 *= 1.0 - kchange(r, rc);
      }
      for (int d = 0; d < 3; d++) {
        a[3 * i + d] -= s.G * s.m[j] * dx[d] * ir3;
        a[3 * j + d] += s.G * s.m[i] * dx[d] * ir3;
      }
    }
  }
  if (s.central_mu > 0.0) {
    for (int i = 0; i < n; i++) {
      if (!s.alive[i]) continue;
      const double r2 = x[3 * i] * x[3 * i] + x[3 * i + 1] * x[3 * i + 1] +
                        x[3 * i + 2] * x[3 * i + 2];
      const double ir3 = 1.0 / (r2 * std::sqrt(r2) + 1e-300);
      for (int d = 0; d < 3; d++) a[3 * i + d] -= s.central_mu * x[3 * i + d] * ir3;
    }
  }

  if (s.pn_order > 0) {
    // PN pair forces for bound pairs (cf. reference nbody_extras.cpp:32-152)
    const double c = s.c_light;
    for (int i = 0; i < n; i++) {
      if (!s.alive[i]) continue;
      const double mi = s.m[i];
      const double vi[3] = {v[3 * i] / c, v[3 * i + 1] / c, v[3 * i + 2] / c};
      const double vi2 = vi[0] * vi[0] + vi[1] * vi[1] + vi[2] * vi[2];
      for (int j = i + 1; j < n; j++) {
        if (!s.alive[j]) continue;
        const double mj = s.m[j];
        const double vj[3] = {v[3 * j] / c, v[3 * j + 1] / c, v[3 * j + 2] / c};
        const double vj2 = vj[0] * vj[0] + vj[1] * vj[1] + vj[2] * vj[2];
        double dr[3] = {x[3 * i] - x[3 * j], x[3 * i + 1] - x[3 * j + 1],
                        x[3 * i + 2] - x[3 * j + 2]};
        double dv[3] = {vi[0] - vj[0], vi[1] - vj[1], vi[2] - vj[2]};
        const double dr2 = dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2];
        const double ddr = std::sqrt(dr2);
        const double dv2 = dv[0] * dv[0] + dv[1] * dv[1] + dv[2] * dv[2];
        const double xgi = s.G * mi / (c * c) / ddr;
        const double xgj = s.G * mj / (c * c) / ddr;
        const double xg = s.G * (mi + mj) / (c * c) / ddr;
        const double ebin = 0.5 * dv2 - xg;
        if (ebin >= 0.0) continue;
        double nv[3] = {dr[0] / ddr, dr[1] / ddr, dr[2] / ddr};
        const double vij = vi[0] * vj[0] + vi[1] * vj[1] + vi[2] * vj[2];
        const double ndi = nv[0] * vi[0] + nv[1] * vi[1] + nv[2] * vi[2];
        const double ndj = nv[0] * vj[0] + nv[1] * vj[1] + nv[2] * vj[2];
        const double ndv = ndi - ndj;

        auto a1 = [](double vi2_, double vj2_, double ndj_, double vij_,
                     double xi_, double xj_) {
          return -vi2_ - 2.0 * vj2_ + 4.0 * vij_ + 1.5 * ndj_ * ndj_ + 5.0 * xi_ +
                 4.0 * xj_;
        };
        auto b1 = [](double ndi_, double ndj_) { return 4.0 * ndi_ - 3.0 * ndj_; };
        auto a2 = [](double vi2_, double ndi_, double vj2_, double ndj_, double vij_,
                     double xi_, double xj_) {
          const double ndj2 = ndj_ * ndj_;
          const double ndi2 = ndi_ * ndi_;
          const double f1 = -2.0 * vj2_ * vj2_ + 4.0 * vj2_ * vij_ - 2.0 * vij_ * vij_ +
                            ndj2 * (1.5 * vi2_ + 4.5 * vj2_ - 6.0 * vij_ -
                                    15.0 / 8.0 * ndj2);
          const double f2 = -15.0 / 4.0 * vi2_ + 5.0 / 4.0 * vj2_ - 2.5 * vij_ +
                            39.0 / 2.0 * ndi2 - 39.0 * ndi_ * ndj_ + 17.0 / 2.0 * ndj2;
          const double f3 = 4.0 * vj2_ - 8.0 * vij_ + 2.0 * ndi2 - 4.0 * ndi_ * ndj_ -
                            6.0 * ndj2;
          const double f4 = -57.0 / 4.0 * xi_ * xi_ - 9.0 * xj_ * xj_ -
                            69.0 / 2.0 * xi_ * xj_;
          return f1 + f2 * xi_ + f3 * xj_ + f4;
        };
        auto b2 = [](double vi2_, double ndi_, double vj2_, double ndj_, double vij_,
                     double xi_, double xj_) {
          const double ndj2 = ndj_ * ndj_;
          const double f1 = vi2_ * ndj_ + 4.0 * vj2_ * ndi_ - 5.0 * vj2_ * ndj_ -
                            4.0 * vij_ * ndi_ + 4.0 * vij_ * ndj_ - 6.0 * ndi_ * ndj2 +
                            4.5 * ndj_ * ndj2;
          const double f2 = -63.0 / 4.0 * ndi_ + 55.0 / 4.0 * ndj_;
          const double f3 = -2.0 * ndi_ - 2.0 * ndj_;
          return f1 + f2 * xi_ + f3 * xj_;
        };
        auto a25 = [](double ndv_, double xi_, double xj_, double v2_) {
          return 4.0 / 5.0 * xi_ * ndv_ * (3.0 * v2_ - 6.0 * xi_ + 52.0 / 3.0 * xj_);
        };
        auto b25 = [](double ndv_, double xi_, double xj_, double v2_) {
          return 4.0 / 5.0 * xi_ * (-v2_ + 2.0 * xi_ - 8.0 * xj_);
        };

        double ai = a1(vi2, vj2, ndj, vij, xgi, xgj);
        double aj = a1(vj2, vi2, ndi, vij, xgj, xgi);
        double bi = b1(ndi, ndj);
        double bj = -b1(ndj, ndi);
        if (s.pn_order > 1) {
          if (s.pn2) {
            ai += a2(vi2, ndi, vj2, ndj, vij, xgi, xgj);
            aj += a2(vj2, ndj, vi2, ndi, vij, xgj, xgi);
            bi += b2(vi2, ndi, vj2, ndj, vij, xgi, xgj);
            bj -= b2(vj2, ndj, vi2, ndi, vij, xgj, xgi);
          }
          if (s.pn_order > 2) {
            ai += a25(ndv, xgi, xgj, dv2);
            aj += a25(ndv, xgj, xgi, dv2);
            bi += b25(ndv, xgi, xgj, dv2);
            bj += b25(ndv, xgj, xgi, dv2);
          }
        }
        for (int d = 0; d < 3; d++) {
          a[3 * i + d] += s.G * mj / dr2 * (nv[d] * ai + dv[d] * bi);
          a[3 * j + d] -= s.G * mi / dr2 * (nv[d] * aj + dv[d] * bj);
        }
      }
    }
  }
}

// ---------------------------------------------------------------------------
// collisions: merge bound overlapping pairs (keep the more massive slot)
// (cf. reference collision_resolution, nbody_extras.cpp:157-172)
bool resolve_collisions(Sim &s, int merge_on_collision) {
  bool merged_any = false;
  for (int i = 0; i < s.n; i++) {
    if (!s.alive[i] || s.radius[i] <= 0.0) continue;
    for (int j = i + 1; j < s.n; j++) {
      if (!s.alive[j] || s.radius[j] <= 0.0) continue;
      double dx[3] = {s.pos[3 * i] - s.pos[3 * j], s.pos[3 * i + 1] - s.pos[3 * j + 1],
                      s.pos[3 * i + 2] - s.pos[3 * j + 2]};
      double dr = std::sqrt(dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]);
      if (dr > s.radius[i] + s.radius[j]) continue;
      double dv2 = 0.0;
      for (int d = 0; d < 3; d++) {
        double dvd = s.vel[3 * i + d] - s.vel[3 * j + d];
        dv2 += dvd * dvd;
      }
      const double mb = s.m[i] + s.m[j];
      // NOTE: binding energy check uses G=1-scaled masses as the reference
      const double eb = 0.5 * dv2 - s.G * mb / (dr + 1e-300);
      if (!(merge_on_collision || eb <= 0.0)) continue;
      // merge j into i: conserve mass and momentum; volume-add radii
      for (int d = 0; d < 3; d++) {
        s.pos[3 * i + d] = (s.m[i] * s.pos[3 * i + d] + s.m[j] * s.pos[3 * j + d]) / mb;
        s.vel[3 * i + d] = (s.m[i] * s.vel[3 * i + d] + s.m[j] * s.vel[3 * j + d]) / mb;
      }
      s.radius[i] = std::cbrt(std::pow(s.radius[i], 3) + std::pow(s.radius[j], 3));
      s.m[i] = mb;
      s.m[j] = 0.0;
      s.alive[j] = 0;
      merged_any = true;
    }
  }
  return merged_any;
}

// ---------------------------------------------------------------------------
// IAS15 step machinery: collocation polynomial at the Radau nodes.
// a(h) = a0 + sum_k b_k h^k (k=1..7); b solved from node accelerations with
// the precomputed inverse Vandermonde matrix.
struct Radau {
  double Vinv[7][7];
  Radau() {
    double V[7][7];
    for (int i = 0; i < 7; i++)
      for (int k = 0; k < 7; k++)
        V[i][k] = std::pow(H[i + 1], k + 1);
    // invert V by Gauss-Jordan
    double aug[7][14];
    for (int i = 0; i < 7; i++) {
      for (int j = 0; j < 7; j++) {
        aug[i][j] = V[i][j];
        aug[i][7 + j] = (i == j) ? 1.0 : 0.0;
      }
    }
    for (int col = 0; col < 7; col++) {
      int piv = col;
      for (int r = col + 1; r < 7; r++)
        if (std::fabs(aug[r][col]) > std::fabs(aug[piv][col])) piv = r;
      std::swap_ranges(aug[col], aug[col] + 14, aug[piv]);
      const double p = aug[col][col];
      for (int j = 0; j < 14; j++) aug[col][j] /= p;
      for (int r = 0; r < 7; r++) {
        if (r == col) continue;
        const double f = aug[r][col];
        for (int j = 0; j < 14; j++) aug[r][j] -= f * aug[col][j];
      }
    }
    for (int i = 0; i < 7; i++)
      for (int j = 0; j < 7; j++) Vinv[i][j] = aug[i][7 + j];
  }
};
const Radau RADAU;

// advance by one adaptive IAS15 step; returns the dt actually taken and
// sets *dt_next to the recommended next step
double ias15_step(Sim &s, double dt, double dt_max, double eps, double *dt_next) {
  const int n3 = 3 * s.n;
  std::vector<double> x0(s.pos), v0(s.vel), a0(n3);
  accel(s, x0.data(), v0.data(), a0.data());
  double amax = 1e-300;
  for (int d = 0; d < n3; d++) amax = std::max(amax, std::fabs(a0[d]));

  std::vector<double> b(7 * n3, 0.0), anode(7 * n3), xi(n3), vi(n3);

  for (;;) {
    dt = std::min(dt, dt_max);
    // predictor-corrector iterations
    for (int iter = 0; iter < 12; iter++) {
      double db_max = 0.0;
      for (int i = 1; i < KMAX; i++) {
        const double h = H[i];
        const double hdt = h * dt;
        for (int d = 0; d < n3; d++) {
          // series for x and v at node h from current b
          double xacc = 0.0, vacc = 0.0;
          double hk = 1.0;
          for (int k = 1; k <= 7; k++) {
            hk *= h;
            const double bk = b[(k - 1) * n3 + d];
            vacc += bk * hk / (k + 1.0);
            xacc += bk * hk / ((k + 1.0) * (k + 2.0));
          }
          vi[d] = v0[d] + hdt * (a0[d] + vacc);
          xi[d] = x0[d] + v0[d] * hdt + 0.5 * hdt * hdt * (a0[d] + 2.0 * xacc);
        }
        accel(s, xi.data(), vi.data(), &anode[(i - 1) * n3]);
      }
      // solve for b from the node accelerations
      for (int d = 0; d < n3; d++) {
        double rhs[7];
        for (int i = 0; i < 7; i++) rhs[i] = anode[i * n3 + d] - a0[d];
        for (int k = 0; k < 7; k++) {
          double bk = 0.0;
          for (int i = 0; i < 7; i++) bk += RADAU.Vinv[k][i] * rhs[i];
          db_max = std::max(db_max, std::fabs(bk - b[k * n3 + d]));
          b[k * n3 + d] = bk;
        }
      }
      if (db_max < 1e-16 * amax) break;
    }

    // error estimate from the highest-order coefficient
    double b7max = 1e-300;
    for (int d = 0; d < n3; d++) b7max = std::max(b7max, std::fabs(b[6 * n3 + d]));
    const double err = b7max / amax;
    const double fac = std::pow(eps / (err + 1e-300), 1.0 / 7.0);
    if (err > eps && dt > 1e-12 * dt_max) {
      dt *= std::max(0.2, 0.9 * fac);  // reject, retry smaller
      continue;
    }
    *dt_next = dt * std::min(5.0, std::max(0.2, 0.9 * fac));
    break;
  }

  // accept: evaluate series at h=1
  for (int d = 0; d < n3; d++) {
    double vacc = 0.0, xacc = 0.0;
    for (int k = 1; k <= 7; k++) {
      const double bk = b[(k - 1) * n3 + d];
      vacc += bk / (k + 1.0);
      xacc += bk / ((k + 1.0) * (k + 2.0));
    }
    s.vel[d] = v0[d] + dt * (a0[d] + vacc);
    s.pos[d] = x0[d] + v0[d] * dt + 0.5 * dt * dt * (a0[d] + 2.0 * xacc);
  }
  return dt;
}

// ---------------------------------------------------------------------------
// Gragg-Bulirsch-Stoer: modified-midpoint substeps + Richardson extrapolation
// in h^2 (Gragg's smoothed scheme has an even error expansion).  This is the
// algorithm class behind the reference menu's "bs" option
// (rebound integrator_bs.c, itself after Hairer ODEX) — a genuinely distinct
// method from the Gauss-Radau collocation above.
// ---------------------------------------------------------------------------

// one modified-midpoint pass over [0, dt] with nsub substeps on y = (x, v)
void midpoint_pass(Sim &s, const double *x0, const double *v0, double dt,
                   int nsub, double *xout, double *vout) {
  const int n3 = 3 * s.n;
  const double h = dt / nsub;
  std::vector<double> xm(x0, x0 + n3), vm(v0, v0 + n3);  // z_{m-1}
  std::vector<double> xc(n3), vc(n3), a(n3);             // z_m
  accel(s, xm.data(), vm.data(), a.data());
  for (int d = 0; d < n3; d++) {
    xc[d] = xm[d] + h * vm[d];
    vc[d] = vm[d] + h * a[d];
  }
  for (int m = 1; m < nsub; m++) {
    accel(s, xc.data(), vc.data(), a.data());
    for (int d = 0; d < n3; d++) {
      const double xn = xm[d] + 2.0 * h * vc[d];
      const double vn = vm[d] + 2.0 * h * a[d];
      xm[d] = xc[d]; vm[d] = vc[d];
      xc[d] = xn; vc[d] = vn;
    }
  }
  accel(s, xc.data(), vc.data(), a.data());
  for (int d = 0; d < n3; d++) {  // Gragg smoothing endpoint formula
    xout[d] = 0.5 * (xc[d] + xm[d] + h * vc[d]);
    vout[d] = 0.5 * (vc[d] + vm[d] + h * a[d]);
  }
}

// advance by one adaptive GBS step; returns dt taken, sets *dt_next
double bs_step(Sim &s, double dt, double dt_max, double eps, double *dt_next) {
  static const int NSEQ[8] = {2, 4, 6, 8, 10, 12, 14, 16};
  const int n3 = 3 * s.n;
  std::vector<double> x0(s.pos), v0(s.vel);
  // scale for the relative error test: per-component magnitude floor
  std::vector<double> sc(2 * n3);
  for (int d = 0; d < n3; d++) {
    sc[d] = std::fabs(x0[d]);
    sc[n3 + d] = std::fabs(v0[d]);
  }
  double scmax = 1e-300;
  for (double v : sc) scmax = std::max(scmax, v);
  for (double &v : sc) v = std::max(v, 1e-6 * scmax);

  std::vector<double> T(8 * 2 * n3);  // extrapolation tableau rows
  std::vector<double> xk(n3), vk(n3);
  for (;;) {
    dt = std::min(dt, dt_max);
    double err = 1e300;
    int k = 0;
    for (k = 0; k < 8; k++) {
      midpoint_pass(s, x0.data(), v0.data(), dt, NSEQ[k], xk.data(), vk.data());
      double *Tk = &T[k * 2 * n3];
      for (int d = 0; d < n3; d++) { Tk[d] = xk[d]; Tk[n3 + d] = vk[d]; }
      // Aitken-Neville update in h^2 = (dt/NSEQ)^2
      for (int j = k - 1; j >= 0; j--) {
        const double r = (double)NSEQ[k] / (double)NSEQ[j];
        const double den = r * r - 1.0;
        double *Tj = &T[j * 2 * n3], *Tj1 = &T[(j + 1) * 2 * n3];
        for (int d = 0; d < 2 * n3; d++) Tj[d] = Tj1[d] + (Tj1[d] - Tj[d]) / den;
      }
      if (k > 0) {
        err = 0.0;
        const double *Ta = &T[0], *Tb = &T[2 * n3];
        for (int d = 0; d < 2 * n3; d++)
          err = std::max(err, std::fabs(Ta[d] - Tb[d]) / sc[d]);
        if (err < eps) break;
      }
    }
    if (err < eps || dt <= 1e-12 * dt_max) {
      const int kk = std::min(k, 7);
      const double fac =
          0.9 * std::pow(eps / (err + 1e-300), 1.0 / (2.0 * kk + 1.0));
      *dt_next = dt * std::min(5.0, std::max(0.2, fac));
      for (int d = 0; d < n3; d++) {
        s.pos[d] = T[d];
        s.vel[d] = T[n3 + d];
      }
      return dt;
    }
    dt *= 0.5;  // reject: halve and rebuild the tableau
  }
}

void leapfrog_step(Sim &s, double dt) {
  const int n3 = 3 * s.n;
  std::vector<double> a(n3);
  accel(s, s.pos.data(), s.vel.data(), a.data());
  for (int d = 0; d < n3; d++) s.vel[d] += 0.5 * dt * a[d];
  for (int d = 0; d < n3; d++) s.pos[d] += dt * s.vel[d];
  accel(s, s.pos.data(), s.vel.data(), a.data());
  for (int d = 0; d < n3; d++) s.vel[d] += 0.5 * dt * a[d];
}

// ---------------------------------------------------------------------------
// Wisdom-Holman symplectic integrator, democratic-heliocentric splitting
// (Duncan, Levison & Lee 1998; the whfast-class option of the reference's
// rebound embedding, nbody.cpp:203-223).  Fixed step:
//   sun-drift dt/2 -> interaction kick dt/2 -> Kepler drift dt
//   -> interaction kick dt/2 -> sun-drift dt/2
// Kepler propagation uses universal variables with Stumpff functions
// (robust for elliptic and hyperbolic orbits).
// ---------------------------------------------------------------------------

void stumpff(double z, double *C, double *S) {
  if (z > 1e-8) {
    const double sz = std::sqrt(z);
    *C = (1.0 - std::cos(sz)) / z;
    *S = (sz - std::sin(sz)) / (sz * z);
  } else if (z < -1e-8) {
    const double sz = std::sqrt(-z);
    *C = (std::cosh(sz) - 1.0) / (-z);
    *S = (std::sinh(sz) - sz) / (sz * -z);
  } else {
    *C = 0.5 - z / 24.0 + z * z / 720.0;
    *S = 1.0 / 6.0 - z / 120.0 + z * z / 5040.0;
  }
}

// Propagate one Kepler orbit (mu) by dt using f&g universal-variable series.
void kepler_drift(double mu, double *r, double *v, double dt) {
  const double r0 = std::sqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2]);
  if (r0 <= 0.0 || mu <= 0.0) {  // free drift fallback
    for (int d = 0; d < 3; d++) r[d] += dt * v[d];
    return;
  }
  const double v2 = v[0] * v[0] + v[1] * v[1] + v[2] * v[2];
  const double vr0 = (r[0] * v[0] + r[1] * v[1] + r[2] * v[2]) / r0;
  const double smu = std::sqrt(mu);
  const double alpha = 2.0 / r0 - v2 / mu;  // 1/a (sign selects conic)
  double chi = (std::fabs(alpha) > 1e-12) ? smu * std::fabs(alpha) * dt
                                          : smu * dt / r0;
  double C = 0.5, S = 1.0 / 6.0;
  for (int it = 0; it < 60; it++) {
    const double z = alpha * chi * chi;
    stumpff(z, &C, &S);
    const double F = r0 * vr0 / smu * chi * chi * C
                     + (1.0 - alpha * r0) * chi * chi * chi * S
                     + r0 * chi - smu * dt;
    const double dF = r0 * vr0 / smu * chi * (1.0 - z * S)
                      + (1.0 - alpha * r0) * chi * chi * C + r0;
    const double step = F / dF;
    chi -= step;
    if (std::fabs(step) < 1e-14 * (std::fabs(chi) + 1.0)) break;
  }
  const double z = alpha * chi * chi;
  stumpff(z, &C, &S);
  const double f = 1.0 - chi * chi * C / r0;
  const double g = dt - chi * chi * chi * S / smu;
  double rn[3];
  for (int d = 0; d < 3; d++) rn[d] = f * r[d] + g * v[d];
  const double rlen = std::sqrt(rn[0] * rn[0] + rn[1] * rn[1] + rn[2] * rn[2]);
  const double fdot = smu / (rlen * r0) * chi * (z * S - 1.0);
  const double gdot = 1.0 - chi * chi * C / rlen;
  double vn[3];
  for (int d = 0; d < 3; d++) vn[d] = fdot * r[d] + gdot * v[d];
  for (int d = 0; d < 3; d++) { r[d] = rn[d]; v[d] = vn[d]; }
}

// democratic-heliocentric state: body 0 = dominant central mass (the
// reference setups put the star first); heliocentric positions +
// barycentric velocities
struct DH {
  double m0 = 0.0, mtot = 0.0;
  double pv[3] = {0, 0, 0};        // barycentric velocity of the COM
  std::vector<double> rh, vb;
};

DH dh_from_inertial(const Sim &s) {
  const int n = s.n;
  DH d;
  d.m0 = s.m[0];
  d.rh.resize(3 * n);
  d.vb.resize(3 * n);
  for (int i = 0; i < n; i++) {
    if (!s.alive[i]) continue;
    d.mtot += s.m[i];
    for (int k = 0; k < 3; k++) d.pv[k] += s.m[i] * s.vel[3 * i + k];
  }
  for (int k = 0; k < 3; k++) d.pv[k] /= d.mtot;
  for (int i = 0; i < n; i++)
    for (int k = 0; k < 3; k++) {
      d.rh[3 * i + k] = s.pos[3 * i + k] - s.pos[k];
      d.vb[3 * i + k] = s.vel[3 * i + k] - d.pv[k];
    }
  return d;
}

// back to inertial coordinates: the center of mass drifts uniformly;
// the star sits at COM minus the mass-weighted heliocentric offsets
void dh_to_inertial(Sim &s, const DH &dh, double dt) {
  const int n = s.n;
  for (int d = 0; d < 3; d++) {
    double Rc = 0.0, mr = 0.0, mv = 0.0;
    for (int i = 0; i < n; i++) {
      if (!s.alive[i]) continue;
      Rc += s.m[i] * s.pos[3 * i + d];
      if (i > 0) {
        mr += s.m[i] * dh.rh[3 * i + d];
        mv += s.m[i] * dh.vb[3 * i + d];
      }
    }
    Rc = Rc / dh.mtot + dt * dh.pv[d];     // COM after the step (exact)
    const double r0d = Rc - mr / dh.mtot;  // star position
    const double v0d = -mv / dh.m0;        // star barycentric velocity
    for (int i = 0; i < n; i++) {
      if (!s.alive[i]) continue;
      if (i == 0) {
        s.pos[3 * i + d] = r0d;
        s.vel[3 * i + d] = dh.pv[d] + v0d;
      } else {
        s.pos[3 * i + d] = r0d + dh.rh[3 * i + d];
        s.vel[3 * i + d] = dh.pv[d] + dh.vb[3 * i + d];
      }
    }
  }
}

void dh_sun_drift(const Sim &s, DH &d, double h) {
  double ps[3] = {0, 0, 0};
  for (int i = 1; i < s.n; i++) {
    if (!s.alive[i]) continue;
    for (int k = 0; k < 3; k++) ps[k] += s.m[i] * d.vb[3 * i + k];
  }
  for (int i = 1; i < s.n; i++) {
    if (!s.alive[i]) continue;
    for (int k = 0; k < 3; k++) d.rh[3 * i + k] += h * ps[k] / d.m0;
  }
}

// planet-planet interaction kick (the Kepler part handles the star); with
// rcrit non-null the pair force is weighted by the MERCURIUS changeover K
void dh_kick(const Sim &s, DH &d, double h, const double *rcrit) {
  for (int i = 1; i < s.n; i++) {
    if (!s.alive[i]) continue;
    double a[3] = {0, 0, 0};
    for (int j = 1; j < s.n; j++) {
      if (j == i || !s.alive[j]) continue;
      double dr[3];
      for (int k = 0; k < 3; k++) dr[k] = d.rh[3 * i + k] - d.rh[3 * j + k];
      const double d2 = dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2];
      double idr3 = 1.0 / (std::sqrt(d2) * d2 + 1e-300);
      if (rcrit)
        idr3 *= kchange(std::sqrt(d2), std::max(rcrit[i], rcrit[j]));
      for (int k = 0; k < 3; k++) a[k] -= s.G * s.m[j] * dr[k] * idr3;
    }
    for (int k = 0; k < 3; k++) d.vb[3 * i + k] += h * a[k];
  }
}

void whfast_step(Sim &s, double dt) {
  if (s.n < 2) return;
  DH d = dh_from_inertial(s);
  dh_sun_drift(s, d, 0.5 * dt);
  dh_kick(s, d, 0.5 * dt, nullptr);
  for (int i = 1; i < s.n; i++) {
    if (!s.alive[i]) continue;
    kepler_drift(s.G * d.m0, &d.rh[3 * i], &d.vb[3 * i], dt);
  }
  dh_kick(s, d, 0.5 * dt, nullptr);
  dh_sun_drift(s, d, 0.5 * dt);
  dh_to_inertial(s, d, dt);
}

// ---------------------------------------------------------------------------
// SABA(2) symplectic (Laskar & Robutel 2001; reference menu option "saba",
// rebound integrator_saba.c — different formulation: this one composes the
// SAME democratic-heliocentric flows as whfast_step above, with the
// Gauss-Legendre two-stage coefficients replacing the single Strang stage).
// For H = H_Kepler + eps (H_int + H_sun) the error is O(eps h^4 + eps^2 h^2)
// instead of leapfrog's O(eps h^2): at solar-system-like eps this buys
// ~(h-independent) two extra digits at the same step.  The B (perturbation)
// flow groups the interaction kick with the sun-drift 'jump' term by an
// inner Strang split — both are O(eps), so the grouping error is O(eps^2
// h^3), below the method's own eps^2 floor.
//   A(c1 h) B(h/2) A(c2 h) B(h/2) A(c1 h),  c1 = 1/2 - sqrt(3)/6, c2 = 1/sqrt(3)
// ---------------------------------------------------------------------------

void saba_A(Sim &s, DH &d, double h) {   // Kepler flow
  for (int i = 1; i < s.n; i++) {
    if (!s.alive[i]) continue;
    kepler_drift(s.G * d.m0, &d.rh[3 * i], &d.vb[3 * i], h);
  }
}

void saba_B(Sim &s, DH &d, double h) {   // perturbation: jump + kick + jump
  dh_sun_drift(s, d, 0.5 * h);
  dh_kick(s, d, h, nullptr);
  dh_sun_drift(s, d, 0.5 * h);
}

void saba_step(Sim &s, double dt) {
  if (s.n < 2) return;
  const double c1 = 0.5 - std::sqrt(3.0) / 6.0;
  const double c2 = 1.0 / std::sqrt(3.0);
  DH d = dh_from_inertial(s);
  saba_A(s, d, c1 * dt);
  saba_B(s, d, 0.5 * dt);
  saba_A(s, d, c2 * dt);
  saba_B(s, d, 0.5 * dt);
  saba_A(s, d, c1 * dt);
  dh_to_inertial(s, d, dt);
}

// ---------------------------------------------------------------------------
// JANUS bit-reversible integrator (Rein & Tamayo 2018; reference menu option
// "janus", rebound integrator_janus.c — different formulation: order-2
// kernel on this file's Sim arrays rather than rebound's order-6
// composition).  Positions and velocities live on a fixed-resolution int64
// lattice; the drift-kick-drift map uses only integer additions of rounded
// increments, so running dt -> -dt retraces the trajectory EXACTLY (to the
// bit) over any number of steps within one nb_integrate call — no secular
// phase-space drift from floating-point roundoff.  Resolution 2^-50
// (~8.9e-16) code units per tick — a POWER OF TWO, so double<->lattice
// conversion is exact for |ticks| < 2^53 and reversibility survives
// nb_integrate call boundaries (|x| up to 2^13 code units before the
// exactness bound; N-body decks are O(1-10) code units).
// ---------------------------------------------------------------------------

constexpr double JANUS_SCALE = 8.881784197001252e-16;  // 2^-50

void janus_steps(Sim &s, double h, int nsteps, int merge_on_collision,
                 int *merges) {
  const int n3 = 3 * s.n;
  std::vector<long long> xi(n3), vi(n3);
  for (int d = 0; d < n3; d++) {
    xi[d] = llround(s.pos[d] / JANUS_SCALE);
    vi[d] = llround(s.vel[d] / JANUS_SCALE);
  }
  std::vector<double> a(n3);
  for (int step = 0; step < nsteps; step++) {
    for (int d = 0; d < n3; d++)          // integer drift h/2
      xi[d] += llround(0.5 * h * (double)vi[d]);
    for (int d = 0; d < n3; d++) s.pos[d] = xi[d] * JANUS_SCALE;
    accel(s, s.pos.data(), s.vel.data(), a.data());
    for (int d = 0; d < n3; d++)          // integer kick h
      vi[d] += llround(h * a[d] / JANUS_SCALE);
    for (int d = 0; d < n3; d++)          // integer drift h/2
      xi[d] += llround(0.5 * h * (double)vi[d]);
    for (int d = 0; d < n3; d++) {
      s.pos[d] = xi[d] * JANUS_SCALE;
      s.vel[d] = vi[d] * JANUS_SCALE;
    }
    if (resolve_collisions(s, merge_on_collision)) {
      (*merges)++;                        // lattice state rebuilt post-merge
      for (int d = 0; d < n3; d++) {
        xi[d] = llround(s.pos[d] / JANUS_SCALE);
        vi[d] = llround(s.vel[d] / JANUS_SCALE);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// MERCURIUS hybrid (Rein et al. 2019; reference menu option "mercurius",
// rebound integrator_mercurius.c): WHFast everywhere, with the interaction
// Hamiltonian split by the changeover K(r/rcrit) — the symplectic kick gets
// K·F, and planets inside a changeover sphere are integrated directly
// (adaptive Gauss-Radau) through the drift phase under the central Kepler
// field plus the complementary (1-K)·F pair forces.
// ---------------------------------------------------------------------------
void mercurius_step(Sim &s, double dt, double hillfac, double eps) {
  if (s.n < 2) return;
  const int n = s.n;
  DH d = dh_from_inertial(s);

  // changeover radii: hillfac Hill radii from the osculating heliocentric
  // orbit (vis-viva semi-major axis; unbound orbits fall back to |r|)
  std::vector<double> rcrit(n, 0.0);
  for (int i = 1; i < n; i++) {
    if (!s.alive[i] || s.m[i] < 0.0) continue;
    const double *r = &d.rh[3 * i], *v = &d.vb[3 * i];
    const double rr = std::sqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2]);
    const double v2 = v[0] * v[0] + v[1] * v[1] + v[2] * v[2];
    const double mu = s.G * d.m0;
    const double ainv = 2.0 / (rr + 1e-300) - v2 / mu;
    const double a = (ainv > 1e-300) ? 1.0 / ainv : rr;
    rcrit[i] = hillfac * a * std::cbrt(std::max(s.m[i], 1e-300) / (3.0 * d.m0));
  }

  dh_sun_drift(s, d, 0.5 * dt);
  dh_kick(s, d, 0.5 * dt, rcrit.data());

  // encounter detection: pair inside (or predicted to enter) the changeover
  // sphere during this drift
  std::vector<int> enc(n, 0);
  bool any = false;
  for (int i = 1; i < n; i++) {
    if (!s.alive[i]) continue;
    for (int j = i + 1; j < n; j++) {
      if (!s.alive[j]) continue;
      double dr[3], dv[3];
      for (int k = 0; k < 3; k++) {
        dr[k] = d.rh[3 * i + k] - d.rh[3 * j + k];
        dv[k] = d.vb[3 * i + k] - d.vb[3 * j + k];
      }
      const double r = std::sqrt(dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2]);
      const double vrel = std::sqrt(dv[0] * dv[0] + dv[1] * dv[1] + dv[2] * dv[2]);
      if (r - vrel * dt < std::max(rcrit[i], rcrit[j])) {
        enc[i] = enc[j] = 1;
        any = true;
      }
    }
  }

  for (int i = 1; i < n; i++) {
    if (!s.alive[i] || enc[i]) continue;
    kepler_drift(s.G * d.m0, &d.rh[3 * i], &d.vb[3 * i], dt);
  }
  if (any) {
    // direct integration of the encounter subsystem in heliocentric coords:
    // central mu Kepler field + complementary (1-K) pair forces
    Sim sub;
    sub.G = s.G;
    sub.central_mu = s.G * d.m0;
    sub.kweight = 1;
    std::vector<int> idx;
    for (int i = 1; i < n; i++)
      if (s.alive[i] && enc[i]) idx.push_back(i);
    sub.n = (int)idx.size();
    for (int i : idx) {
      sub.m.push_back(s.m[i]);
      sub.rcrit.push_back(rcrit[i]);
      sub.radius.push_back(0.0);
      sub.alive.push_back(1);
      for (int k = 0; k < 3; k++) {
        sub.pos.push_back(d.rh[3 * i + k]);
        sub.vel.push_back(d.vb[3 * i + k]);
      }
    }
    double t = 0.0, dt_next = dt;
    int guard = 0;
    while (t < dt * (1.0 - 1e-14) && guard++ < 100000) {
      t += ias15_step(sub, std::min(dt_next, dt - t), dt - t, eps, &dt_next);
    }
    for (size_t q = 0; q < idx.size(); q++)
      for (int k = 0; k < 3; k++) {
        d.rh[3 * idx[q] + k] = sub.pos[3 * q + k];
        d.vb[3 * idx[q] + k] = sub.vel[3 * q + k];
      }
  }

  dh_kick(s, d, 0.5 * dt, rcrit.data());
  dh_sun_drift(s, d, 0.5 * dt);
  dh_to_inertial(s, d, dt);
}

}  // namespace

extern "C" {

// Integrate the system from t0 to t1.  Arrays are modified in place.
// itype: 0=ias15, 1=leapfrog, 2=none, 3=whfast (Wisdom-Holman symplectic,
// democratic heliocentric), 4=bs (adaptive Gragg-Bulirsch-Stoer),
// 5=mercurius (WHFast + K-switched direct close encounters),
// 6=janus (bit-reversible integer lattice DKD), 7=saba (SABA(2)
// two-stage symplectic over the democratic-heliocentric split).
// dt0: initial/fixed step (<=0: auto).
// Returns the number of collision merges that occurred.
int nb_integrate(int n, double *m, double *pos, double *vel, double *radius,
                 int *alive, double t0, double t1, double dt0, int itype,
                 double G, int pn_order, double c_light, int pn2,
                 int merge_on_collision, double epsilon) {
  if (n <= 0 || itype == 2 || t1 <= t0) return 0;
  Sim s;
  s.n = n;
  s.G = G;
  s.pn_order = pn_order;
  s.c_light = c_light;
  s.pn2 = pn2;
  s.m.assign(m, m + n);
  s.pos.assign(pos, pos + 3 * n);
  s.vel.assign(vel, vel + 3 * n);
  s.radius.assign(radius, radius + n);
  s.alive.assign(alive, alive + n);

  int merges = 0;
  double t = t0;
  const double total = t1 - t0;
  double dt = (dt0 > 0.0) ? std::min(dt0, total) : total;
  if (itype == 0 || itype == 4) {  // adaptive: ias15 / bs
    double dt_next = dt;
    int guard = 0;
    while (t < t1 - 1e-14 * std::fabs(t1) && guard++ < 1000000) {
      const double taken =
          (itype == 4)
              ? bs_step(s, std::min(dt_next, t1 - t), t1 - t, epsilon, &dt_next)
              : ias15_step(s, std::min(dt_next, t1 - t), t1 - t, epsilon,
                           &dt_next);
      t += taken;
      if (resolve_collisions(s, merge_on_collision)) merges++;
    }
  } else {  // leapfrog / whfast / mercurius / janus / saba, fixed dt
    const int nsteps = std::max(1, (int)std::ceil(total / dt));
    const double h = total / nsteps;
    if (itype == 6) {  // janus keeps its integer lattice across steps
      janus_steps(s, h, nsteps, merge_on_collision, &merges);
    } else {
      for (int i = 0; i < nsteps; i++) {
        if (itype == 5)
          mercurius_step(s, h, 3.0, epsilon);  // rebound default hillfac=3
        else if (itype == 3)
          whfast_step(s, h);
        else if (itype == 7)
          saba_step(s, h);
        else
          leapfrog_step(s, h);
        if (resolve_collisions(s, merge_on_collision)) merges++;
      }
    }
  }

  std::memcpy(m, s.m.data(), n * sizeof(double));
  std::memcpy(pos, s.pos.data(), 3 * n * sizeof(double));
  std::memcpy(vel, s.vel.data(), 3 * n * sizeof(double));
  std::memcpy(radius, s.radius.data(), n * sizeof(double));
  std::memcpy(alive, s.alive.data(), n * sizeof(int));
  return merges;
}

// Rotate all positions/velocities about the z axis by angle (rotating-frame
// correction; cf. reb_simulation_irotate use in nbody_advance.cpp:174-178).
void nb_rotate_z(int n, double *pos, double *vel, double angle) {
  const double ca = std::cos(angle), sa = std::sin(angle);
  for (int i = 0; i < n; i++) {
    double x = pos[3 * i], y = pos[3 * i + 1];
    pos[3 * i] = ca * x - sa * y;
    pos[3 * i + 1] = sa * x + ca * y;
    double vx = vel[3 * i], vy = vel[3 * i + 1];
    vel[3 * i] = ca * vx - sa * vy;
    vel[3 * i + 1] = sa * vx + ca * vy;
  }
}

}  // extern "C"
