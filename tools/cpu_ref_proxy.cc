// CPU reference-proxy microbenchmark for bench.py's vs_baseline.
//
// The reference implementation (tgblackburn/opal, Rust + rayon) publishes
// no performance numbers and cargo is not available in this image, so
// bench.py's vs_baseline was an ESTIMATE (64 cores x 5e6 pushes/s/core).
// This file replaces the per-core half of that estimate with a measured
// number: an optimized native implementation of the same per-particle
// work the reference's hot loop does each step (particle/mod.rs:263-283
// semantics — field gather, Vay push, relativistic position advance,
// charge-conserving current deposition), on THIS machine's CPU.
//
// This is not a translation of the reference (different language, layout
// and loop structure); it is the same physics our JAX path implements
// (opal_tpu/ops/pusher.py, interp.py, deposit.py), written the way a
// performance-minded native PIC code would write it: SoA arrays, flat
// loops, OpenMP threading with per-thread deposition buffers.
//
// Build + run (see tools/README or BASELINE.md):
//   g++ -O3 -march=native -funroll-loops -fopenmp tools/cpu_ref_proxy.cc \
//       -o /tmp/cpu_ref_proxy && /tmp/cpu_ref_proxy [n_particles] [steps]
//
// Prints pushes/s total and per core.

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <chrono>
#ifdef _OPENMP
#include <omp.h>
#endif

static const double C = 299792458.0;
static const double Q_E = 1.602176634e-19;
static const double EMASS = 9.1093837015e-31;

struct Grid {
    int nx;
    double dx;
    std::vector<double> ex, ey, ez, bx, by, bz;  // cell-centered, halo 2
    std::vector<double> jx, jy, jz;
};

int main(int argc, char **argv) {
    long n = argc > 1 ? atol(argv[1]) : 2L << 20;
    int steps = argc > 2 ? atoi(argv[2]) : 40;
    int nx = 4096;
    double dx = 500.0;
    double dt = 0.95 * dx / C;

    Grid g;
    g.nx = nx;
    g.dx = dx;
    int nh = nx + 4;
    g.ex.assign(nh, 0.0); g.ey.assign(nh, 0.0); g.ez.assign(nh, 0.0);
    g.bx.assign(nh, 0.0); g.by.assign(nh, 0.0); g.bz.assign(nh, 0.0);
    g.jx.assign(nh, 0.0); g.jy.assign(nh, 0.0); g.jz.assign(nh, 0.0);
    for (int i = 0; i < nh; i++) {          // non-trivial field content
        g.ey[i] = 1.0e3 * sin(2 * M_PI * i / 64.0);
        g.bz[i] = 3.0e-6 * cos(2 * M_PI * i / 64.0);
    }

    // SoA particle state (same columns as the hot path)
    std::vector<int> cell(n);
    std::vector<double> x(n), ux(n), uy(n), uz(n), gam(n), w(n),
        work(n, 0.0), tau(n, 40.0), chi(n, 0.0);
    unsigned long long s = 12345;
    auto rnd = [&]() {  // xorshift, uniform in [0,1)
        s ^= s << 13; s ^= s >> 7; s ^= s << 17;
        return (double)(s >> 11) / 9007199254740992.0;
    };
    double drift = 2.5e-24 / (EMASS * C);
    for (long i = 0; i < n; i++) {
        cell[i] = (int)(rnd() * nx);
        x[i] = rnd() - 0.5;
        ux[i] = drift * (rnd() < 0.5 ? -1.0 : 1.0) * (1.0 + 0.001 * rnd());
        uy[i] = 0.0; uz[i] = 0.0;
        gam[i] = sqrt(1.0 + ux[i] * ux[i]);
        w[i] = 1.0e10;
    }

    int nthreads = 1;
#ifdef _OPENMP
    nthreads = omp_get_max_threads();
#endif
    // per-thread deposition buffers, reduced after the particle loop
    std::vector<std::vector<double>> jxt(nthreads), jyt(nthreads), jzt(nthreads);
    for (int t = 0; t < nthreads; t++) {
        jxt[t].assign(nh, 0.0); jyt[t].assign(nh, 0.0); jzt[t].assign(nh, 0.0);
    }

    double qm = -Q_E / EMASS;
    auto t0 = std::chrono::steady_clock::now();
    for (int step = 0; step < steps; step++) {
#pragma omp parallel
        {
            int tid = 0;
#ifdef _OPENMP
            tid = omp_get_thread_num();
#endif
            double *JX = jxt[tid].data(), *JY = jyt[tid].data(),
                   *JZ = jzt[tid].data();
#pragma omp for schedule(static)
            for (long i = 0; i < n; i++) {
                int c = cell[i] + 2;
                double f = x[i];
                // quadratic-spline field gather over 3 cells (the
                // reference's interpolation order)
                double wl = 0.5 * (0.5 - f) * (0.5 - f);
                double wc = 0.75 - f * f;
                double wr = 0.5 * (0.5 + f) * (0.5 + f);
                double Ex = wl * g.ex[c - 1] + wc * g.ex[c] + wr * g.ex[c + 1];
                double Ey = wl * g.ey[c - 1] + wc * g.ey[c] + wr * g.ey[c + 1];
                double Ez = wl * g.ez[c - 1] + wc * g.ez[c] + wr * g.ez[c + 1];
                double Bx = wl * g.bx[c - 1] + wc * g.bx[c] + wr * g.bx[c + 1];
                double By = wl * g.by[c - 1] + wc * g.by[c] + wr * g.by[c + 1];
                double Bz = wl * g.bz[c - 1] + wc * g.bz[c] + wr * g.bz[c + 1];

                // Vay (2008) push, same algebra as ops/pusher.py
                double hq = 0.5 * qm * dt;
                double uxh = ux[i] + hq * (Ex + (uy[i] * Bz - uz[i] * By) * C / gam[i]);
                double uyh = uy[i] + hq * (Ey + (uz[i] * Bx - ux[i] * Bz) * C / gam[i]);
                double uzh = uz[i] + hq * (Ez + (ux[i] * By - uy[i] * Bx) * C / gam[i]);
                // the reference's vay_push unconditionally accumulates
                // work, evaluates the quantum parameter chi, and
                // decrements the emission optical depth every step,
                // QED on or off (electron.rs:278-287) — include that
                // work so the proxy is not unfairly light
                double gh = sqrt(1.0 + uxh * uxh + uyh * uyh + uzh * uzh);
                work[i] += -Q_E * C * (uxh * Ex + uyh * Ey + uzh * Ez) * dt / gh;
                double fx = gh * Ex + C * (uyh * Bz - uzh * By);
                double fy = gh * Ey + C * (uzh * Bx - uxh * Bz);
                double fz = gh * Ez + C * (uxh * By - uyh * Bx);
                double ue = uxh * Ex + uyh * Ey + uzh * Ez;
                double ch = sqrt(fabs(fx * fx + fy * fy + fz * fz - ue * ue))
                    / 1.32328547e18;  // Schwinger field V/m
                chi[i] = ch;
                // small-chi branch of rate(chi, gamma): h(chi) linearized
                double h = 5.235987755982988 * (1.0 - 8.0 * ch / 8.660254037844386);
                tau[i] -= 0.0072973525693 * 1.7320508075688772 * ch * h
                    / (6.283185307179586 * gh * 1.28808867e-21) * dt;

                double upx = uxh + hq * Ex;
                double upy = uyh + hq * Ey;
                double upz = uzh + hq * Ez;
                double tx = hq * Bx * C, ty = hq * By * C, tz = hq * Bz * C;
                double gp2 = 1.0 + upx * upx + upy * upy + upz * upz;
                double t2 = tx * tx + ty * ty + tz * tz;
                double sig = gp2 - t2;
                double ustar = upx * tx + upy * ty + upz * tz;
                double g2 = 0.5 * (sig + sqrt(sig * sig + 4.0 * (t2 + ustar * ustar)));
                double gi = 1.0 / sqrt(g2);
                double s2 = 1.0 / (1.0 + (t2 * gi * gi));
                double udt = (upx * tx + upy * ty + upz * tz) * gi * gi;
                double nux = s2 * (upx + udt * tx * gi + (upy * tz - upz * ty) * gi);
                double nuy = s2 * (upy + udt * ty * gi + (upz * tx - upx * tz) * gi);
                double nuz = s2 * (upz + udt * tz * gi + (upx * ty - upy * tx) * gi);
                double ng = sqrt(1.0 + nux * nux + nuy * nuy + nuz * nuz);

                // position advance + periodic wrap
                double prev = f;
                double vx = C * nux / ng;
                double fn = f + vx * dt / dx;
                int dc = (int)floor(fn + 0.5);
                int nc = cell[i] + dc;
                fn -= dc;
                if (nc >= nx) nc -= nx;
                if (nc < 0) nc += nx;

                // charge-conserving flux deposition (jx from the cell
                // crossing; jy/jz spline-weighted), reference yee.rs
                // flux form semantics
                double q = w[i] * -Q_E;
                double flux = q * (fn + dc - prev) * dx / dt;
                JX[c] += flux;          // net flux through face
                double wy = q * C * nuy / ng;
                double wz = q * C * nuz / ng;
                double wl2 = 0.5 * (0.5 - fn) * (0.5 - fn);
                double wc2 = 0.75 - fn * fn;
                double wr2 = 0.5 * (0.5 + fn) * (0.5 + fn);
                JY[c - 1] += wl2 * wy; JY[c] += wc2 * wy; JY[c + 1] += wr2 * wy;
                JZ[c - 1] += wl2 * wz; JZ[c] += wc2 * wz; JZ[c + 1] += wr2 * wz;

                cell[i] = nc;
                x[i] = fn;
                ux[i] = nux; uy[i] = nuy; uz[i] = nuz;
                gam[i] = ng;
            }
        }
        // reduce per-thread J into the grid (part of the real step)
        for (int t = 0; t < nthreads; t++) {
            double *JX = jxt[t].data(), *JY = jyt[t].data(), *JZ = jzt[t].data();
            for (int i = 0; i < nh; i++) {
                g.jx[i] += JX[i]; g.jy[i] += JY[i]; g.jz[i] += JZ[i];
                JX[i] = 0.0; JY[i] = 0.0; JZ[i] = 0.0;
            }
        }
    }
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    double pushes = (double)n * steps;
    // keep the state observable so the loop cannot be elided
    double chk = 0.0;
    for (long i = 0; i < n; i += n / 17 + 1) chk += x[i] + gam[i];
    printf("{\"n\": %ld, \"steps\": %d, \"threads\": %d, \"secs\": %.3f, "
           "\"pushes_per_sec\": %.4g, \"pushes_per_sec_per_core\": %.4g, "
           "\"chk\": %.6g}\n",
           n, steps, nthreads, secs, pushes / secs,
           pushes / secs / nthreads, chk);
    return 0;
}
