// mini_ref: a minimal reference-faithful f64 serial PIC evolver.
//
// Purpose (VERDICT r4 item 8): produce GROUND TRUTH for a direct
// comparison against opal_tpu — the reference implementation
// (tgblackburn/opal, Rust) cannot be built in this image (no cargo),
// so this tool independently re-implements the reference's exact
// discrete system for the two_stream case in ~300 lines of plain
// C++ double precision, with the reference's loop order:
//
//   per step (main.rs:238-267):
//     1. electrons.advance: staggered b-spline field gather at the
//        pre-push position (yee.rs:499-529), Vay push incl. the
//        unconditional work integral (electron.rs:268-330), position
//        advance (x with NEW velocity, y/z with OLD), periodic wrap
//     2. grid.clear + charge-conserving flux deposition
//        (yee.rs:551-641, flux form yee.rs:185-204, incl. the
//        reference's j_perp/rho stencil quirks — see
//        opal_tpu/ops/deposit.py parity notes)
//     3. synchronize: single-rank periodic = index wraparound
//     4. field advance B(dt/2), E(dt), B(dt/2) (yee.rs:345-349,
//        839-867); no Silver-Mueller on a periodic box
//
// This is NOT a translation of the Rust (different structure/layout,
// AoS-free flat loops); it is the same discrete equations written
// independently, which is exactly what makes the comparison evidence:
// if opal_tpu (JAX/Pallas, mixed precision, sorted deposition,
// shard_map) matches this serial f64 evolver from identical initial
// conditions, both implement the reference's discrete system.
//
// Input: binary state dump written by tools/ref_compare.py
//   header: int64 magic(0x4f50414c), n, nx, record_every
//           f64 dx, dt, charge, mass
//   arrays: int64 cell[n]; f64 x[n], ux[n], uy[n], uz[n], w[n]
// Output:
//   <out>.csv          step, field_J, kinetic_J, total_J per record
//   <out>_final.bin    f64 Ex..Bz[6*nx] then ux[n], x_global[n]
//
// Build: g++ -O3 -march=native tools/mini_ref.cc -o /tmp/mini_ref
// Run:   /tmp/mini_ref state.bin steps out_prefix

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstdint>
#include <cstring>
#include <vector>
#include <string>

// constants — exact values of the reference (constants.rs:4-28) and
// opal_tpu/constants.py
static const double C0 = 2.997925e8;
static const double C2 = 89875517873681764.0;
static const double EPS0 = 8.854188e-12;
static const double MU0 = 1.256637e-6;
static const double QE = -1.602177e-19;   // electron charge (signed)
static const double ME = 9.109383e-31;
static const double MEV = 0.510999;       // electron mass, MeV

static inline double w2(double xi) {
    // second-order b-spline interpolation weight (yee.rs:140-149)
    double a = fabs(xi);
    if (a > 1.5) return 0.0;
    if (a < 0.5) return 0.75 - a * a;
    return 1.125 - 1.5 * a + 0.5 * a * a;
}

static inline double copysign0(double v, double s) {
    // |v| with the sign of s, signed-zero aware (Rust f64::copysign)
    bool pos = (s == 0.0) ? (1.0 / s > 0.0) : (s > 0.0);
    return pos ? fabs(v) : -fabs(v);
}

static inline double flux(double xi, double xf) {
    // triangle-shape flux through a moving boundary (yee.rs:185-204)
    double ai = fabs(xi), af = fabs(xf);
    if (ai < 1.0) {
        if (af >= 1.0) return copysign0(0.5 * (1.0 - ai) * (1.0 - ai), -xi);
        if (xi * xf >= 0.0)
            return copysign0(
                0.5 * (1.0 - af) * (1.0 - af) - 0.5 * (1.0 - ai) * (1.0 - ai),
                xi - xf);
        return copysign0(ai * (1.0 - 0.5 * ai) + af * (1.0 - 0.5 * af), xi);
    }
    if (af < 1.0) return copysign0(0.5 * (1.0 - af) * (1.0 - af), xf);
    return 0.0;
}

int main(int argc, char **argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: mini_ref state.bin steps out_prefix\n");
        return 2;
    }
    FILE *f = fopen(argv[1], "rb");
    if (!f) { perror("state.bin"); return 2; }
    int64_t hdr[4];
    double par[4];
    if (fread(hdr, 8, 4, f) != 4 || fread(par, 8, 4, f) != 4) return 2;
    if (hdr[0] != 0x4f50414c) { fprintf(stderr, "bad magic\n"); return 2; }
    long n = hdr[1];
    int nx = (int)hdr[2];
    long rec = hdr[3];
    double dx = par[0], dt = par[1], q_sp = par[2], m_sp = par[3];
    long steps = atol(argv[2]);
    std::string out = argv[3];

    std::vector<int64_t> cell64(n);
    std::vector<double> x(n), ux(n), uy(n), uz(n), w(n);
    if (fread(cell64.data(), 8, n, f) != (size_t)n) return 2;
    if (fread(x.data(), 8, n, f) != (size_t)n) return 2;
    if (fread(ux.data(), 8, n, f) != (size_t)n) return 2;
    if (fread(uy.data(), 8, n, f) != (size_t)n) return 2;
    if (fread(uz.data(), 8, n, f) != (size_t)n) return 2;
    if (fread(w.data(), 8, n, f) != (size_t)n) return 2;
    fclose(f);
    std::vector<int> cell(n);
    std::vector<double> gam(n), work(n, 0.0);
    for (long i = 0; i < n; i++) {
        cell[i] = (int)cell64[i];
        gam[i] = sqrt(1.0 + ux[i] * ux[i] + uy[i] * uy[i] + uz[i] * uz[i]);
    }

    // fields, cell-indexed [0, nx), periodic wraparound
    std::vector<double> Ex(nx, 0.0), Ey(nx, 0.0), Ez(nx, 0.0);
    std::vector<double> Bx(nx, 0.0), By(nx, 0.0), Bz(nx, 0.0);
    std::vector<double> Jx(nx), Jy(nx), Jz(nx), Rho(nx);

    auto wrap = [nx](int i) { int r = i % nx; return r < 0 ? r + nx : r; };
    double alpha = q_sp * dt / (2.0 * m_sp * C0);

    std::string csvp = out + ".csv";
    FILE *csv = fopen(csvp.c_str(), "w");
    fprintf(csv, "step,field_J,kinetic_J,total_J\n");

    auto record = [&](long step) {
        double e2 = 0.0, b2 = 0.0, ke = 0.0;
        for (int i = 0; i < nx; i++) {
            e2 += Ex[i] * Ex[i] + Ey[i] * Ey[i] + Ez[i] * Ez[i];
            b2 += Bx[i] * Bx[i] + By[i] * By[i] + Bz[i] * Bz[i];
        }
        double fe = 0.5 * (EPS0 * e2 + b2 / MU0) * dx;
        double to_j = 1.0e6 * MEV * (-QE);
        for (long i = 0; i < n; i++) {
            double u2 = ux[i] * ux[i] + uy[i] * uy[i] + uz[i] * uz[i];
            ke += w[i] * u2 / (gam[i] + 1.0) * to_j;  // cancellation-free
        }
        fprintf(csv, "%ld,%.17g,%.17g,%.17g\n", step, fe, ke, fe + ke);
    };

    for (long step = 0; step < steps; step++) {
        if (rec > 0 && step % rec == 0) record(step);
        // ---- 1. particle advance (mod.rs:263-283) -------------------
        // deposition happens inside the same particle loop (the values
        // depend only on this particle's old/new state — same ordering
        // semantics as depositing after, since J is cleared first and
        // the field advance reads it only in phase 4)
        std::fill(Jx.begin(), Jx.end(), 0.0);
        std::fill(Jy.begin(), Jy.end(), 0.0);
        std::fill(Jz.begin(), Jz.end(), 0.0);
        std::fill(Rho.begin(), Rho.end(), 0.0);
        for (long i = 0; i < n; i++) {
            int g = cell[i];
            double xi = x[i];
            int gm1 = wrap(g - 1), gp1 = wrap(g + 1), gp2 = wrap(g + 2);
            // centred quantities (Ex, By, Bz): cells g-1, g, g+1
            double wcm = w2(0.5 + xi), wc0 = w2(0.5 - xi), wcp = w2(1.5 - xi);
            // edge quantities (Ey, Ez): cells g-1 .. g+2
            double wem = w2(1.0 + xi), we0 = w2(xi), wep = w2(1.0 - xi),
                   wep2 = w2(2.0 - xi);
            double Epx = wcm * Ex[gm1] + wc0 * Ex[g] + wcp * Ex[gp1];
            double Epy = wem * Ey[gm1] + we0 * Ey[g] + wep * Ey[gp1]
                       + wep2 * Ey[gp2];
            double Epz = wem * Ez[gm1] + we0 * Ez[g] + wep * Ez[gp1]
                       + wep2 * Ez[gp2];
            double Bpx = Bx[g];  // piecewise-constant
            double Bpy = wcm * By[gm1] + wc0 * By[g] + wcp * By[gp1];
            double Bpz = wcm * Bz[gm1] + wc0 * Bz[g] + wcp * Bz[gp1];

            // ---- Vay push (electron.rs:268-330), same algebra as
            // opal_tpu/ops/pusher.py::vay_push ------------------------
            double ig = 1.0 / gam[i];
            double vx = C0 * ux[i] * ig, vy = C0 * uy[i] * ig,
                   vz = C0 * uz[i] * ig;
            double uhx = ux[i] + alpha * (Epx + (vy * Bpz - vz * Bpy));
            double uhy = uy[i] + alpha * (Epy + (vz * Bpx - vx * Bpz));
            double uhz = uz[i] + alpha * (Epz + (vx * Bpy - vy * Bpx));
            double gh = sqrt(1.0 + uhx * uhx + uhy * uhy + uhz * uhz);
            work[i] += q_sp * C0 * (uhx * Epx + uhy * Epy + uhz * Epz)
                       * dt / gh;
            double upx = uhx + alpha * Epx;
            double upy = uhy + alpha * Epy;
            double upz = uhz + alpha * Epz;
            double tvx = alpha * C0 * Bpx, tvy = alpha * C0 * Bpy,
                   tvz = alpha * C0 * Bpz;
            double gp2v = 1.0 + upx * upx + upy * upy + upz * upz;
            double t2 = tvx * tvx + tvy * tvy + tvz * tvz;
            double ustar = upx * tvx + upy * tvy + upz * tvz;
            double sig = gp2v - t2;
            double gn = sqrt(0.5 * sig
                             + sqrt(0.25 * sig * sig + t2 + ustar * ustar));
            double tx = tvx / gn, ty = tvy / gn, tz = tvz / gn;
            double s = 1.0 / (1.0 + tx * tx + ty * ty + tz * tz);
            double udt = upx * tx + upy * ty + upz * tz;
            double nux = s * (upx + udt * tx + (upy * tz - upz * ty));
            double nuy = s * (upy + udt * ty + (upz * tx - upx * tz));
            double nuz = s * (upz + udt * tz + (upx * ty - upy * tx));
            double ng = sqrt(1.0 + nux * nux + nuy * nuy + nuz * nuz);

            // position: x with NEW velocity, cell fixup; (y/z advance
            // with OLD velocity — positions not tracked here: the 1d3v
            // dynamics and every recorded observable ignore y/z)
            double xn = x[i] + C0 * nux * dt / (dx * ng);
            double fl = floor(xn);
            int shift = (int)fl;
            xn -= fl;
            double prev = x[i] - fl;     // old frac rel. to NEW cell
            int gnew = wrap(g + shift);

            // ---- deposition (yee.rs:551-641) ------------------------
            // value scaling exactly as opal_tpu/ops/deposit.py::
            // _particle_values: jx = q flux / dt (no dx), j_perp =
            // q v w / dx, rho = q w / dx
            double q = w[i] * q_sp;
            for (int off = -2; off <= 2; off++) {
                double b = off + 0.5;
                Jx[wrap(gnew + off)] += q * flux(b - prev, b - xn) / dt;
            }
            double vyn = C0 * nuy / ng, vzn = C0 * nuz / ng;
            double wm = w2(1.0 + xn), w0 = w2(xn), wp = w2(1.0 - xn),
                   wq = w2(2.0 - xn);
            Jy[wrap(gnew - 1)] += q * vyn * wm / dx;
            Jy[gnew] += q * vyn * w0 / dx;
            Jy[wrap(gnew + 1)] += q * vyn * wp / dx;
            Jz[wrap(gnew - 1)] += q * vzn * wm / dx;
            Jz[gnew] += q * vzn * w0 / dx;
            Jz[wrap(gnew + 1)] += q * vzn * wp / dx;
            // rho (incl. the reference's index-2 quirk) — diagnostic
            Rho[wrap(gnew - 1)] += q * wm / dx;
            Rho[gnew] += q * w0 / dx;
            Rho[wrap(gnew + 1)] += q * wp / dx;
            Rho[wrap(gnew - 2)] += q * wq / dx;

            cell[i] = gnew;
            x[i] = xn;
            ux[i] = nux; uy[i] = nuy; uz[i] = nuz;
            gam[i] = ng;
        }
        // ---- 4. field advance: B half, E full, B half ---------------
        auto adv_b = [&](double hdt) {
            double b0y = By[0], b0z = Bz[0];  // unused; wrap reads new? no:
            (void)b0y; (void)b0z;
            // By[i] += hdt * (Ez[i+1] - Ez[i]) / dx  for all i (periodic)
            double ez0 = Ez[0], ey0 = Ey[0];
            for (int i = 0; i < nx; i++) {
                double ezp = (i + 1 < nx) ? Ez[i + 1] : ez0;
                double eyp = (i + 1 < nx) ? Ey[i + 1] : ey0;
                By[i] += hdt * (ezp - Ez[i]) / dx;
                Bz[i] -= hdt * (eyp - Ey[i]) / dx;
            }
        };
        adv_b(0.5 * dt);
        {
            double bylast = By[nx - 1], bzlast = Bz[nx - 1];
            double prev_by, prev_bz;
            // E[i] uses B[i-1] (pre-update values are fine: B is not
            // modified in this pass)
            for (int i = nx - 1; i >= 0; i--) {
                prev_by = (i == 0) ? bylast : By[i - 1];
                prev_bz = (i == 0) ? bzlast : Bz[i - 1];
                Ex[i] += -dt * Jx[i] / EPS0;
                Ey[i] += dt * C2 * (prev_bz - Bz[i]) / dx - dt * Jy[i] / EPS0;
                Ez[i] += dt * C2 * (By[i] - prev_by) / dx - dt * Jz[i] / EPS0;
            }
        }
        adv_b(0.5 * dt);
    }
    record(steps);
    fclose(csv);

    std::string finp = out + "_final.bin";
    FILE *fo = fopen(finp.c_str(), "wb");
    fwrite(Ex.data(), 8, nx, fo);
    fwrite(Ey.data(), 8, nx, fo);
    fwrite(Ez.data(), 8, nx, fo);
    fwrite(Bx.data(), 8, nx, fo);
    fwrite(By.data(), 8, nx, fo);
    fwrite(Bz.data(), 8, nx, fo);
    fwrite(ux.data(), 8, n, fo);
    std::vector<double> xg(n);
    for (long i = 0; i < n; i++) xg[i] = (cell[i] + x[i]) * dx;
    fwrite(xg.data(), 8, n, fo);
    fclose(fo);
    double wsum = 0.0;
    for (long i = 0; i < n; i++) wsum += work[i] * w[i];
    fprintf(stderr, "mini_ref done: %ld steps, n=%ld, work=%.6g J\n",
            steps, n, wsum);
    return 0;
}
