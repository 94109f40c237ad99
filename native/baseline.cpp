// Sequential CPU baseline for the iLQR backward pass, written as plain C++ loops
// over small dense matrices (the role OpenBLAS/Armadillo plays for the reference's
// ilqr/src/util.cpp:83-182).  Compiled with -O3 -march=native and driven via ctypes
// by bench.py, this provides the measured single-thread CPU denominator for the
// "timesteps/sec vs baseline" benchmark (the reference itself publishes no numbers —
// BASELINE.md).  This is an original implementation of the textbook recursion, not a
// copy of the reference kernel.
//
// Build: g++ -O3 -march=native -shared -fPIC -o baseline.so baseline.cpp

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <chrono>

namespace {

// y = M x  (r x c)
inline void matvec(const double* M, const double* x, double* y, int r, int c) {
    for (int i = 0; i < r; ++i) {
        double s = 0.0;
        for (int j = 0; j < c; ++j) s += M[i * c + j] * x[j];
        y[i] = s;
    }
}

// C = A^T B  (A: k x r, B: k x c -> C: r x c)
inline void matTmat(const double* A, const double* B, double* C, int k, int r, int c) {
    for (int i = 0; i < r; ++i)
        for (int j = 0; j < c; ++j) {
            double s = 0.0;
            for (int t = 0; t < k; ++t) s += A[t * r + i] * B[t * c + j];
            C[i * c + j] = s;
        }
}

// C = A B  (A: r x k, B: k x c)
inline void matmat(const double* A, const double* B, double* C, int r, int k, int c) {
    for (int i = 0; i < r; ++i)
        for (int j = 0; j < c; ++j) {
            double s = 0.0;
            for (int t = 0; t < k; ++t) s += A[i * k + t] * B[t * c + j];
            C[i * c + j] = s;
        }
}

// in-place Cholesky solve for small SPD systems: solves M X = B (M: n x n, B: n x m)
// returns false if not positive definite
bool chol_solve(double* M, double* B, int n, int m) {
    // factorize M = L L^T in place (lower)
    for (int i = 0; i < n; ++i) {
        for (int j = 0; j <= i; ++j) {
            double s = M[i * n + j];
            for (int k = 0; k < j; ++k) s -= M[i * n + k] * M[j * n + k];
            if (i == j) {
                if (s <= 0.0) return false;
                M[i * n + i] = std::sqrt(s);
            } else {
                M[i * n + j] = s / M[j * n + j];
            }
        }
    }
    // forward/back substitution per column of B
    for (int col = 0; col < m; ++col) {
        for (int i = 0; i < n; ++i) {
            double s = B[i * m + col];
            for (int k = 0; k < i; ++k) s -= M[i * n + k] * B[k * m + col];
            B[i * m + col] = s / M[i * n + i];
        }
        for (int i = n - 1; i >= 0; --i) {
            double s = B[i * m + col];
            for (int k = i + 1; k < n; ++k) s -= M[k * n + i] * B[k * m + col];
            B[i * m + col] = s / M[i * n + i];
        }
    }
    return true;
}


// ---- additional small-dense helpers for the GPS / RGPS / BSP chains ----

// in-place lower-Cholesky factorization; false if not PD
bool chol_fact(double* M, int n) {
    for (int i = 0; i < n; ++i) {
        for (int j = 0; j <= i; ++j) {
            double s = M[i * n + j];
            for (int k = 0; k < j; ++k) s -= M[i * n + k] * M[j * n + k];
            if (i == j) {
                if (s <= 0.0) return false;
                M[i * n + i] = std::sqrt(s);
            } else {
                M[i * n + j] = s / M[j * n + j];
            }
        }
    }
    return true;
}

// solve (L L^T) X = B with a pre-factored lower L; B is (n x m), in place
void chol_solve_fact(const double* L, double* B, int n, int m) {
    for (int col = 0; col < m; ++col) {
        for (int i = 0; i < n; ++i) {
            double s = B[i * m + col];
            for (int k = 0; k < i; ++k) s -= L[i * n + k] * B[k * m + col];
            B[i * m + col] = s / L[i * n + i];
        }
        for (int i = n - 1; i >= 0; --i) {
            double s = B[i * m + col];
            for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * B[k * m + col];
            B[i * m + col] = s / L[i * n + i];
        }
    }
}

double logdet_from_fact(const double* L, int n) {
    double s = 0.0;
    for (int i = 0; i < n; ++i) s += std::log(L[i * n + i]);
    return 2.0 * s;
}

// SPD inverse via Cholesky of a scratch copy; false if not PD
bool spd_inverse(const double* M, double* Minv, double* scratch, int n) {
    std::memcpy(scratch, M, sizeof(double) * n * n);
    if (!chol_fact(scratch, n)) return false;
    for (int i = 0; i < n * n; ++i) Minv[i] = 0.0;
    for (int i = 0; i < n; ++i) Minv[i * n + i] = 1.0;
    chol_solve_fact(scratch, Minv, n, n);
    return true;
}

inline void symmetrize_ip(double* M, int n) {
    for (int i = 0; i < n; ++i)
        for (int j = 0; j < i; ++j) {
            double s = 0.5 * (M[i * n + j] + M[j * n + i]);
            M[i * n + j] = s;
            M[j * n + i] = s;
        }
}

// C = A B^T (A: r x k, B: c x k)
inline void matmatT(const double* A, const double* B, double* C, int r, int k, int c) {
    for (int i = 0; i < r; ++i)
        for (int j = 0; j < c; ++j) {
            double s = 0.0;
            for (int t = 0; t < k; ++t) s += A[i * k + t] * B[j * k + t];
            C[i * c + j] = s;
        }
}

constexpr double LOG_2PI = 1.8378770664093453;

}  // namespace


extern "C" {

// One regularized iLQR backward pass over horizon T with dims (dx, du).
// Inputs are time-stacked row-major arrays; outputs gains K (T,du,dx), kff (T,du).
// Returns 0 on success, t+1 of the first SPD failure otherwise.
int ilqr_backward_cpu(
    const double* Cxx,  // (T+1, dx, dx)
    const double* cx,   // (T+1, dx)
    const double* Cuu,  // (T+1, du, du)
    const double* cu,   // (T+1, du)
    const double* Cxu,  // (T+1, dx, du)
    const double* A,    // (T, dx, dx)
    const double* B,    // (T, dx, du)
    double lmbda, int T, int dx, int du,
    double* K, double* kff) {

    const int xx = dx * dx, uu = du * du, xu = dx * du;
    double* V = new double[xx];
    double* v = new double[dx];
    double* tmp_xx = new double[xx];
    double* tmp_xu = new double[xu];
    double* Qxx = new double[xx];
    double* Quu = new double[uu];
    double* Qux = new double[du * dx];
    double* qx = new double[dx];
    double* qu = new double[du];
    double* rhs = new double[du * (dx + 1)];

    std::memcpy(V, Cxx + T * xx, sizeof(double) * xx);
    std::memcpy(v, cx + T * dx, sizeof(double) * dx);

    int fail = 0;
    for (int t = T - 1; t >= 0; --t) {
        const double* At = A + t * xx;
        const double* Bt = B + t * xu;

        // Qxx = Cxx + A^T V A ; Qux = (Cxu + A^T V B)^T ; Quu = Cuu + B^T V B + λI
        matmat(V, At, tmp_xx, dx, dx, dx);             // V A
        matTmat(At, tmp_xx, Qxx, dx, dx, dx);          // A^T (V A)
        for (int i = 0; i < xx; ++i) Qxx[i] += Cxx[t * xx + i];

        matmat(V, Bt, tmp_xu, dx, dx, du);             // V B
        matTmat(Bt, tmp_xu, Quu, dx, du, du);          // B^T (V B)
        for (int i = 0; i < uu; ++i) Quu[i] += Cuu[t * uu + i];
        for (int i = 0; i < du; ++i) Quu[i * du + i] += lmbda;

        // Qux = Cxu^T + B^T V A
        matTmat(Bt, tmp_xx, Qux, dx, du, dx);          // B^T (V A)
        for (int i = 0; i < dx; ++i)
            for (int j = 0; j < du; ++j) Qux[j * dx + i] += Cxu[t * xu + i * du + j];

        // qx = cx + A^T v ; qu = cu + B^T v
        for (int i = 0; i < dx; ++i) {
            double s = cx[t * dx + i];
            for (int k = 0; k < dx; ++k) s += At[k * dx + i] * v[k];
            qx[i] = s;
        }
        for (int i = 0; i < du; ++i) {
            double s = cu[t * du + i];
            for (int k = 0; k < dx; ++k) s += Bt[k * du + i] * v[k];
            qu[i] = s;
        }

        // solve Quu [K kff] = -[Qux qu]
        for (int i = 0; i < du; ++i) {
            for (int j = 0; j < dx; ++j) rhs[i * (dx + 1) + j] = -Qux[i * dx + j];
            rhs[i * (dx + 1) + dx] = -qu[i];
        }
        if (!chol_solve(Quu, rhs, du, dx + 1)) { fail = t + 1; break; }
        // note: Quu was overwritten by its factor; recompute for the V update
        matTmat(Bt, tmp_xu, Quu, dx, du, du);
        for (int i = 0; i < uu; ++i) Quu[i] += Cuu[t * uu + i];

        double* Kt = K + t * du * dx;
        double* kfft = kff + t * du;
        for (int i = 0; i < du; ++i) {
            for (int j = 0; j < dx; ++j) Kt[i * dx + j] = rhs[i * (dx + 1) + j];
            kfft[i] = rhs[i * (dx + 1) + dx];
        }

        // v' = qx + K^T Quu kff + K^T qu + Qux^T kff
        // V' = Qxx + K^T Quu K + K^T Qux + Qux^T K  (symmetrized)
        double* Qk = new double[du];
        matvec(Quu, kfft, Qk, du, du);
        for (int i = 0; i < dx; ++i) {
            double s = qx[i];
            for (int k = 0; k < du; ++k)
                s += Kt[k * dx + i] * (Qk[k] + qu[k]) + Qux[k * dx + i] * kfft[k];
            v[i] = s;
        }
        double* QK = new double[du * dx];
        matmat(Quu, Kt, QK, du, du, dx);
        for (int i = 0; i < dx; ++i)
            for (int j = 0; j < dx; ++j) {
                double s = Qxx[i * dx + j];
                for (int k = 0; k < du; ++k)
                    s += Kt[k * dx + i] * QK[k * dx + j]
                       + Kt[k * dx + i] * Qux[k * dx + j]
                       + Qux[k * dx + i] * Kt[k * dx + j];
                tmp_xx[i * dx + j] = s;
            }
        for (int i = 0; i < dx; ++i)
            for (int j = 0; j < dx; ++j)
                V[i * dx + j] = 0.5 * (tmp_xx[i * dx + j] + tmp_xx[j * dx + i]);
        delete[] Qk;
        delete[] QK;
    }

    delete[] V; delete[] v; delete[] tmp_xx; delete[] tmp_xu;
    delete[] Qxx; delete[] Quu; delete[] Qux; delete[] qx; delete[] qu; delete[] rhs;
    return fail;
}

// Timed batch of backward passes over the same problem data; returns seconds.
double ilqr_backward_bench(
    const double* Cxx, const double* cx, const double* Cuu, const double* cu,
    const double* Cxu, const double* A, const double* B,
    double lmbda, int T, int dx, int du, int reps,
    double* K, double* kff) {
    auto start = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; ++r) {
        ilqr_backward_cpu(Cxx, cx, Cuu, cu, Cxu, A, B, lmbda, T, dx, du, K, kff);
    }
    auto end = std::chrono::steady_clock::now();
    return std::chrono::duration<double>(end - start).count();
}


// --------------------------------------------------------------------------------
// GPS dual-evaluation chain: augment -> soft-KL backward -> Gaussian forward ->
// KL + expectation (the reference's per-dual-eval kernel sequence,
// gps/src/util.cpp:83-374).  Absolute-coordinate convention; all stacks
// time-leading row-major.  Returns 0 on success, t+1 of the first definiteness
// failure.  out[0] = dual expectation at t=0, out[1] = sum_t KL(new || old).
int gps_dual_chain_cpu(
    const double* Cxx, const double* cx, const double* Cuu, const double* cu,
    const double* Cxu, const double* c0,                       // (T+1, ...)
    const double* A, const double* B, const double* cvec,
    const double* Sdyn,                                        // (T, ...)
    const double* K, const double* kff, const double* Sctl,    // old policy (T, ...)
    const double* alpha,                                       // (T,)
    const double* mu0, const double* sigma0,
    int T, int dx, int du, double* out) {

    const int xx = dx * dx, uu = du * du, xu = dx * du;
    // workspaces
    double* agCxx = new double[T * xx]; double* agcx = new double[T * dx];
    double* agCuu = new double[T * uu]; double* agcu = new double[T * du];
    double* agCxu = new double[T * xu]; double* agc0 = new double[T];
    double* lam = new double[uu]; double* scr = new double[uu];
    double* tmp_xu = new double[xu];
    double* tmp_du = new double[du];
    int fail = 0;

    // ---- augment_cost (gps/src/util.cpp:136-193) ----
    for (int t = 0; t < T && !fail; ++t) {
        const double* Kt = K + t * xu;    // (du, dx)
        const double* kt = kff + t * du;
        const double* St = Sctl + t * uu;
        double a = alpha[t];

        std::memcpy(scr, St, sizeof(double) * uu);
        if (!chol_fact(scr, du)) { fail = t + 1; break; }
        double logdet_S = logdet_from_fact(scr, du);
        for (int i = 0; i < uu; ++i) lam[i] = 0.0;
        for (int i = 0; i < du; ++i) lam[i * du + i] = 1.0;
        chol_solve_fact(scr, lam, du, du);                     // lam = Sctl^-1

        // lam K (du, dx)
        double* lamK = tmp_xu;
        matmat(lam, Kt, lamK, du, du, dx);
        // agCxx = Cxx + 0.5 a K^T lam K
        for (int i = 0; i < dx; ++i)
            for (int j = 0; j < dx; ++j) {
                double s = 0.0;
                for (int k = 0; k < du; ++k) s += Kt[k * dx + i] * lamK[k * dx + j];
                agCxx[t * xx + i * dx + j] = Cxx[t * xx + i * dx + j] + 0.5 * a * s;
            }
        // agCuu = Cuu + 0.5 a lam
        for (int i = 0; i < uu; ++i)
            agCuu[t * uu + i] = Cuu[t * uu + i] + 0.5 * a * lam[i];
        // agCxu = Cxu - 0.5 a K^T lam   (Cxu is (dx, du))
        for (int i = 0; i < dx; ++i)
            for (int j = 0; j < du; ++j) {
                double s = 0.0;
                for (int k = 0; k < du; ++k) s += Kt[k * dx + i] * lam[k * du + j];
                agCxu[t * xu + i * du + j] = Cxu[t * xu + i * du + j] - 0.5 * a * s;
            }
        // lam kff
        matvec(lam, kt, tmp_du, du, du);
        // agcx = cx + a K^T lam kff ; agcu = cu - a lam kff
        for (int i = 0; i < dx; ++i) {
            double s = 0.0;
            for (int k = 0; k < du; ++k) s += Kt[k * dx + i] * tmp_du[k];
            agcx[t * dx + i] = cx[t * dx + i] + a * s;
        }
        for (int i = 0; i < du; ++i)
            agcu[t * du + i] = cu[t * du + i] - a * tmp_du[i];
        double klk = 0.0;
        for (int i = 0; i < du; ++i) klk += kt[i] * tmp_du[i];
        agc0[t] = c0[t] + 0.5 * a * (du * LOG_2PI + logdet_S) + 0.5 * a * klk;
    }

    // ---- soft-KL backward (gps/src/util.cpp:272-374) ----
    double* V = new double[xx]; double* v = new double[dx]; double v0;
    double* newK = new double[T * xu]; double* newk = new double[T * du];
    double* newS = new double[T * uu];
    double* Vfull0 = new double[xx]; double* vfull0 = new double[dx]; double v0full0 = 0.0;
    double* VA = new double[xx]; double* VB = new double[xu];
    double* Qxx = new double[xx]; double* Quu = new double[uu];
    double* Qux = new double[du * dx]; double* qx = new double[dx];
    double* qu = new double[du]; double* Vc = new double[dx];

    std::memcpy(V, Cxx + T * xx, sizeof(double) * xx);
    std::memcpy(v, cx + T * dx, sizeof(double) * dx);
    v0 = c0[T];

    for (int t = T - 1; t >= 0 && !fail; --t) {
        const double* At = A + t * xx;
        const double* Bt = B + t * xu;
        const double* ct = cvec + t * dx;
        const double* St = Sdyn + t * xx;
        double a = alpha[t];

        matmat(V, At, VA, dx, dx, dx);
        matmat(V, Bt, VB, dx, dx, du);
        matTmat(At, VA, Qxx, dx, dx, dx);
        matTmat(Bt, VB, Quu, dx, du, du);
        for (int i = 0; i < xx; ++i) Qxx[i] = -(agCxx[t * xx + i] + Qxx[i]) / a;
        for (int i = 0; i < uu; ++i) Quu[i] = -(agCuu[t * uu + i] + Quu[i]) / a;
        // Qux = -(Cxu + A^T V B)^T / a   (du, dx)
        for (int i = 0; i < du; ++i)
            for (int j = 0; j < dx; ++j) {
                double s = agCxu[t * xu + j * du + i];
                for (int k = 0; k < dx; ++k) s += At[k * dx + j] * VB[k * du + i];
                Qux[i * dx + j] = -s / a;
            }
        matvec(V, ct, Vc, dx, dx);
        for (int i = 0; i < du; ++i) {
            double s = agcu[t * du + i];
            for (int k = 0; k < dx; ++k)
                s += Bt[k * du + i] * (2.0 * Vc[k] + v[k]);
            qu[i] = -s / a;
        }
        for (int i = 0; i < dx; ++i) {
            double s = agcx[t * dx + i];
            for (int k = 0; k < dx; ++k)
                s += At[k * dx + i] * (2.0 * Vc[k] + v[k]);
            qx[i] = -s / a;
        }
        double trVS = 0.0, cVc = 0.0, vc = 0.0;
        for (int i = 0; i < dx; ++i) {
            vc += v[i] * ct[i];
            cVc += ct[i] * Vc[i];
            for (int k = 0; k < dx; ++k) trVS += V[i * dx + k] * St[k * dx + i];
        }
        double q0 = -(agc0[t] + v0 + cVc + trVS + vc) / a;

        // factor -Quu (must be PD)
        for (int i = 0; i < uu; ++i) scr[i] = -Quu[i];
        symmetrize_ip(scr, du);
        if (!chol_fact(scr, du)) { fail = t + 1; break; }
        double logdet_m2Quu = du * std::log(2.0) + logdet_from_fact(scr, du);

        double* Kt = newK + t * xu;
        double* kt = newk + t * du;
        double* Snew = newS + t * uu;
        // K = (-Quu)^-1 Qux ; kff = 0.5 (-Quu)^-1 qu ; Sctl = 0.5 (-Quu)^-1
        std::memcpy(Kt, Qux, sizeof(double) * du * dx);
        chol_solve_fact(scr, Kt, du, dx);
        std::memcpy(kt, qu, sizeof(double) * du);
        chol_solve_fact(scr, kt, du, 1);
        for (int i = 0; i < du; ++i) kt[i] *= 0.5;
        for (int i = 0; i < uu; ++i) Snew[i] = 0.0;
        for (int i = 0; i < du; ++i) Snew[i * du + i] = 1.0;
        chol_solve_fact(scr, Snew, du, du);
        for (int i = 0; i < uu; ++i) Snew[i] *= 0.5;
        symmetrize_ip(Snew, du);

        // V' = sym(-a (Qxx + Qux^T K)) ; v' = -a (qx + 2 Qux^T kff)
        for (int i = 0; i < dx; ++i)
            for (int j = 0; j < dx; ++j) {
                double s = Qxx[i * dx + j];
                for (int k = 0; k < du; ++k) s += Qux[k * dx + i] * Kt[k * dx + j];
                VA[i * dx + j] = -a * s;   // reuse VA as scratch for new V
            }
        symmetrize_ip(VA, dx);
        for (int i = 0; i < dx; ++i) {
            double s = qx[i];
            for (int k = 0; k < du; ++k) s += 2.0 * Qux[k * dx + i] * kt[k];
            v[i] = -a * s;
        }
        std::memcpy(V, VA, sizeof(double) * xx);
        double quk = 0.0;
        for (int i = 0; i < du; ++i) quk += qu[i] * kt[i];
        v0 = -a * (0.5 * quk + q0 + 0.5 * (du * LOG_2PI - logdet_m2Quu));
    }
    std::memcpy(Vfull0, V, sizeof(double) * xx);
    std::memcpy(vfull0, v, sizeof(double) * dx);
    v0full0 = v0;

    // ---- Gaussian forward + KL + expectation (util.cpp:195-269, 83-134) ----
    double kl_sum = 0.0;
    double dual = 0.0;
    if (!fail) {
        // dual = mu0^T V0 mu0 + mu0 . v0 + v00 + tr(V0 sigma0)
        double s = v0full0;
        for (int i = 0; i < dx; ++i) {
            s += mu0[i] * vfull0[i];
            for (int j = 0; j < dx; ++j)
                s += mu0[i] * Vfull0[i * dx + j] * mu0[j]
                   + Vfull0[i * dx + j] * sigma0[j * dx + i];
        }
        dual = s;

        double* mu_x = new double[dx]; double* sig_x = new double[xx];
        std::memcpy(mu_x, mu0, sizeof(double) * dx);
        std::memcpy(sig_x, sigma0, sizeof(double) * xx);
        double* mu_u = new double[du]; double* sig_u = new double[uu];
        double* KS = new double[du * dx];
        double* qlam = new double[uu]; double* qscr = new double[uu];
        double* dK = new double[du * dx]; double* dk = new double[du];
        double* AB = new double[dx * (dx + du)];
        int dxu = dx + du;
        double* sig_xu = new double[dxu * dxu];
        double* ABS = new double[dx * dxu];

        for (int t = 0; t < T; ++t) {
            const double* nKt = newK + t * xu;
            const double* nkt = newk + t * du;
            const double* nSt = newS + t * uu;
            // action marginal under NEW policy
            matvec(nKt, mu_x, mu_u, du, dx);
            for (int i = 0; i < du; ++i) mu_u[i] += nkt[i];
            matmat(nKt, sig_x, KS, du, dx, dx);         // K sig_x
            matmatT(KS, nKt, sig_u, du, dx, du);        // K sig_x K^T
            for (int i = 0; i < uu; ++i) sig_u[i] += nSt[i];
            symmetrize_ip(sig_u, du);

            // KL(new || old) at this state marginal (gps/src/util.cpp:83-121)
            const double* oKt = K + t * xu;
            const double* okt = kff + t * du;
            const double* oSt = Sctl + t * uu;
            std::memcpy(qscr, oSt, sizeof(double) * uu);
            if (!chol_fact(qscr, du)) { fail = t + 1; break; }
            double logdet_q = logdet_from_fact(qscr, du);
            for (int i = 0; i < uu; ++i) qlam[i] = 0.0;
            for (int i = 0; i < du; ++i) qlam[i * du + i] = 1.0;
            chol_solve_fact(qscr, qlam, du, du);
            std::memcpy(scr, nSt, sizeof(double) * uu);
            if (!chol_fact(scr, du)) { fail = t + 1; break; }
            double logdet_p = logdet_from_fact(scr, du);
            for (int i = 0; i < du * dx; ++i) dK[i] = oKt[i] - nKt[i];
            for (int i = 0; i < du; ++i) dk[i] = nkt[i] - okt[i];
            // terms
            double tr_lp = 0.0;
            for (int i = 0; i < du; ++i)
                for (int k = 0; k < du; ++k) tr_lp += qlam[i * du + k] * nSt[k * du + i];
            // diff_K = dK^T qlam dK (dx, dx); need tr(diff_K sig_x) + mu^T diff_K mu
            double trdKS = 0.0, mudKmu = 0.0, mucrs = 0.0, dkk = 0.0;
            matmat(qlam, dK, KS, du, du, dx);            // qlam dK (du, dx)
            for (int i = 0; i < dx; ++i)
                for (int j = 0; j < dx; ++j) {
                    double s2 = 0.0;
                    for (int k = 0; k < du; ++k) s2 += dK[k * dx + i] * KS[k * dx + j];
                    trdKS += s2 * sig_x[j * dx + i];
                    mudKmu += mu_x[i] * s2 * mu_x[j];
                }
            matvec(qlam, dk, tmp_du, du, du);
            for (int i = 0; i < dx; ++i) {
                double s2 = 0.0;
                for (int k = 0; k < du; ++k) s2 += dK[k * dx + i] * tmp_du[k];
                mucrs += mu_x[i] * s2;
            }
            for (int i = 0; i < du; ++i) dkk += dk[i] * tmp_du[i];
            kl_sum += 0.5 * (logdet_q - logdet_p) + 0.5 * tr_lp - 0.5 * du
                    + 0.5 * trdKS + 0.5 * mudKmu - mucrs + 0.5 * dkk;

            // propagate joint through dynamics
            // sig_xu = [[sig_x, sig_x K^T], [K sig_x, sig_u]]
            matmat(nKt, sig_x, KS, du, dx, dx);
            for (int i = 0; i < dx; ++i)
                for (int j = 0; j < dx; ++j) sig_xu[i * dxu + j] = sig_x[i * dx + j];
            for (int i = 0; i < dx; ++i)
                for (int j = 0; j < du; ++j) {
                    sig_xu[i * dxu + dx + j] = KS[j * dx + i];
                    sig_xu[(dx + j) * dxu + i] = KS[j * dx + i];
                }
            for (int i = 0; i < du; ++i)
                for (int j = 0; j < du; ++j)
                    sig_xu[(dx + i) * dxu + dx + j] = sig_u[i * du + j];
            symmetrize_ip(sig_xu, dxu);

            const double* At = A + t * xx;
            const double* Bt = B + t * xu;
            for (int i = 0; i < dx; ++i) {
                for (int j = 0; j < dx; ++j) AB[i * dxu + j] = At[i * dx + j];
                for (int j = 0; j < du; ++j) AB[i * dxu + dx + j] = Bt[i * du + j];
            }
            matmat(AB, sig_xu, ABS, dx, dxu, dxu);       // AB sig_xu (dx, dxu)
            matmatT(ABS, AB, sig_x, dx, dxu, dx);        // ... AB^T
            for (int i = 0; i < xx; ++i) sig_x[i] += Sdyn[t * xx + i];
            symmetrize_ip(sig_x, dx);
            double* newmu = Vc;                           // scratch (dx)
            matvec(At, mu_x, newmu, dx, dx);
            matvec(Bt, mu_u, qx, dx, du);                 // scratch
            for (int i = 0; i < dx; ++i) mu_x[i] = newmu[i] + qx[i] + cvec[t * dx + i];
        }
        delete[] mu_x; delete[] sig_x; delete[] mu_u; delete[] sig_u;
        delete[] KS; delete[] qlam; delete[] qscr;
        delete[] dK; delete[] dk; delete[] AB; delete[] sig_xu;
        delete[] ABS;
    }

    out[0] = dual;
    out[1] = kl_sum;

    delete[] agCxx; delete[] agcx; delete[] agCuu; delete[] agcu; delete[] agCxu;
    delete[] agc0; delete[] lam; delete[] scr; delete[] tmp_xu;
    delete[] tmp_du; delete[] V; delete[] v; delete[] newK; delete[] newk;
    delete[] newS; delete[] Vfull0; delete[] vfull0; delete[] VA; delete[] VB;
    delete[] Qxx; delete[] Quu; delete[] Qux; delete[] qx; delete[] qu; delete[] Vc;
    return fail;
}

// --------------------------------------------------------------------------------
// RGPS adversary fixed-point trip: parameter_backward_pass (Kronecker-lifted
// MatrixNormal adversary, rgps/src/util.cpp:626-798) + cubature_forward_pass
// (util.cpp:232-361) + KL damping — the reference's deepest hot path (one trip
// of the mbrgps.py:678-731 fixed point).  theta-vec is column-major over
// [A B c]; p1 = dx+du+1, p = dx*p1.  Returns 0 on success, t+1 of the first
// definiteness failure.
//
// In/out: qmu (T+1, dx), qsig (T+1, dx, dx) — the state-distribution iterate,
// updated in place by the precision-weighted interpolation with weight
// interp_a.  Outputs: mu_opt (T, p), pmu/psig (T+1 state marginal under the
// adversarial parameters), kl_out[0] = sum_t KL(p_xdist || q).
int rgps_fixed_point_cpu(
    const double* Cxx, const double* cx, const double* Cuu, const double* cu,
    const double* Cxu, const double* c0,                       // (T+1, ...)
    const double* K, const double* kff, const double* Sctl,    // (T, ...)
    const double* Sdyn,                                        // (T, dx, dx)
    const double* agCpp, const double* agcp,                   // (T, p, p), (T, p)
    double bpe,                                                // beta + eta
    double* qmu, double* qsig,                                 // (T+1, ...) in/out
    const double* mu0, const double* sigma0,
    int T, int dx, int du, double interp_a,
    double* mu_opt_out,                                        // (T, p)
    double* pmu_out, double* psig_out,                         // (T+1, ...)
    double* kl_out) {

    const int xx = dx * dx, uu = du * du, xu = dx * du;
    const int p1 = dx + du + 1, p = dx * p1, pp = p * p;
    int fail = 0;

    // ---- state-action-offset joint over the horizon (util.cpp:661-686) ----
    double* mu_z = new double[T * p1];
    double* sig_z = new double[T * p1 * p1];
    for (int t = 0; t < T; ++t) {
        const double* Kt = K + t * xu;
        const double* kt = kff + t * du;
        const double* St = Sctl + t * uu;
        const double* mx = qmu + t * dx;
        const double* sx = qsig + t * xx;
        double* mz = mu_z + t * p1;
        double* sz = sig_z + t * p1 * p1;

        for (int i = 0; i < dx; ++i) mz[i] = mx[i];
        for (int i = 0; i < du; ++i) {
            double s = kt[i];
            for (int k = 0; k < dx; ++k) s += Kt[i * dx + k] * mx[k];
            mz[dx + i] = s;
        }
        mz[dx + du] = 1.0;

        // cross = sig_x K^T (dx, du); sigma_u = Sctl + K sig_x K^T + 1e-8 I
        for (int i = 0; i < p1 * p1; ++i) sz[i] = 0.0;
        double* KS = new double[du * dx];
        matmat(Kt, sx, KS, du, dx, dx);                    // K sig_x (du, dx)
        for (int i = 0; i < dx; ++i)
            for (int j = 0; j < dx; ++j) sz[i * p1 + j] = sx[i * dx + j];
        for (int i = 0; i < dx; ++i)
            for (int j = 0; j < du; ++j) {
                sz[i * p1 + dx + j] = KS[j * dx + i];
                sz[(dx + j) * p1 + i] = KS[j * dx + i];
            }
        for (int i = 0; i < du; ++i)
            for (int j = 0; j < du; ++j) {
                double s = St[i * du + j];
                for (int k = 0; k < dx; ++k) s += KS[i * dx + k] * Kt[j * dx + k];
                sz[(dx + i) * p1 + dx + j] = s + (i == j ? 1e-8 : 0.0);
            }
        delete[] KS;
        symmetrize_ip(sz, p1);
        for (int i = 0; i < p1; ++i) sz[i * p1 + i] += 1e-8;
    }

    // ---- adversary backward recursion (util.cpp:626-798) ----
    double* V = new double[xx]; double* v = new double[dx]; double v0;
    double* sigma_opt = new double[T * pp];
    double* W = new double[pp]; double* w = new double[p];
    double* Pblk = new double[p1 * p1];
    double* Amat = new double[xx]; double* Bmat = new double[xu];
    double* cvec = new double[dx];
    double* Acl = new double[xx]; double* ccl = new double[dx];
    double* VA = new double[xx]; double* Vnew = new double[xx];
    double* vnew = new double[dx]; double* tmp_x = new double[dx];
    double* tmp_u = new double[du];

    for (int i = 0; i < xx; ++i) V[i] = -Cxx[T * xx + i];
    for (int i = 0; i < dx; ++i) v[i] = -cx[T * dx + i];
    v0 = -c0[T];

    for (int t = T - 1; t >= 0 && !fail; --t) {
        const double* mz = mu_z + t * p1;
        const double* sz = sig_z + t * p1 * p1;
        const double* aC = agCpp + t * pp;
        const double* ac = agcp + t * p;
        const double* Kt = K + t * xu;
        const double* kt = kff + t * du;
        const double* St = Sctl + t * uu;
        double* so = sigma_opt + t * pp;
        double* mo = mu_opt_out + t * p;

        // W = sym(2 (agCpp + kron(mz mz^T + sz, V)) / bpe); w = -(agcp + kron(mz, v)) / bpe
        for (int a = 0; a < p1; ++a)
            for (int b = 0; b < p1; ++b) {
                double M = mz[a] * mz[b] + sz[a * p1 + b];
                for (int i = 0; i < dx; ++i)
                    for (int j = 0; j < dx; ++j)
                        W[(a * dx + i) * p + b * dx + j] =
                            2.0 * (aC[(a * dx + i) * p + b * dx + j]
                                   + M * V[i * dx + j]) / bpe;
            }
        symmetrize_ip(W, p);
        for (int a = 0; a < p1; ++a)
            for (int i = 0; i < dx; ++i)
                w[a * dx + i] = -(ac[a * dx + i] + mz[a] * v[i]) / bpe;

        if (!chol_fact(W, p)) { fail = t + 1; break; }   // W overwritten by its factor
        for (int i = 0; i < pp; ++i) so[i] = 0.0;
        for (int i = 0; i < p; ++i) so[i * p + i] = 1.0;
        chol_solve_fact(W, so, p, p);
        symmetrize_ip(so, p);
        matvec(so, w, mo, p, p);

        // unpack A, B, c (column-major blocks of mu_opt)
        for (int j = 0; j < dx; ++j)
            for (int i = 0; i < dx; ++i) Amat[i * dx + j] = mo[j * dx + i];
        for (int j = 0; j < du; ++j)
            for (int i = 0; i < dx; ++i) Bmat[i * du + j] = mo[xx + j * dx + i];
        for (int i = 0; i < dx; ++i) cvec[i] = mo[xx + xu + i];

        // P[a,b] = tr(Sigma_opt block[a,b] V) = sum_ij so[(a dx + i) p + b dx + j] V[j,i]
        for (int a = 0; a < p1; ++a)
            for (int b = 0; b < p1; ++b) {
                double s = 0.0;
                for (int i = 0; i < dx; ++i)
                    for (int j = 0; j < dx; ++j)
                        s += so[(a * dx + i) * p + b * dx + j] * V[j * dx + i];
                Pblk[a * p1 + b] = s;
            }

        // closed loop
        for (int i = 0; i < dx; ++i) {
            for (int j = 0; j < dx; ++j) {
                double s = Amat[i * dx + j];
                for (int k = 0; k < du; ++k) s += Bmat[i * du + k] * Kt[k * dx + j];
                Acl[i * dx + j] = s;
            }
            double s = cvec[i];
            for (int k = 0; k < du; ++k) s += Bmat[i * du + k] * kt[k];
            ccl[i] = s;
        }

        // MCuu = -Cuu[t] + Puu (du, du); MCxu = -Cxu[t] + Pxu (dx, du)
        double* MCuu = new double[uu]; double* MCxu = new double[xu];
        for (int i = 0; i < du; ++i)
            for (int j = 0; j < du; ++j)
                MCuu[i * du + j] = -Cuu[t * uu + i * du + j]
                                 + Pblk[(dx + i) * p1 + dx + j];
        for (int i = 0; i < dx; ++i)
            for (int j = 0; j < du; ++j)
                MCxu[i * du + j] = -Cxu[t * xu + i * du + j]
                                 + Pblk[i * p1 + dx + j];

        // Vnew = (-Cxx + Pxx) + K^T MCuu K + Acl^T V Acl + 2 MCxu K
        matmat(V, Acl, VA, dx, dx, dx);                    // V Acl
        double* MK = new double[du * dx];                  // MCuu K (du, dx)
        matmat(MCuu, Kt, MK, du, du, dx);
        for (int i = 0; i < dx; ++i)
            for (int j = 0; j < dx; ++j) {
                double s = -Cxx[t * xx + i * dx + j] + Pblk[i * p1 + j];
                for (int k = 0; k < du; ++k) {
                    s += Kt[k * dx + i] * MK[k * dx + j];       // K^T MCuu K
                    s += 2.0 * MCxu[i * du + k] * Kt[k * dx + j];
                }
                for (int k = 0; k < dx; ++k) s += Acl[k * dx + i] * VA[k * dx + j];
                Vnew[i * dx + j] = s;
            }
        symmetrize_ip(Vnew, dx);

        // vnew = (-cx + 2 px) + 2 K^T MCuu kff + 2 MCxu kff + K^T (-cu + 2 pu)
        //        + 2 Acl^T V ccl + Acl^T v
        matvec(MCuu, kt, tmp_u, du, du);                   // MCuu kff
        matvec(V, ccl, tmp_x, dx, dx);                     // V ccl
        for (int i = 0; i < dx; ++i) {
            double s = -cx[t * dx + i] + 2.0 * Pblk[i * p1 + p1 - 1];
            for (int k = 0; k < du; ++k) {
                s += 2.0 * Kt[k * dx + i] * tmp_u[k];
                s += 2.0 * MCxu[i * du + k] * kt[k];
                s += Kt[k * dx + i]
                     * (-cu[t * du + k] + 2.0 * Pblk[(dx + k) * p1 + p1 - 1]);
            }
            for (int k = 0; k < dx; ++k)
                s += Acl[k * dx + i] * (2.0 * tmp_x[k] + v[k]);
            vnew[i] = s;
        }

        // v0new
        double kMk = 0.0, kcu = 0.0, trCS = 0.0, trVS = 0.0, cVc = 0.0, cv = 0.0;
        for (int i = 0; i < du; ++i) {
            kMk += kt[i] * tmp_u[i];
            kcu += kt[i] * (-cu[t * du + i] + 2.0 * Pblk[(dx + i) * p1 + p1 - 1]);
            for (int k = 0; k < du; ++k)
                trCS += Cuu[(t + 1) * uu + i * du + k] * St[k * du + i];
        }
        for (int i = 0; i < dx; ++i) {
            cv += ccl[i] * v[i];
            cVc += ccl[i] * tmp_x[i];
            for (int k = 0; k < dx; ++k)
                trVS += V[i * dx + k] * Sdyn[t * xx + k * dx + i];
        }
        // kron(sigma_block, V) terms: sigma_block nonzero only on the control block
        double muKmu = 0.0, trKS = 0.0;
        for (int a = 0; a < du; ++a)
            for (int b = 0; b < du; ++b) {
                double s_mu = 0.0, s_tr = 0.0;
                for (int i = 0; i < dx; ++i)
                    for (int j = 0; j < dx; ++j) {
                        s_mu += mo[(dx + a) * dx + i] * V[i * dx + j]
                              * mo[(dx + b) * dx + j];
                        s_tr += V[i * dx + j]
                              * so[((dx + b) * dx + j) * p + (dx + a) * dx + i];
                    }
                muKmu += St[a * du + b] * s_mu;
                trKS += St[a * du + b] * s_tr;
            }
        double v0new = (-c0[t] + Pblk[p1 * p1 - 1]) + kMk + kcu - trCS + v0
                     + trVS + muKmu + trKS + cVc + cv;

        std::memcpy(V, Vnew, sizeof(double) * xx);
        std::memcpy(v, vnew, sizeof(double) * dx);
        v0 = v0new;
        delete[] MCuu; delete[] MCxu; delete[] MK;
    }

    // ---- cubature forward under the adversarial parameters (util.cpp:232-361) ----
    double kl_sum = 0.0;
    if (!fail) {
        const int daug = dx + du + 1 + dx, n_pts = 2 * daug, dxu = dx + du;
        double scale = std::sqrt((double)daug);
        double* msx = new double[dx]; double* ssx = new double[xx];
        std::memcpy(msx, mu0, sizeof(double) * dx);
        std::memcpy(ssx, sigma0, sizeof(double) * xx);
        double* sig_xu = new double[dxu * dxu];
        double* chol_aug = new double[daug * daug];
        double* pts = new double[n_pts * daug];
        double* outp = new double[n_pts * dx];
        double* cov = new double[xx];
        double* KS = new double[du * dx];
        double* mu_u = new double[du]; double* sig_u = new double[uu];

        for (int t = 0; t <= T; ++t) {
            std::memcpy(pmu_out + t * dx, msx, sizeof(double) * dx);
            std::memcpy(psig_out + t * xx, ssx, sizeof(double) * xx);
            if (t == T) break;

            const double* mo = mu_opt_out + t * p;
            const double* so = sigma_opt + t * pp;
            const double* Kt = K + t * xu;
            const double* kt = kff + t * du;
            const double* St = Sctl + t * uu;

            // unpack adversarial A, B, c
            for (int j = 0; j < dx; ++j)
                for (int i = 0; i < dx; ++i) Amat[i * dx + j] = mo[j * dx + i];
            for (int j = 0; j < du; ++j)
                for (int i = 0; i < dx; ++i) Bmat[i * du + j] = mo[xx + j * dx + i];
            for (int i = 0; i < dx; ++i) cvec[i] = mo[xx + xu + i];

            // action marginal + joint
            matvec(Kt, msx, mu_u, du, dx);
            for (int i = 0; i < du; ++i) mu_u[i] += kt[i];
            matmat(Kt, ssx, KS, du, dx, dx);
            for (int i = 0; i < du; ++i)
                for (int j = 0; j < du; ++j) {
                    double s = St[i * du + j];
                    for (int k = 0; k < dx; ++k) s += KS[i * dx + k] * Kt[j * dx + k];
                    sig_u[i * du + j] = s;
                }
            symmetrize_ip(sig_u, du);
            for (int i = 0; i < du; ++i) sig_u[i * du + i] += 1e-8;

            for (int i = 0; i < dx; ++i)
                for (int j = 0; j < dx; ++j) sig_xu[i * dxu + j] = ssx[i * dx + j];
            for (int i = 0; i < dx; ++i)
                for (int j = 0; j < du; ++j) {
                    sig_xu[i * dxu + dx + j] = KS[j * dx + i];
                    sig_xu[(dx + j) * dxu + i] = KS[j * dx + i];
                }
            for (int i = 0; i < du; ++i)
                for (int j = 0; j < du; ++j)
                    sig_xu[(dx + i) * dxu + dx + j] = sig_u[i * du + j];
            symmetrize_ip(sig_xu, dxu);
            for (int i = 0; i < dxu; ++i) sig_xu[i * dxu + i] += 1e-8;

            if (!chol_fact(sig_xu, dxu)) { fail = t + 1; break; }
            // lower-triangular factor lives in sig_xu's lower triangle now
            for (int i = 0; i < daug * daug; ++i) chol_aug[i] = 0.0;
            for (int i = 0; i < dxu; ++i)
                for (int j = 0; j <= i; ++j)
                    chol_aug[i * daug + j] = sig_xu[i * dxu + j];
            for (int i = 0; i < dx; ++i)
                chol_aug[(dxu + 1 + i) * daug + dxu + 1 + i] = 1.0;

            // cubature points: mu_aug +- sqrt(daug) * columns of chol_aug
            for (int k = 0; k < daug; ++k)
                for (int i = 0; i < daug; ++i) {
                    double base = (i < dx) ? msx[i]
                                : (i < dxu) ? mu_u[i - dx]
                                : (i == dxu) ? 1.0 : 0.0;
                    double d = scale * chol_aug[i * daug + k];
                    pts[k * daug + i] = base + d;
                    pts[(daug + k) * daug + i] = base - d;
                }

            // propagate each point through uncertain dynamics
            for (int k = 0; k < n_pts && !fail; ++k) {
                const double* pt = pts + k * daug;
                // cov = Sdyn + sum_ab z_a z_b Sigma_theta[block a, b]
                for (int i = 0; i < dx; ++i)
                    for (int j = 0; j < dx; ++j) {
                        double s = Sdyn[t * xx + i * dx + j];
                        for (int a = 0; a < p1; ++a)
                            for (int b = 0; b < p1; ++b)
                                s += pt[a] * pt[b]
                                   * so[(a * dx + i) * p + b * dx + j];
                        cov[i * dx + j] = s;
                    }
                symmetrize_ip(cov, dx);
                if (!chol_fact(cov, dx)) { fail = t + 1; break; }
                double* ok = outp + k * dx;
                for (int i = 0; i < dx; ++i) {
                    double s = cvec[i] * pt[dx + du];
                    for (int j = 0; j < dx; ++j) s += Amat[i * dx + j] * pt[j];
                    for (int j = 0; j < du; ++j) s += Bmat[i * du + j] * pt[dx + j];
                    for (int j = 0; j <= i; ++j)
                        s += cov[i * dx + j] * pt[p1 + j];   // chol_cov w
                    ok[i] = s;
                }
            }
            if (fail) break;

            for (int i = 0; i < dx; ++i) {
                double s = 0.0;
                for (int k = 0; k < n_pts; ++k) s += outp[k * dx + i];
                msx[i] = s / n_pts;
            }
            for (int i = 0; i < dx; ++i)
                for (int j = 0; j <= i; ++j) {
                    double s = 0.0;
                    for (int k = 0; k < n_pts; ++k)
                        s += (outp[k * dx + i] - msx[i]) * (outp[k * dx + j] - msx[j]);
                    ssx[i * dx + j] = ssx[j * dx + i] = s / n_pts;
                }
        }

        // ---- KL(p_xdist || q) + precision-weighted interpolation ----
        if (!fail) {
            double* lam_q = new double[xx]; double* lam_p = new double[xx];
            double* scr2 = new double[xx]; double* mix = new double[xx];
            double* rhs = new double[dx];
            for (int t = 0; t <= T; ++t) {
                const double* mp = pmu_out + t * dx;
                const double* sp = psig_out + t * xx;
                double* mq = qmu + t * dx;
                double* sq = qsig + t * xx;

                std::memcpy(scr2, sq, sizeof(double) * xx);
                if (!chol_fact(scr2, dx)) { fail = T + 1 + t; break; }
                double logdet_q = logdet_from_fact(scr2, dx);
                for (int i = 0; i < xx; ++i) lam_q[i] = 0.0;
                for (int i = 0; i < dx; ++i) lam_q[i * dx + i] = 1.0;
                chol_solve_fact(scr2, lam_q, dx, dx);

                std::memcpy(scr2, sp, sizeof(double) * xx);
                if (!chol_fact(scr2, dx)) { fail = T + 1 + t; break; }
                double logdet_p = logdet_from_fact(scr2, dx);
                for (int i = 0; i < xx; ++i) lam_p[i] = 0.0;
                for (int i = 0; i < dx; ++i) lam_p[i * dx + i] = 1.0;
                chol_solve_fact(scr2, lam_p, dx, dx);

                double tr = 0.0, quad = 0.0;
                for (int i = 0; i < dx; ++i)
                    for (int j = 0; j < dx; ++j) {
                        tr += lam_q[i * dx + j] * sp[j * dx + i];
                        quad += (mq[i] - mp[i]) * lam_q[i * dx + j] * (mq[j] - mp[j]);
                    }
                kl_sum += 0.5 * (tr + quad + logdet_q - logdet_p - dx);

                // q_new = interp: Sig = (a lam_p + (1-a) lam_q)^-1,
                //                 mu = Sig (a lam_p mu_p + (1-a) lam_q mu_q)
                for (int i = 0; i < xx; ++i)
                    mix[i] = interp_a * lam_p[i] + (1.0 - interp_a) * lam_q[i];
                for (int i = 0; i < dx; ++i) {
                    double s = 0.0;
                    for (int j = 0; j < dx; ++j)
                        s += interp_a * lam_p[i * dx + j] * mp[j]
                           + (1.0 - interp_a) * lam_q[i * dx + j] * mq[j];
                    rhs[i] = s;
                }
                if (!chol_fact(mix, dx)) { fail = T + 1 + t; break; }
                // sq = mix^-1 ; mq = mix^-1 rhs
                for (int i = 0; i < xx; ++i) sq[i] = 0.0;
                for (int i = 0; i < dx; ++i) sq[i * dx + i] = 1.0;
                chol_solve_fact(mix, sq, dx, dx);
                symmetrize_ip(sq, dx);
                chol_solve_fact(mix, rhs, dx, 1);
                std::memcpy(mq, rhs, sizeof(double) * dx);
            }
            delete[] lam_q; delete[] lam_p; delete[] scr2; delete[] mix; delete[] rhs;
        }

        delete[] msx; delete[] ssx; delete[] sig_xu; delete[] chol_aug;
        delete[] pts; delete[] outp; delete[] cov; delete[] KS;
        delete[] mu_u; delete[] sig_u;
    }

    kl_out[0] = kl_sum;
    delete[] mu_z; delete[] sig_z; delete[] V; delete[] v; delete[] sigma_opt;
    delete[] W; delete[] w; delete[] Pblk; delete[] Amat; delete[] Bmat;
    delete[] cvec; delete[] Acl; delete[] ccl; delete[] VA; delete[] Vnew;
    delete[] vnew; delete[] tmp_x; delete[] tmp_u;
    return fail;
}

double rgps_fixed_point_bench(
    const double* Cxx, const double* cx, const double* Cuu, const double* cu,
    const double* Cxu, const double* c0, const double* K, const double* kff,
    const double* Sctl, const double* Sdyn, const double* agCpp,
    const double* agcp, double bpe, double* qmu, double* qsig,
    const double* mu0, const double* sigma0, int T, int dx, int du,
    double interp_a, int reps, double* mu_opt_out, double* pmu_out,
    double* psig_out, double* kl_out) {
    auto start = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; ++r) {
        // a definiteness failure returns early and would leave qmu/qsig
        // half-updated: subsequent reps would bail near t=0 and the measured
        // time would cover far fewer than `reps` full trips, silently
        // inflating the derived CPU rate — report failure instead
        int fail = rgps_fixed_point_cpu(
            Cxx, cx, Cuu, cu, Cxu, c0, K, kff, Sctl, Sdyn,
            agCpp, agcp, bpe, qmu, qsig, mu0, sigma0,
            T, dx, du, interp_a, mu_opt_out, pmu_out, psig_out, kl_out);
        if (fail) return -static_cast<double>(fail);
    }
    auto end = std::chrono::steady_clock::now();
    return std::chrono::duration<double>(end - start).count();
}

// --------------------------------------------------------------------------------
// BSP-iLQR belief-value backward recursion with the vec(Sigma) channel
// (bspilqr/src/util.cpp:83-204, with the tau-index fix of core/belief.py).
// Inputs are the belief cost expansion (T+1 stacks) and the belief-dynamics
// Jacobian blocks (T stacks); reg selects value-regularization (2) or
// control-cost regularization (1).  Outputs K (T, a, b), kff (T, a),
// dS (2,).  Returns 0 on success, t+1 of the first definiteness failure.
int bsp_backward_cpu(
    const double* Q, const double* q, const double* R, const double* r,
    const double* P, const double* pvec,                       // (T+1, ...)
    const double* F, const double* G, const double* X, const double* Y,
    const double* Z, const double* Tm, const double* U, const double* Vm,
    double lmbda, int reg, int T, int b, int a,
    double* K, double* kff, double* dS) {

    const int bb = b * b, ab = a * b, aa = a * a;
    int fail = 0;

    double* S = new double[bb]; double* s = new double[b];
    double* tau = new double[bb];
    double* SF = new double[bb]; double* SG = new double[b * a];
    double* Cm = new double[bb]; double* D = new double[aa];
    double* E = new double[ab];  double* E_reg = new double[ab];
    double* D_reg = new double[aa]; double* S_reg = new double[bb];
    double* cvec = new double[b]; double* dvec = new double[a];
    double* evec = new double[bb];
    double* Dk = new double[a]; double* scr = new double[aa];

    std::memcpy(S, Q + T * bb, sizeof(double) * bb);
    std::memcpy(s, q + T * b, sizeof(double) * b);
    std::memcpy(tau, pvec + T * bb, sizeof(double) * bb);
    dS[0] = 0.0; dS[1] = 0.0;

    for (int t = T - 1; t >= 0 && !fail; --t) {
        const double* Ft = F + t * bb;
        const double* Gt = G + t * b * a;
        const double* Xt = X + t * bb * b;
        const double* Yt = Y + t * bb * bb;
        const double* Zt = Z + t * bb * a;
        const double* Tt = Tm + t * bb * b;
        const double* Ut = U + t * bb * bb;
        const double* Vt = Vm + t * bb * a;
        double* Kt = K + t * ab;
        double* kt = kff + t * a;

        matmat(S, Ft, SF, b, b, b);                        // S F
        matmat(S, Gt, SG, b, b, a);                        // S G
        // C = Q + F^T S F ; D = R + G^T S G ; E = (P + F^T S G)^T (a, b)
        matTmat(Ft, SF, Cm, b, b, b);
        for (int i = 0; i < bb; ++i) Cm[i] += Q[t * bb + i];
        matTmat(Gt, SG, D, b, a, a);
        for (int i = 0; i < aa; ++i) D[i] += R[t * aa + i];
        for (int i = 0; i < a; ++i)
            for (int j = 0; j < b; ++j) {
                double v = P[t * b * a + j * a + i];
                for (int k = 0; k < b; ++k) v += Ft[k * b + j] * SG[k * a + i];
                E[i * b + j] = v;
            }

        // linear channels: c = q + F^T s + T^T tau + 0.5 X^T vec(S)
        for (int i = 0; i < b; ++i) {
            double v = q[t * b + i];
            for (int k = 0; k < b; ++k) v += Ft[k * b + i] * s[k];
            for (int k = 0; k < bb; ++k)
                v += Tt[k * b + i] * tau[k] + 0.5 * Xt[k * b + i] * S[k];
            cvec[i] = v;
        }
        for (int i = 0; i < a; ++i) {
            double v = r[t * a + i];
            for (int k = 0; k < b; ++k) v += Gt[k * a + i] * s[k];
            for (int k = 0; k < bb; ++k)
                v += Vt[k * a + i] * tau[k] + 0.5 * Zt[k * a + i] * S[k];
            dvec[i] = v;
        }
        for (int i = 0; i < bb; ++i) {
            double v = pvec[t * bb + i];
            for (int k = 0; k < bb; ++k)
                v += Ut[k * bb + i] * tau[k] + 0.5 * Yt[k * bb + i] * S[k];
            evec[i] = v;
        }

        // regularized gain solve
        std::memcpy(S_reg, S, sizeof(double) * bb);
        if (reg == 2)
            for (int i = 0; i < b; ++i) S_reg[i * b + i] += lmbda;
        matmat(S_reg, Gt, SG, b, b, a);                    // S_reg G (reuse SG)
        for (int i = 0; i < a; ++i)
            for (int j = 0; j < b; ++j) {
                double v = P[t * b * a + j * a + i];
                for (int k = 0; k < b; ++k) v += Ft[k * b + j] * SG[k * a + i];
                E_reg[i * b + j] = v;
            }
        matTmat(Gt, SG, D_reg, b, a, a);
        for (int i = 0; i < aa; ++i) D_reg[i] += R[t * aa + i];
        if (reg == 1)
            for (int i = 0; i < a; ++i) D_reg[i * a + i] += lmbda;
        symmetrize_ip(D_reg, a);

        std::memcpy(scr, D_reg, sizeof(double) * aa);
        if (!chol_fact(scr, a)) { fail = t + 1; break; }
        std::memcpy(Kt, E_reg, sizeof(double) * ab);
        chol_solve_fact(scr, Kt, a, b);
        for (int i = 0; i < ab; ++i) Kt[i] = -Kt[i];
        std::memcpy(kt, dvec, sizeof(double) * a);
        chol_solve_fact(scr, kt, a, 1);
        for (int i = 0; i < a; ++i) kt[i] = -kt[i];

        matvec(D, kt, Dk, a, a);
        double kd = 0.0, kDk = 0.0;
        for (int i = 0; i < a; ++i) { kd += kt[i] * dvec[i]; kDk += kt[i] * Dk[i]; }
        dS[0] += kd; dS[1] += 0.5 * kDk;

        // tau' = e ; s' = c + K^T D kff + K^T d + E^T kff ;
        // S' = sym(C + K^T D K + K^T E + E^T K)
        std::memcpy(tau, evec, sizeof(double) * bb);
        for (int i = 0; i < b; ++i) {
            double v = cvec[i];
            for (int k = 0; k < a; ++k)
                v += Kt[k * b + i] * (Dk[k] + dvec[k]) + E[k * b + i] * kt[k];
            s[i] = v;
        }
        double* DK = SG;                                   // reuse (a, b) scratch
        matmat(D, Kt, DK, a, a, b);
        for (int i = 0; i < b; ++i)
            for (int j = 0; j < b; ++j) {
                double v = Cm[i * b + j];
                for (int k = 0; k < a; ++k)
                    v += Kt[k * b + i] * (DK[k * b + j] + E[k * b + j])
                       + E[k * b + i] * Kt[k * b + j];
                SF[i * b + j] = v;                         // scratch for new S
            }
        symmetrize_ip(SF, b);
        std::memcpy(S, SF, sizeof(double) * bb);
    }

    delete[] S; delete[] s; delete[] tau; delete[] SF; delete[] SG;
    delete[] Cm; delete[] D; delete[] E; delete[] E_reg; delete[] D_reg;
    delete[] S_reg; delete[] cvec; delete[] dvec; delete[] evec;
    delete[] Dk; delete[] scr;
    return fail;
}

double bsp_backward_bench(
    const double* Q, const double* q, const double* R, const double* r,
    const double* P, const double* pvec, const double* F, const double* G,
    const double* X, const double* Y, const double* Z, const double* Tm,
    const double* U, const double* Vm, double lmbda, int reg,
    int T, int b, int a, int reps, double* K, double* kff, double* dS) {
    auto start = std::chrono::steady_clock::now();
    for (int rep = 0; rep < reps; ++rep)
        bsp_backward_cpu(Q, q, R, r, P, pvec, F, G, X, Y, Z, Tm, U, Vm,
                         lmbda, reg, T, b, a, K, kff, dS);
    auto end = std::chrono::steady_clock::now();
    return std::chrono::duration<double>(end - start).count();
}

// -----------------------------------------------------------------------------------
// Full belief-MPC control-step chain at light-dark dims — the honest CPU
// denominator for bsp_lightdark_mpc_steps_per_s: what a plain-C++ port of the
// reference's per-control-step work (examples/bspilqr/lightdark.py:34-45) has
// to compute: nb_iter iterations of (belief-dynamics expansion [central FD in
// lieu of autograd] -> lambda-escalated (S,s,tau) backward -> 11-alpha belief
// rollouts -> accept/reject) plus the closing EKF update.  The old
// backward-only denominator (bsp_backward_bench x nb_iter) stays reported as
// bsp_cpu_steps_per_s_backward_only.
// -----------------------------------------------------------------------------------

namespace lightdark {

constexpr int B = 2, AC = 2, BB = 4, NIN = 8, NOUT = 10, NA = 11;
constexpr double XL0 = 7.0, XL1 = 4.0;
constexpr double DYN_SIG = 1e-8, OBS_SIG = 1e-4;

inline void dynamics(const double* x, const double* u, double* f) {
    double a = x[0] + u[0], b = x[1] + u[1];
    f[0] = a < -XL0 ? -XL0 : (a > XL0 ? XL0 : a);
    f[1] = b < -XL1 ? -XL1 : (b > XL1 ? XL1 : b);
}

inline void obs_noise(const double* x, double* R) {
    double d = 5.0 - x[0];
    R[0] = OBS_SIG + 0.5 * d * d; R[1] = 0.0; R[2] = 0.0; R[3] = OBS_SIG;
}

inline void inv2(const double* M, double* I) {
    double det = M[0] * M[3] - M[1] * M[2];
    double inv = 1.0 / det;
    I[0] = M[3] * inv; I[1] = -M[1] * inv;
    I[2] = -M[2] * inv; I[3] = M[0] * inv;
}

// (f, W, phi) = belief EKF predict+gain step (H = I), Joseph form
inline void ekf_step(const double* mu, const double* sig, const double* u,
                     double* f, double* W, double* phi) {
    dynamics(mu, u, f);
    // A = d f / d mu (clip mask)
    double a00 = (f[0] > -XL0 && f[0] < XL0) ? 1.0 : 0.0;
    double a11 = (f[1] > -XL1 && f[1] < XL1) ? 1.0 : 0.0;
    double D[4] = {a00 * sig[0] * a00 + DYN_SIG, a00 * sig[1] * a11,
                   a11 * sig[2] * a00, a11 * sig[3] * a11 + DYN_SIG};
    D[1] = D[2] = 0.5 * (D[1] + D[2]);
    double R[4]; obs_noise(f, R);
    double S[4] = {D[0] + R[0], D[1] + R[1], D[2] + R[2], D[3] + R[3]};
    double Si[4]; inv2(S, Si);
    double K[4]; matmat(D, Si, K, 2, 2, 2);
    matmat(K, D, W, 2, 2, 2);
    double IK[4] = {1.0 - K[0], -K[1], -K[2], 1.0 - K[3]};
    double T1[4], T2[4];
    matmat(IK, D, T1, 2, 2, 2); matmatT(T1, IK, T2, 2, 2, 2);
    matmat(K, R, T1, 2, 2, 2);
    double T3[4]; matmatT(T1, K, T3, 2, 2, 2);
    for (int i = 0; i < 4; ++i) phi[i] = T2[i] + T3[i];
    phi[1] = phi[2] = 0.5 * (phi[1] + phi[2]);
}

inline void flat_ekf(const double* z, double* out) {
    ekf_step(z, z + B, z + B + BB, out, out + B, out + B + BB);
}

inline double bcost(const double* mu, const double* sig, const double* u) {
    return 0.5 * (mu[0] * mu[0] + mu[1] * mu[1]) + 200.0 * sig[0]
           + 0.5 * (u[0] * u[0] + u[1] * u[1]);
}

}  // namespace lightdark

double bsp_mpc_step_bench(int T, int nb_iter, int reps) {
    using namespace lightdark;
    const int bb = BB, b = B, a = AC;
    const double min_l = 1e-6, max_l = 1e6, mult_l = 1.6;
    const double tolfun = 1e-8, tolgrad = 1e-6, min_imp = 0.0;
    double alphas[NA];
    for (int i = 0; i < NA; ++i) alphas[i] = std::pow(10.0, -3.0 * i / 10.0);

    // trajectory + expansion storage
    double* bmu = new double[(T + 1) * b];
    double* bsig = new double[(T + 1) * bb];
    double* uref = new double[T * a];
    double* Q = new double[(T + 1) * bb]; double* q = new double[(T + 1) * b];
    double* R = new double[(T + 1) * a * a]; double* r = new double[(T + 1) * a];
    double* P = new double[(T + 1) * b * a]; double* pv = new double[(T + 1) * bb];
    double* F = new double[T * bb]; double* G = new double[T * b * a];
    double* X = new double[T * bb * b]; double* Y = new double[T * bb * bb];
    double* Z = new double[T * bb * a]; double* Tm = new double[T * bb * b];
    double* U = new double[T * bb * bb]; double* Vm = new double[T * bb * a];
    double* K = new double[T * a * b]; double* kff = new double[T * a];
    double* Kacc = new double[T * a * b]; double* kacc = new double[T * a];
    double* nmu = new double[NA * (T + 1) * b];
    double* nsig = new double[NA * (T + 1) * bb];
    double* nu = new double[NA * T * a];
    double rets[NA]; double dS[2];
    Kacc[0] = 0.0; kacc[0] = 0.0;

    auto rollout = [&](double alpha, double* omu, double* osig, double* ou) {
        double mu[B], sg[BB], u[AC], f[B], W[BB], phi[BB];
        std::memcpy(mu, bmu, sizeof mu);
        std::memcpy(sg, bsig, sizeof sg);
        double ret = 0.0;
        for (int t = 0; t < T; ++t) {
            for (int j = 0; j < a; ++j) {
                double v = uref[t * a + j] + alpha * kff[t * a + j];
                for (int c = 0; c < b; ++c)
                    v += K[t * a * b + j * b + c] * (mu[c] - bmu[t * b + c]);
                u[j] = v;
            }
            ret += bcost(mu, sg, u);
            std::memcpy(omu + t * b, mu, sizeof mu);
            std::memcpy(osig + t * bb, sg, sizeof sg);
            std::memcpy(ou + t * a, u, sizeof u);
            ekf_step(mu, sg, u, f, W, phi);
            std::memcpy(mu, f, sizeof mu);
            std::memcpy(sg, phi, sizeof sg);
        }
        double uz[AC] = {0.0, 0.0};
        ret += bcost(mu, sg, uz);
        std::memcpy(omu + T * b, mu, sizeof mu);
        std::memcpy(osig + T * bb, sg, sizeof sg);
        return ret;
    };

    auto expand = [&]() {
        // closed-form cost expansion (quadratic belief cost)
        for (int t = 0; t <= T; ++t) {
            Q[t * bb] = 1.0; Q[t * bb + 1] = 0.0; Q[t * bb + 2] = 0.0; Q[t * bb + 3] = 1.0;
            q[t * b] = bmu[t * b]; q[t * b + 1] = bmu[t * b + 1];
            R[t * a * a] = 1.0; R[t * a * a + 1] = 0.0; R[t * a * a + 2] = 0.0; R[t * a * a + 3] = 1.0;
            double u0 = t < T ? uref[t * a] : 0.0, u1 = t < T ? uref[t * a + 1] : 0.0;
            r[t * a] = u0; r[t * a + 1] = u1;
            for (int i = 0; i < b * a; ++i) P[t * b * a + i] = 0.0;
            pv[t * bb] = 200.0; pv[t * bb + 1] = 0.0; pv[t * bb + 2] = 0.0; pv[t * bb + 3] = 0.0;
        }
        // belief-dynamics expansion by central differences (the C++ stand-in
        // for the reference's per-step autograd jacobian)
        const double h = 1e-6;
        double z[NIN], op[NOUT], om[NOUT];
        for (int t = 0; t < T; ++t) {
            std::memcpy(z, bmu + t * b, sizeof(double) * b);
            std::memcpy(z + b, bsig + t * bb, sizeof(double) * bb);
            std::memcpy(z + b + bb, uref + t * a, sizeof(double) * a);
            for (int k = 0; k < NIN; ++k) {
                double z0 = z[k];
                z[k] = z0 + h; flat_ekf(z, op);
                z[k] = z0 - h; flat_ekf(z, om);
                z[k] = z0;
                for (int i = 0; i < NOUT; ++i) {
                    double d = (op[i] - om[i]) / (2.0 * h);
                    if (i < b) {
                        if (k < b) F[t * bb + i * b + k] = d;
                        else if (k >= b + bb) G[t * b * a + i * a + (k - b - bb)] = d;
                    } else if (i < b + bb) {
                        int row = i - b;
                        if (k < b) X[t * bb * b + row * b + k] = d;
                        else if (k < b + bb) Y[t * bb * bb + row * bb + (k - b)] = d;
                        else Z[t * bb * a + row * a + (k - b - bb)] = d;
                    } else {
                        int row = i - b - bb;
                        if (k < b) Tm[t * bb * b + row * b + k] = d;
                        else if (k < b + bb) U[t * bb * bb + row * bb + (k - b)] = d;
                        else Vm[t * bb * a + row * a + (k - b - bb)] = d;
                    }
                }
            }
        }
    };

    auto start = std::chrono::steady_clock::now();
    for (int rep = 0; rep < reps; ++rep) {
        // fresh replan from the canonical initial belief (the MPC driver
        // re-instantiates the solver every control step)
        double mu0[B] = {2.0, 2.0};
        double sig0[BB] = {5.0, 0.0, 0.0, 1e-8};
        std::memcpy(bmu, mu0, sizeof mu0);
        std::memcpy(bsig, sig0, sizeof sig0);
        std::memset(uref, 0, sizeof(double) * T * a);
        std::memset(K, 0, sizeof(double) * T * a * b);
        std::memset(kff, 0, sizeof(double) * T * a);
        double last_ret = rollout(1.0, bmu, bsig, uref);
        std::memset(uref, 0, sizeof(double) * T * a);

        double lm = 1.0, dlm = 1.0;
        bool done = false;
        for (int it = 0; it < nb_iter && !done; ++it) {
            expand();
            // lambda-escalated backward (backward_with_lm semantics)
            bool diverged = false, first = true;
            while ((first || diverged) && lm <= max_l) {
                first = false;
                int fail = bsp_backward_cpu(Q, q, R, r, P, pv, F, G, X, Y, Z,
                                            Tm, U, Vm, lm, 1, T, b, a,
                                            K, kff, dS);
                diverged = fail != 0;
                if (diverged) {
                    dlm = std::max(dlm * mult_l, mult_l);
                    lm = std::max(lm * dlm, min_l);
                }
            }
            double gn0 = 0.0, gn1 = 0.0;
            for (int t = 0; t < T; ++t) {
                gn0 = std::max(gn0, std::fabs(kff[t * a]) / (std::fabs(uref[t * a]) + 1.0));
                gn1 = std::max(gn1, std::fabs(kff[t * a + 1]) / (std::fabs(uref[t * a + 1]) + 1.0));
            }
            bool grad_done = 0.5 * (gn0 + gn1) < tolgrad && lm < 1e-5;

            int idx = -1;
            for (int ai = 0; ai < NA; ++ai) {
                rets[ai] = rollout(alphas[ai], nmu + ai * (T + 1) * b,
                                   nsig + ai * (T + 1) * bb, nu + ai * T * a);
                double expd = -alphas[ai] * (dS[0] + alphas[ai] * dS[1]);
                double imp = (last_ret - rets[ai]) / expd;
                if (idx < 0 && imp > min_imp && !diverged && std::isfinite(rets[ai]))
                    idx = ai;
            }
            bool accepted = idx >= 0;
            double dlm_acc = std::min(dlm / mult_l, 1.0 / mult_l);
            double lm_acc = lm * dlm_acc * (lm > min_l ? 1.0 : 0.0);
            double dlm_rej = std::max(dlm * mult_l, mult_l);
            double lm_rej = std::max(lm * dlm_rej, min_l);
            bool take = accepted && !grad_done;
            if (take) {
                double dret = last_ret - rets[idx];
                std::memcpy(bmu, nmu + idx * (T + 1) * b, sizeof(double) * (T + 1) * b);
                std::memcpy(bsig, nsig + idx * (T + 1) * bb, sizeof(double) * (T + 1) * bb);
                std::memcpy(uref, nu + idx * T * a, sizeof(double) * T * a);
                last_ret = rets[idx];
                lm = lm_acc; dlm = dlm_acc;
                if (dret < tolfun) done = true;
            } else {
                lm = lm_rej; dlm = dlm_rej;
            }
            if (grad_done || (!accepted && lm_rej > max_l)) done = true;
        }
        // closing EKF update of the MPC step (predict at u0 + innovate, H = I)
        {
            double f[B], W[BB], phi[BB];
            ekf_step(bmu, bsig, uref, f, W, phi);
            (void)f; (void)W; (void)phi;
        }
        Kacc[0] += K[0]; kacc[0] += kff[0];  // defeat dead-code elimination
    }
    auto end = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(end - start).count();
    volatile double sink = Kacc[0] + kacc[0]; (void)sink;

    delete[] bmu; delete[] bsig; delete[] uref; delete[] Q; delete[] q;
    delete[] R; delete[] r; delete[] P; delete[] pv; delete[] F; delete[] G;
    delete[] X; delete[] Y; delete[] Z; delete[] Tm; delete[] U; delete[] Vm;
    delete[] K; delete[] kff; delete[] Kacc; delete[] kacc;
    delete[] nmu; delete[] nsig; delete[] nu;
    return secs;
}

double gps_dual_chain_bench(
    const double* Cxx, const double* cx, const double* Cuu, const double* cu,
    const double* Cxu, const double* c0, const double* A, const double* B,
    const double* cvec, const double* Sdyn, const double* K, const double* kff,
    const double* Sctl, const double* alpha, const double* mu0,
    const double* sigma0, int T, int dx, int du, int reps, double* out) {
    auto start = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; ++r)
        gps_dual_chain_cpu(Cxx, cx, Cuu, cu, Cxu, c0, A, B, cvec, Sdyn,
                           K, kff, Sctl, alpha, mu0, sigma0, T, dx, du, out);
    auto end = std::chrono::steady_clock::now();
    return std::chrono::duration<double>(end - start).count();
}

}  // extern "C"
