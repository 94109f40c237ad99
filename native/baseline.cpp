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
    double* tmp_xu = new double[xu]; double* tmp_uu = new double[uu];
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
        double* crossT = new double[du * dx];   // K sig_x  (du, dx)
        double* KS = new double[du * dx];
        double* qlam = new double[uu]; double* qscr = new double[uu];
        double* dK = new double[du * dx]; double* dk = new double[du];
        double* AB = new double[dx * (dx + du)];
        double* SA = new double[(dx + du) * (dx + du)];
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
            chol_fact(qscr, du);
            double logdet_q = logdet_from_fact(qscr, du);
            for (int i = 0; i < uu; ++i) qlam[i] = 0.0;
            for (int i = 0; i < du; ++i) qlam[i * du + i] = 1.0;
            chol_solve_fact(qscr, qlam, du, du);
            std::memcpy(scr, nSt, sizeof(double) * uu);
            chol_fact(scr, du);
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
        delete[] crossT; delete[] KS; delete[] qlam; delete[] qscr;
        delete[] dK; delete[] dk; delete[] AB; delete[] SA; delete[] sig_xu;
        delete[] ABS;
    }

    out[0] = dual;
    out[1] = kl_sum;

    delete[] agCxx; delete[] agcx; delete[] agCuu; delete[] agcu; delete[] agCxu;
    delete[] agc0; delete[] lam; delete[] scr; delete[] tmp_xu; delete[] tmp_uu;
    delete[] tmp_du; delete[] V; delete[] v; delete[] newK; delete[] newk;
    delete[] newS; delete[] Vfull0; delete[] vfull0; delete[] VA; delete[] VB;
    delete[] Qxx; delete[] Quu; delete[] Qux; delete[] qx; delete[] qu; delete[] Vc;
    return fail;
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
