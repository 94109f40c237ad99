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

}  // extern "C"
