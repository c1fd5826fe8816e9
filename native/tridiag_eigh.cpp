// Tridiagonal symmetric eigensolver: k smallest eigenpairs by Sturm-sequence
// bisection + inverse iteration (LAPACK xSTEBZ/xSTEIN style), float64.
//
// Native backend for the Kramers-Henneberger finite-difference ground truth
// (nnpde_tpu/pde/kh.py).  The reference densifies the (N-2)^2 Hamiltonian and
// calls a full eigensolver (KH_1D.py:63-68) — O(N^2) memory, O(N^3) work;
// this is O(N) memory and O(k N log(1/tol)) work.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Number of eigenvalues of T strictly less than x (Sturm sequence count).
int sturm_count(int n, const double* d, const double* e, double x) {
    int count = 0;
    double q = d[0] - x;
    if (q < 0) ++count;
    for (int i = 1; i < n; ++i) {
        double e2 = e[i - 1] * e[i - 1];
        if (q == 0.0) q = 1e-300;  // standard xSTEBZ safeguard
        q = d[i] - x - e2 / q;
        if (q < 0) ++count;
    }
    return count;
}

// Solve (T - lambda I) y = b in-place with partial-pivoting elimination.
// Returns false if the system is numerically singular beyond repair.
void tridiag_shifted_solve(int n, const double* d, const double* e,
                           double lambda, double* y) {
    // working copies of the three diagonals + fill-in band
    std::vector<double> a(n), b(n), c(n), f(n, 0.0);
    for (int i = 0; i < n; ++i) {
        a[i] = d[i] - lambda;
        b[i] = (i + 1 < n) ? e[i] : 0.0;  // super-diag
        c[i] = (i > 0) ? e[i - 1] : 0.0;  // sub-diag (symmetric)
    }
    const double eps = 1e-300;
    // forward elimination with row swaps
    for (int i = 0; i + 1 < n; ++i) {
        if (std::fabs(c[i + 1]) > std::fabs(a[i])) {
            std::swap(a[i], c[i + 1]);
            // after swapping rows i and i+1 the band pattern shifts:
            double t = b[i];
            b[i] = a[i + 1];
            a[i + 1] = t;
            t = f[i];
            f[i] = b[i + 1];
            b[i + 1] = t;
            std::swap(y[i], y[i + 1]);
        }
        if (std::fabs(a[i]) < eps) a[i] = eps;
        double m = c[i + 1] / a[i];
        a[i + 1] -= m * b[i];
        b[i + 1] -= m * f[i];
        y[i + 1] -= m * y[i];
    }
    if (std::fabs(a[n - 1]) < eps) a[n - 1] = (a[n - 1] < 0 ? -eps : eps);
    // back substitution (bandwidth 2 after pivoting)
    y[n - 1] /= a[n - 1];
    if (n >= 2) {
        y[n - 2] = (y[n - 2] - b[n - 2] * y[n - 1]) / a[n - 2];
    }
    for (int i = n - 3; i >= 0; --i) {
        y[i] = (y[i] - b[i] * y[i + 1] - f[i] * y[i + 2]) / a[i];
    }
}

double norm2(int n, const double* y) {
    double s = 0.0;
    for (int i = 0; i < n; ++i) s += y[i] * y[i];
    return std::sqrt(s);
}

}  // namespace

extern "C" {

// d (n,) diagonal, e (n-1,) off-diagonal, k requested smallest pairs.
// Outputs: w (k,) eigenvalues ascending, z (k, n) row-major eigenvectors
// (unit 2-norm).  Returns 0 on success.
int nnpde_tridiag_eigh(int n, const double* d, const double* e, int k,
                       double* w, double* z) {
    if (n <= 0 || k <= 0 || k > n) return 1;
    // Gershgorin bounds
    double lo = d[0], hi = d[0];
    for (int i = 0; i < n; ++i) {
        double r = 0.0;
        if (i > 0) r += std::fabs(e[i - 1]);
        if (i + 1 < n) r += std::fabs(e[i]);
        lo = std::min(lo, d[i] - r);
        hi = std::max(hi, d[i] + r);
    }
    const double span = hi - lo;
    const double tol = std::max(1e-14 * std::max(std::fabs(lo), std::fabs(hi)),
                                1e-300);

    // bisection for each of the k smallest eigenvalues
    for (int j = 0; j < k; ++j) {
        double a = lo, b = hi;
        for (int it = 0; it < 200 && (b - a) > tol + 1e-16 * span; ++it) {
            double mid = 0.5 * (a + b);
            if (sturm_count(n, d, e, mid) > j) {
                b = mid;
            } else {
                a = mid;
            }
        }
        w[j] = 0.5 * (a + b);
    }

    // inverse iteration per eigenvalue, re-orthogonalising clusters
    unsigned seed = 12345;
    auto frand = [&seed]() {
        seed = seed * 1664525u + 1013904223u;
        return (double)(seed >> 8) / (double)(1u << 24) - 0.5;
    };
    for (int j = 0; j < k; ++j) {
        double* y = z + (size_t)j * n;
        for (int i = 0; i < n; ++i) y[i] = frand();
        double nrm = norm2(n, y);
        for (int i = 0; i < n; ++i) y[i] /= nrm;
        // small shift off the exact eigenvalue stabilises the solve
        double shift = w[j] + 1e-12 * std::max(1.0, std::fabs(w[j]));
        for (int it = 0; it < 5; ++it) {
            tridiag_shifted_solve(n, d, e, shift, y);
            // re-orthogonalise against close previous vectors
            for (int p = 0; p < j; ++p) {
                if (std::fabs(w[p] - w[j]) < 1e-6 * std::max(1.0, span)) {
                    const double* zp = z + (size_t)p * n;
                    double dot = 0.0;
                    for (int i = 0; i < n; ++i) dot += zp[i] * y[i];
                    for (int i = 0; i < n; ++i) y[i] -= dot * zp[i];
                }
            }
            nrm = norm2(n, y);
            if (nrm < 1e-280) {  // degenerate start, retry random
                for (int i = 0; i < n; ++i) y[i] = frand();
                nrm = norm2(n, y);
            }
            for (int i = 0; i < n; ++i) y[i] /= nrm;
            if (nrm > 1e8 && it >= 1) break;  // converged (huge growth)
        }
    }
    return 0;
}

}  // extern "C"
