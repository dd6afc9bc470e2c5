// Sparse LDL' factorization for quasi-definite KKT systems.
//
// The native direct linear-system core of the numpy backend - the analogue of
// the QDLDL solver the reference's `builtin` algebra links (reference
// CMakeLists.txt:45-46; the C core fetches QDLDL as its direct solver).
// Implements the classic up-looking LDL' algorithm with an elimination-tree
// symbolic phase; no pivoting (valid for the quasi-definite ADMM KKT matrix
// [[P+sigma I, A'],[A, -diag(1/rho)]]).  The sign count of D gives the matrix
// inertia, which is the non-convexity detector (n positive entries required).
//
// C ABI for ctypes; all matrices are upper-triangular CSC with int32 indices.

#include <cstdint>
#include <cstring>

extern "C" {

// Symbolic analysis: computes the elimination tree and column counts.
// Ap/Ai: upper-triangular CSC pattern (diagonal must be present).
// Outputs: parent[n], Lnz[n] (nnz per L column, strictly-lower).
// Returns total nnz(L) >= 0, or -1 on invalid input.
int32_t ldl_symbolic(int32_t n, const int32_t* Ap, const int32_t* Ai,
                     int32_t* parent, int32_t* Lnz, int32_t* flag) {
    for (int32_t k = 0; k < n; ++k) {
        parent[k] = -1;
        flag[k] = k;
        Lnz[k] = 0;
        bool has_diag = false;
        for (int32_t p = Ap[k]; p < Ap[k + 1]; ++p) {
            int32_t i = Ai[p];
            if (i > k) return -1;  // not upper triangular
            if (i == k) has_diag = true;
            // walk up the elimination tree from i to the root or to k
            while (flag[i] != k) {
                if (parent[i] == -1) parent[i] = k;
                Lnz[i]++;
                flag[i] = k;
                i = parent[i];
            }
        }
        if (!has_diag) return -1;
    }
    int64_t total = 0;
    for (int32_t k = 0; k < n; ++k) total += Lnz[k];
    return (total > INT32_MAX) ? -1 : (int32_t)total;
}

// Numeric factorization A = L D L' (L unit lower triangular, CSC).
// Lp must be the prefix sum of Lnz (length n+1).  Work arrays: Y (float64,n),
// pattern/stack/flag/lnz_cur (int32, n).
// Returns the number of POSITIVE entries of D, or -(k+1) if D[k] == 0.
int32_t ldl_numeric(int32_t n, const int32_t* Ap, const int32_t* Ai,
                    const double* Ax, const int32_t* parent, const int32_t* Lp,
                    int32_t* Li, double* Lx, double* D, double* Dinv,
                    double* Y, int32_t* pattern, int32_t* stack, int32_t* flag,
                    int32_t* lnz_cur) {
    int32_t n_pos = 0;
    for (int32_t k = 0; k < n; ++k) {
        Y[k] = 0.0;
        flag[k] = k;
        lnz_cur[k] = (k == 0) ? lnz_cur[k] : lnz_cur[k];  // init below
    }
    for (int32_t k = 0; k < n; ++k) lnz_cur[k] = 0;

    for (int32_t k = 0; k < n; ++k) {
        int32_t top = n;
        flag[k] = k;
        for (int32_t p = Ap[k]; p < Ap[k + 1]; ++p) {
            int32_t i = Ai[p];
            Y[i] += Ax[p];
            int32_t len = 0;
            while (flag[i] != k) {
                pattern[len++] = i;
                flag[i] = k;
                i = parent[i];
            }
            while (len > 0) stack[--top] = pattern[--len];
        }
        double dk = Y[k];
        Y[k] = 0.0;
        for (int32_t s = top; s < n; ++s) {
            int32_t i = stack[s];
            double yi = Y[i];
            Y[i] = 0.0;
            int32_t p2 = Lp[i] + lnz_cur[i];
            for (int32_t p = Lp[i]; p < p2; ++p) Y[Li[p]] -= Lx[p] * yi;
            double l_ki = yi / D[i];
            dk -= l_ki * yi;
            Li[p2] = k;
            Lx[p2] = l_ki;
            lnz_cur[i]++;
        }
        if (dk == 0.0) return -(k + 1);
        D[k] = dk;
        Dinv[k] = 1.0 / dk;
        if (dk > 0.0) n_pos++;
    }
    return n_pos;
}

// Solve L D L' x = b in place (x holds b on entry, solution on exit).
void ldl_solve(int32_t n, const int32_t* Lp, const int32_t* Li,
               const double* Lx, const double* Dinv, double* x) {
    for (int32_t j = 0; j < n; ++j) {
        double xj = x[j];
        for (int32_t p = Lp[j]; p < Lp[j + 1]; ++p) x[Li[p]] -= Lx[p] * xj;
    }
    for (int32_t j = 0; j < n; ++j) x[j] *= Dinv[j];
    for (int32_t j = n - 1; j >= 0; --j) {
        double xj = x[j];
        for (int32_t p = Lp[j]; p < Lp[j + 1]; ++p) xj -= Lx[p] * x[Li[p]];
        x[j] = xj;
    }
}

// Batched multi-RHS solve (column-major X, n x k).
void ldl_solve_multi(int32_t n, int32_t k, const int32_t* Lp, const int32_t* Li,
                     const double* Lx, const double* Dinv, double* X) {
    for (int32_t c = 0; c < k; ++c) ldl_solve(n, Lp, Li, Lx, Dinv, X + (int64_t)c * n);
}

}  // extern "C"
