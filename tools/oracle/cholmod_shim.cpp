/* Dense-Cholesky implementation of the CHOLMOD API subset used by the
 * reference LinearSFM (see shim/suitesparse/cholmod.h). Correct for the
 * symmetric positive-definite reduced camera systems the reference feeds it;
 * ignores orderings (they affect speed, not values).
 */
#include "suitesparse/cholmod.h"

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>

/* Debug aid: CHOLMOD_SHIM_DUMP=<prefix> dumps each solve's dense system to
 * <prefix>_<k>_{A,b,x}.txt so the oracle's exact linear systems can be
 * compared against the TPU implementation's. */
static int g_solve_count = 0;

extern "C" {

int cholmod_start(cholmod_common *c) {
  std::memset(c, 0, sizeof(*c));
  return 1;
}
int cholmod_finish(cholmod_common *) { return 1; }

cholmod_sparse *cholmod_allocate_sparse(size_t nrow, size_t ncol, size_t nzmax,
                                        int sorted, int packed, int stype,
                                        int xtype, cholmod_common *) {
  cholmod_sparse *A = (cholmod_sparse *)std::calloc(1, sizeof(cholmod_sparse));
  A->nrow = nrow;
  A->ncol = ncol;
  A->nzmax = nzmax;
  A->p = std::calloc(ncol + 1, sizeof(int));
  A->i = std::calloc(nzmax ? nzmax : 1, sizeof(int));
  A->x = std::calloc(nzmax ? nzmax : 1, sizeof(double));
  A->stype = stype;
  A->sorted = sorted;
  A->packed = packed;
  A->xtype = xtype;
  return A;
}

cholmod_dense *cholmod_zeros(size_t nrow, size_t ncol, int xtype,
                             cholmod_common *) {
  cholmod_dense *X = (cholmod_dense *)std::calloc(1, sizeof(cholmod_dense));
  X->nrow = nrow;
  X->ncol = ncol;
  X->d = nrow;
  X->x = std::calloc(nrow * ncol ? nrow * ncol : 1, sizeof(double));
  X->xtype = xtype;
  return X;
}

int cholmod_amd(cholmod_sparse *A, int *, size_t, int *perm, cholmod_common *) {
  for (size_t k = 0; k < A->ncol; ++k) perm[k] = (int)k;
  return 1;
}

cholmod_factor *cholmod_analyze(cholmod_sparse *A, cholmod_common *) {
  cholmod_factor *F = (cholmod_factor *)std::calloc(1, sizeof(cholmod_factor));
  F->n = A->ncol;
  F->L = nullptr;
  return F;
}

cholmod_factor *cholmod_analyze_p(cholmod_sparse *A, int *, int *, size_t,
                                  cholmod_common *c) {
  return cholmod_analyze(A, c);
}

int cholmod_factorize(cholmod_sparse *A, cholmod_factor *F, cholmod_common *) {
  const size_t n = A->ncol;
  const int *Ap = (const int *)A->p;
  const int *Ai = (const int *)A->i;
  const double *Ax = (const double *)A->x;
  if (!F->L) F->L = (double *)std::calloc(n * n ? n * n : 1, sizeof(double));
  double *M = F->L;
  std::memset(M, 0, n * n * sizeof(double));
  /* stype=1: upper triangle stored column-wise; symmetrize into dense */
  for (size_t col = 0; col < n; ++col) {
    for (int k = Ap[col]; k < Ap[col + 1]; ++k) {
      size_t row = (size_t)Ai[k];
      M[row * n + col] = Ax[k];
      M[col * n + row] = Ax[k];
    }
  }
  const char *dump = std::getenv("CHOLMOD_SHIM_DUMP");
  if (dump) {
    char name[512];
    std::snprintf(name, sizeof name, "%s_%d_A.txt", dump, g_solve_count);
    FILE *fh = std::fopen(name, "w");
    for (size_t r = 0; r < n; ++r) {
      for (size_t c2 = 0; c2 < n; ++c2)
        std::fprintf(fh, "%.17g ", M[r * n + c2]);
      std::fprintf(fh, "\n");
    }
    std::fclose(fh);
  }
  /* in-place dense Cholesky (lower) */
  for (size_t j = 0; j < n; ++j) {
    double diag = M[j * n + j];
    for (size_t k = 0; k < j; ++k) diag -= M[j * n + k] * M[j * n + k];
    if (diag <= 0.0) diag = 1e-300; /* mirror CHOLMOD tolerance behaviour */
    diag = std::sqrt(diag);
    M[j * n + j] = diag;
    for (size_t i2 = j + 1; i2 < n; ++i2) {
      double s = M[i2 * n + j];
      for (size_t k = 0; k < j; ++k) s -= M[i2 * n + k] * M[j * n + k];
      M[i2 * n + j] = s / diag;
    }
  }
  return 1;
}

cholmod_dense *cholmod_solve(int, cholmod_factor *F, cholmod_dense *B,
                             cholmod_common *c) {
  const size_t n = F->n;
  cholmod_dense *X = cholmod_zeros(n, 1, CHOLMOD_REAL, c);
  double *x = (double *)X->x;
  const double *b = (const double *)B->x;
  const double *L = F->L;
  /* L y = b */
  for (size_t i = 0; i < n; ++i) {
    double s = b[i];
    for (size_t k = 0; k < i; ++k) s -= L[i * n + k] * x[k];
    x[i] = s / L[i * n + i];
  }
  /* L^T x = y */
  for (size_t ii = n; ii-- > 0;) {
    double s = x[ii];
    for (size_t k = ii + 1; k < n; ++k) s -= L[k * n + ii] * x[k];
    x[ii] = s / L[ii * n + ii];
  }
  const char *dump = std::getenv("CHOLMOD_SHIM_DUMP");
  if (dump) {
    char name[512];
    std::snprintf(name, sizeof name, "%s_%d_b.txt", dump, g_solve_count);
    FILE *fh = std::fopen(name, "w");
    for (size_t k = 0; k < n; ++k) std::fprintf(fh, "%.17g\n", b[k]);
    std::fclose(fh);
    std::snprintf(name, sizeof name, "%s_%d_x.txt", dump, g_solve_count);
    fh = std::fopen(name, "w");
    for (size_t k = 0; k < n; ++k) std::fprintf(fh, "%.17g\n", x[k]);
    std::fclose(fh);
    ++g_solve_count;
  }
  return X;
}

int cholmod_free_factor(cholmod_factor **L, cholmod_common *) {
  if (L && *L) {
    std::free((*L)->L);
    std::free(*L);
    *L = nullptr;
  }
  return 1;
}
int cholmod_free_sparse(cholmod_sparse **A, cholmod_common *) {
  if (A && *A) {
    std::free((*A)->p);
    std::free((*A)->i);
    std::free((*A)->x);
    std::free(*A);
    *A = nullptr;
  }
  return 1;
}
int cholmod_free_dense(cholmod_dense **X, cholmod_common *) {
  if (X && *X) {
    std::free((*X)->x);
    std::free(*X);
    *X = nullptr;
  }
  return 1;
}

}  /* extern "C" */
