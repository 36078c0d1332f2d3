/* Minimal CHOLMOD API shim for the LinearSFM oracle build.
 *
 * Implements just the entry points the reference calls
 * (LinearSFMImp.cpp:2380-2449, :7043-7121, constructors at :2340-2351) with a
 * dense Cholesky backend (tools/oracle/cholmod_shim.cpp). Orderings are
 * accepted and ignored — they only affect fill-in, not results.
 */
#pragma once
#include <cstddef>

#define CHOLMOD_PATTERN 0
#define CHOLMOD_REAL 1
#define CHOLMOD_INT 0
#define CHOLMOD_DOUBLE 0
#define CHOLMOD_A 0
#define CHOLMOD_GIVEN 2
#define CHOLMOD_AMD 1

typedef struct cholmod_method_struct {
  int ordering;
} cholmod_method;

typedef struct cholmod_common_struct {
  int nmethods;
  cholmod_method method[10];
  int status;
} cholmod_common;

typedef struct cholmod_sparse_struct {
  size_t nrow, ncol, nzmax;
  void *p;  /* column pointers (int) */
  void *i;  /* row indices (int) */
  void *nz;
  void *x;  /* values (double) */
  void *z;
  int stype;
  int itype, xtype, dtype;
  int sorted, packed;
} cholmod_sparse;

typedef struct cholmod_dense_struct {
  size_t nrow, ncol, nzmax, d;
  void *x;
  void *z;
  int xtype, dtype;
} cholmod_dense;

typedef struct cholmod_factor_struct {
  size_t n;
  double *val;  /* skyline-packed rows: row i holds cols first[i]..i */
  long *first;  /* first nonzero column per row (profile) */
  long *rp;     /* row start offsets into val (n+1) */
} cholmod_factor;

extern "C" {
int cholmod_start(cholmod_common *c);
int cholmod_finish(cholmod_common *c);
cholmod_sparse *cholmod_allocate_sparse(size_t nrow, size_t ncol, size_t nzmax,
                                        int sorted, int packed, int stype,
                                        int xtype, cholmod_common *c);
cholmod_dense *cholmod_zeros(size_t nrow, size_t ncol, int xtype,
                             cholmod_common *c);
int cholmod_amd(cholmod_sparse *A, int *fset, size_t fsize, int *perm,
                cholmod_common *c);
cholmod_factor *cholmod_analyze(cholmod_sparse *A, cholmod_common *c);
cholmod_factor *cholmod_analyze_p(cholmod_sparse *A, int *perm, int *fset,
                                  size_t fsize, cholmod_common *c);
int cholmod_factorize(cholmod_sparse *A, cholmod_factor *L, cholmod_common *c);
cholmod_dense *cholmod_solve(int sys, cholmod_factor *L, cholmod_dense *B,
                             cholmod_common *c);
int cholmod_free_factor(cholmod_factor **L, cholmod_common *c);
int cholmod_free_sparse(cholmod_sparse **A, cholmod_common *c);
int cholmod_free_dense(cholmod_dense **X, cholmod_common *c);
}
