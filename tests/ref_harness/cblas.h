/* Minimal CBLAS shim for building the reference oracle.
 *
 * The build image has no BLAS development package, so the oracle links
 * against these plain-C loops instead of OpenBLAS.  Only the entry
 * points and parameter combinations the reference uses are needed
 * (column-major sgemm/sgemv, see src/flappie_matrix.c:384 and
 * src/layers.c:223-1009), but the implementations below are general
 * over the transpose flags.
 *
 * Summation runs in ascending-k order with a float accumulator; real
 * OpenBLAS kernels may round differently in the last ulp, which is the
 * same caveat that applies between any two BLAS builds the reference
 * itself links against.
 */
#pragma once

#ifdef __cplusplus
extern "C" {
#endif

enum CBLAS_ORDER { CblasRowMajor = 101, CblasColMajor = 102 };
enum CBLAS_TRANSPOSE { CblasNoTrans = 111, CblasTrans = 112, CblasConjTrans = 113 };

void cblas_sgemm(const enum CBLAS_ORDER order,
                 const enum CBLAS_TRANSPOSE transA,
                 const enum CBLAS_TRANSPOSE transB,
                 const int M, const int N, const int K,
                 const float alpha, const float *A, const int lda,
                 const float *B, const int ldb,
                 const float beta, float *C, const int ldc);

void cblas_sgemv(const enum CBLAS_ORDER order,
                 const enum CBLAS_TRANSPOSE transA,
                 const int M, const int N,
                 const float alpha, const float *A, const int lda,
                 const float *x, const int incx,
                 const float beta, float *y, const int incy);

#ifdef __cplusplus
}
#endif
