/* Plain-C CBLAS shim (see cblas.h). Column-major only, as used by the
 * reference (src/flappie_matrix.c, src/layers.c). */
#include <assert.h>
#include <stdlib.h>

#include "cblas.h"

/* element of column-major A (lda = leading dim) honouring transpose */
static inline float at(const float *A, int lda, int trans, int i, int j) {
    return trans ? A[(size_t)i * lda + j] : A[(size_t)j * lda + i];
}

void cblas_sgemm(const enum CBLAS_ORDER order,
                 const enum CBLAS_TRANSPOSE transA,
                 const enum CBLAS_TRANSPOSE transB,
                 const int M, const int N, const int K,
                 const float alpha, const float *A, const int lda,
                 const float *B, const int ldb,
                 const float beta, float *C, const int ldc) {
    assert(order == CblasColMajor);
    const int ta = (transA != CblasNoTrans);
    const int tb = (transB != CblasNoTrans);
    for (int j = 0; j < N; j++) {
        for (int i = 0; i < M; i++) {
            float acc = 0.0f;
            for (int k = 0; k < K; k++) {
                acc += at(A, lda, ta, i, k) * at(B, ldb, tb, k, j);
            }
            float *c = C + (size_t)j * ldc + i;
            *c = alpha * acc + beta * (*c);
        }
    }
}

void cblas_sgemv(const enum CBLAS_ORDER order,
                 const enum CBLAS_TRANSPOSE transA,
                 const int M, const int N,
                 const float alpha, const float *A, const int lda,
                 const float *x, const int incx,
                 const float beta, float *y, const int incy) {
    assert(order == CblasColMajor);
    const int ta = (transA != CblasNoTrans);
    const int ny = ta ? N : M;
    const int nx = ta ? M : N;
    for (int i = 0; i < ny; i++) {
        float acc = 0.0f;
        for (int k = 0; k < nx; k++) {
            acc += (ta ? A[(size_t)i * lda + k] : A[(size_t)k * lda + i])
                   * x[(size_t)k * incx];
        }
        float *yi = y + (size_t)i * incy;
        *yi = alpha * acc + beta * (*yi);
    }
}
