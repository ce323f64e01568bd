/* C API for dlaf_tpu — the analog of the reference's include/dlaf_c/
 * (init.h, grid.h, desc.h, factorization/cholesky.h:74-86,
 * eigensolver/eigensolver.h:36-55): a C/Fortran-callable surface over the
 * TPU-native library.
 *
 * Execution model difference vs the reference (documented, deliberate):
 * DLA-Future's C API is MPI-rank-local — every rank passes its local
 * block-cyclic tiles. dlaf_tpu is a single-controller SPMD library (one
 * host process drives the whole device mesh), so the C API takes the
 * GLOBAL column-major matrix on the calling process and the library
 * scatters it onto the mesh; the ScaLAPACK descriptor keeps its standard
 * 9-integer layout (dtype, ctxt, m, n, mb, nb, rsrc, csrc, lld).
 *
 * All functions return 0 on success, <0 on error (-1 interpreter/library
 * failure; potrf returns the LAPACK-style info > 0 for a non-SPD leading
 * minor).
 */
#ifndef DLAF_TPU_C_H
#define DLAF_TPU_C_H

#ifdef __cplusplus
extern "C" {
#endif

/* Start the embedded runtime (idempotent). */
int dlaf_initialize(void);
/* Shut it down (idempotent; safe to skip at process exit). */
int dlaf_finalize(void);

/* Register a (nprow, npcol) device grid; returns a context handle >= 0
 * (reference dlaf_create_grid, include/dlaf_c/grid.h:31-71). */
int dlaf_create_grid(int nprow, int npcol);
int dlaf_free_grid(int ctx);

/* Cholesky factorization, global column-major a (n x n, lld >= n).
 * (reference dlaf_pspotrf/pdpotrf, include/dlaf_c/factorization/cholesky.h) */
int dlaf_pspotrf(char uplo, int n, float* a, int ia, int ja,
                 const int* desca, int ctx);
int dlaf_pdpotrf(char uplo, int n, double* a, int ia, int ja,
                 const int* desca, int ctx);
/* complex variants: a points to interleaved (re, im) pairs
 * (C99 float/double _Complex or Fortran COMPLEX layout) */
int dlaf_pcpotrf(char uplo, int n, void* a, int ia, int ja,
                 const int* desca, int ctx);
int dlaf_pzpotrf(char uplo, int n, void* a, int ia, int ja,
                 const int* desca, int ctx);

/* Symmetric eigensolver: eigenvalues into w (n), eigenvectors into z
 * (n x n column-major). (reference dlaf_pssyevd/pdsyevd) */
int dlaf_pssyevd(char uplo, int n, float* a, const int* desca,
                 float* w, float* z, int ctx);
int dlaf_pdsyevd(char uplo, int n, double* a, const int* desca,
                 double* w, double* z, int ctx);
/* hermitian: complex a/z, REAL eigenvalues w (float/double) */
int dlaf_pcheevd(char uplo, int n, void* a, const int* desca,
                 float* w, void* z, int ctx);
int dlaf_pzheevd(char uplo, int n, void* a, const int* desca,
                 double* w, void* z, int ctx);

#ifdef __cplusplus
}
#endif

#endif /* DLAF_TPU_C_H */
