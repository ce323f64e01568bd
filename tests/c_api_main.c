/* C-caller smoke test for the dlaf_tpu C API (dlaf_tpu_c.h): builds an SPD
 * matrix in ScaLAPACK column-major layout, runs pdpotrf and pdsyevd through
 * the embedded-runtime shim, and checks residuals in plain C — the analog
 * of the reference's C API tests (test/unit/c_api). Compiled and executed
 * by tests/test_c_api.py. */
#include "dlaf_tpu_c.h"

#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#define N 64
#define NB 16
#define AT(a, i, j) (a)[(size_t)(j) * N + (i)] /* column-major, lld = N */

int main(void) {
  static double g[N * N], a[N * N], a0[N * N], l[N * N];
  static double w[N], z[N * N];
  int desca[9] = {1, 0, N, N, NB, NB, 0, 0, N};
  unsigned long long seed = 42ull;
  int i, j, k;

  for (j = 0; j < N; ++j)
    for (i = 0; i < N; ++i) {
      seed = seed * 6364136223846793005ull + 1442695040888963407ull;
      AT(g, i, j) = (double)((seed >> 33) & 0xffff) / 65536.0 - 0.5;
    }
  /* a = g g^T + N I (SPD), symmetric by construction */
  for (j = 0; j < N; ++j)
    for (i = 0; i < N; ++i) {
      double s = (i == j) ? (double)N : 0.0;
      for (k = 0; k < N; ++k) s += AT(g, i, k) * AT(g, j, k);
      AT(a, i, j) = s;
      AT(a0, i, j) = s;
    }

  if (dlaf_initialize() != 0) return 1;
  int ctx = dlaf_create_grid(2, 2);
  if (ctx < 0) return 2;

  if (dlaf_pdpotrf('L', N, a, 1, 1, desca, ctx) != 0) return 3;
  /* residual ||L L^T - A||_max */
  double res = 0.0;
  for (j = 0; j < N; ++j)
    for (i = 0; i < N; ++i) AT(l, i, j) = (i >= j) ? AT(a, i, j) : 0.0;
  for (j = 0; j < N; ++j)
    for (i = 0; i < N; ++i) {
      double s = 0.0;
      for (k = 0; k < N; ++k) s += AT(l, i, k) * AT(l, j, k);
      double d = fabs(s - AT(a0, i, j));
      if (d > res) res = d;
    }
  if (res > 1e-8 * N) {
    fprintf(stderr, "potrf residual %g\n", res);
    return 4;
  }

  if (dlaf_pdsyevd('L', N, a0, desca, w, z, ctx) != 0) return 5;
  /* residual ||A z_0 - w_0 z_0||_max on a few eigenpairs */
  double rese = 0.0;
  for (int c = 0; c < N; c += 17) {
    for (i = 0; i < N; ++i) {
      double s = 0.0;
      for (k = 0; k < N; ++k) s += AT(a0, i, k) * AT(z, k, c);
      double d = fabs(s - w[c] * AT(z, i, c));
      if (d > rese) rese = d;
    }
  }
  if (rese > 1e-8 * N * N) {
    fprintf(stderr, "syevd residual %g\n", rese);
    return 6;
  }
  for (i = 1; i < N; ++i)
    if (w[i] < w[i - 1]) return 7; /* ascending eigenvalues */

  dlaf_free_grid(ctx);
  printf("c_api: potrf res %.2e, syevd res %.2e OK\n", res, rese);
  return 0;
}
