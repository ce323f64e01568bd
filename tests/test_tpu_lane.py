"""Hardware (TPU) test lane — run with ``DLAF_TPU_TESTS=1 pytest -m tpu``.

Covers exactly what the CPU lane cannot: the Pallas MXU kernels and the
local drivers compiled for the real chip (incl. the axon-backend kernel
auto-selection). Sizes are modest so the lane stays a fast gate; bench.py
covers performance at scale.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

F32 = jnp.float32


def _spd(n, key=0):
    m = jax.random.normal(jax.random.PRNGKey(key), (n, n), F32)
    return (m @ m.T) / n + 2.0 * jnp.eye(n, dtype=F32)


def test_pallas_potrf_tile():
    from dlaf_tpu.ops.pallas.potrf import potrf_tile
    n = 256
    a = _spd(n)
    bound = 100 * n * np.finfo(np.float32).eps * float(jnp.max(jnp.abs(a)))
    for upper in (False, True):
        f = np.asarray(potrf_tile(a, upper=upper))
        rec = f.T @ f if upper else f @ f.T
        assert np.max(np.abs(rec - np.asarray(a))) < bound


def test_pallas_trsm_tile():
    from dlaf_tpu.ops.pallas.trsm import trsm_tile
    a = _spd(256)
    l = np.linalg.cholesky(np.asarray(a))
    b = jax.random.normal(jax.random.PRNGKey(1), (256, 128), F32)
    x = np.asarray(trsm_tile(jnp.asarray(l), b, left=True, lower=True,
                             trans="N", unit=False))
    assert np.max(np.abs(l @ x - np.asarray(b))) < 1e-3


def test_local_potrf_residual():
    import dlaf_tpu as dt
    n = 2048
    a = _spd(n)
    for uplo in ("L", "U"):
        f = np.asarray(dt.potrf(a, uplo=uplo, nb=256))
        rec = f @ f.T if uplo == "L" else f.T @ f
        res = np.max(np.abs(rec - np.asarray(a)))
        assert res < 1e-3, (uplo, res)


def test_pallas_band2tridiag_strips():
    from dlaf_tpu.algos.eigensolver.band_strips import (
        band_to_strips, band_to_tridiag_strips)
    from dlaf_tpu.ops.pallas.band2tridiag import band_to_tridiag_strips_pallas
    n, b = 512, 32
    a = _spd(n)
    rows = jnp.arange(n)
    bandm = jnp.where(jnp.abs(rows[:, None] - rows[None, :]) <= b, a, 0)
    strips = band_to_strips(bandm, b)
    strips_p = jnp.pad(strips, ((0, 3), (0, 0), (0, 0)))
    d_ref, e_ref, _, _ = band_to_tridiag_strips(strips, n, b)
    d, e, _, _ = band_to_tridiag_strips_pallas(strips_p, n, b)
    ev = np.linalg.eigvalsh(np.diag(np.asarray(d)[:n]) +
                            np.diag(np.asarray(e)[:n - 1], 1) +
                            np.diag(np.asarray(e)[:n - 1], -1))
    ref = np.linalg.eigvalsh(np.asarray(bandm))
    assert np.max(np.abs(ev - ref)) / max(np.max(np.abs(ref)), 1) < 1e-4


def test_local_eigh_residual():
    import dlaf_tpu as dt
    n = 512
    a = _spd(n)
    w, v = dt.eigh(a)
    w, v = np.asarray(w), np.asarray(v)
    an = np.asarray(a)
    orth = np.max(np.abs(v.T @ v - np.eye(n)))
    res = np.max(np.abs(an @ v - v * w[None, :]))
    assert orth < 5e-3 and res < 5e-3, (orth, res)


def test_tridiag_dc():
    from dlaf_tpu.algos.eigensolver.tridiag_dc import tridiag_eigh
    n = 1024
    d = jax.random.normal(jax.random.PRNGKey(0), (n,), F32)
    e = jax.random.normal(jax.random.PRNGKey(1), (n - 1,), F32)
    lam, q = tridiag_eigh(d, e)
    lam, q = np.asarray(lam), np.asarray(q)
    t = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1) + \
        np.diag(np.asarray(e), -1)
    assert np.max(np.abs(t @ q - q * lam[None, :])) < 5e-3
    assert np.max(np.abs(q.T @ q - np.eye(n))) < 5e-3


def test_ksub_matmul_masked_chip():
    """Masked fused trailing chunk (the distributed POTRF staircase) on the
    real chip: VMEM tril epilogue vs the XLA dot+select formulation."""
    from dlaf_tpu.ops.pallas.trailing import ksub_matmul_masked
    m, n, k = 512, 512, 512
    c = jax.random.normal(jax.random.PRNGKey(3), (m, n), F32)
    x = jax.random.normal(jax.random.PRNGKey(4), (m, k), F32)
    y = jax.random.normal(jax.random.PRNGKey(5), (k, n), F32)
    grow = jnp.arange(m, dtype=jnp.int32)[:, None] + 128
    gcol = jnp.arange(n, dtype=jnp.int32)[None, :]
    out = np.asarray(ksub_matmul_masked(c, x, y, grow, gcol,
                                        x_k_major=False))
    keep = np.asarray(grow) >= np.asarray(gcol)
    want = np.where(keep,
                    np.asarray(c) - np.asarray(
                        jnp.matmul(x, y, precision="high")),
                    np.asarray(c))
    assert np.abs(out - want).max() < 1e-2


def test_dist_potrf_pallas_trailing_chip():
    """Distributed POTRF (1x1 grid) with the fused masked trailing kernel
    matches the XLA trailing path on the chip."""
    from dlaf_tpu.algos import cholesky as chol
    from dlaf_tpu.comm.mesh import Grid
    from dlaf_tpu.matrix.dist_matrix import DistMatrix
    from dlaf_tpu.tune import get_tune_parameters, set_tune_parameters

    n, nb = 2048, 256
    a = _spd(n)
    grid = Grid((1, 1))
    dm = DistMatrix.from_global(a, nb, grid)
    old = get_tune_parameters().potrf_trailing_kernel
    try:
        set_tune_parameters(potrf_trailing_kernel="xla")
        l0 = np.asarray(chol.cholesky(dm).to_global())
        set_tune_parameters(potrf_trailing_kernel="pallas")
        l1 = np.asarray(chol.cholesky(dm).to_global())
    finally:
        set_tune_parameters(potrf_trailing_kernel=old)
    assert np.abs(l0 - l1).max() <= 1e-3 * max(np.abs(l0).max(), 1.0)


# ---------------------------------------------------------------------------
# dtype matrix on the chip (VERDICT r03 #6): the reference tests {s,d,c,z}
# on every backend (cmake/DLAF_AddTest.cmake:60-118). f32 is covered above;
# f64/c128 run the x64-EMULATION path (float32 exponent range — overflow
# yields NaN, see the clamps in tridiag_dc.py), c64 runs the two-plane
# Pallas kernels. Sizes modest: emulated f64 is ~10x slower per flop.


def _eps_eff(dtype):
    """Effective machine epsilon on this backend: the axon chip emulates
    f64 as a double-word f32 pair (~2^-48 relative), not IEEE binary64;
    f32/c64 are native."""
    if np.dtype(dtype).char in ("d", "D"):
        return 2.0 ** -48
    return float(np.finfo(np.float32).eps)


def _herm(n, dtype, key=2):
    from dlaf_tpu.matrix import generators as gen
    return gen.random_hermitian(jax.random.PRNGKey(key), n, jnp.dtype(dtype))


def _spd_t(n, dtype, key=3):
    from dlaf_tpu.matrix import generators as gen
    return gen.random_hermitian_positive_definite(
        jax.random.PRNGKey(key), n, jnp.dtype(dtype))


@pytest.mark.parametrize("dtype,n,nb", [
    ("float64", 512, 128),
    ("complex64", 512, 128),
    ("complex128", 256, 64),
])
def test_local_potrf_dtype_matrix_chip(dtype, n, nb):
    import dlaf_tpu as dt
    a = _spd_t(n, dtype)
    an = np.asarray(a)
    f = np.tril(np.asarray(dt.potrf(a, uplo="L", nb=nb)))
    res = np.abs(f @ f.conj().T - an).max()
    assert res <= 200 * n * _eps_eff(dtype) * np.abs(an).max(), (dtype, res)


@pytest.mark.parametrize("dtype,n,band", [
    ("float64", 256, 64),
    ("complex64", 512, 128),
])
def test_local_eigh_dtype_matrix_chip(dtype, n, band):
    import dlaf_tpu as dt
    a = _herm(n, dtype)
    w, v = dt.eigh(a, band=band)
    w, v = np.asarray(w), np.asarray(v)
    an = np.asarray(a)
    tol = 500 * n * _eps_eff(dtype) * max(np.abs(an).max(), 1.0)
    assert np.abs(v.conj().T @ v - np.eye(n)).max() <= tol
    assert np.abs(an @ v - v * w[None, :]).max() <= tol
    wref = np.linalg.eigvalsh(an)
    assert np.abs(w - wref).max() <= tol


def test_local_trsm_gemm_dtype_matrix_chip():
    """c64 TRSM + GEMM tile paths on the chip."""
    import dlaf_tpu as dt
    n = 256
    dtype = jnp.complex64
    l = jnp.asarray(np.linalg.cholesky(np.asarray(_spd_t(n, "complex64"))))
    b = _herm(n, "complex64", key=5)
    x = np.asarray(dt.trsm(l, b, side="L", uplo="L", trans="N", nb=64))
    res = np.abs(np.asarray(l) @ x - np.asarray(b)).max()
    assert res <= 100 * n * np.finfo(np.float32).eps * np.abs(x).max()
    c = np.asarray(dt.gemm(l, b))
    ref = np.asarray(l) @ np.asarray(b)
    assert np.abs(c - ref).max() <= \
        100 * n * np.finfo(np.float32).eps * np.abs(ref).max()
