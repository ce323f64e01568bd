"""Pallas TPU kernels, validated in interpreter mode on CPU
(the analog of the reference's GPU-kernel unit tests run in CI without GPUs).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlaf_tpu.matrix import generators as gen


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


@pytest.mark.parametrize("nb", [64, 128, 256])
def test_pallas_potrf_tile(nb, interpret_pallas):
    from dlaf_tpu.ops.pallas.potrf import potrf_tile
    a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(0), nb, jnp.float32)
    l = np.asarray(potrf_tile(a))
    ref = np.linalg.cholesky(np.asarray(a))
    assert np.max(np.abs(l - ref)) < 1e-4 * nb
    assert np.max(np.abs(np.triu(l, 1))) == 0.0


@pytest.mark.parametrize("left", [True, False])
@pytest.mark.parametrize("lower", [True, False])
@pytest.mark.parametrize("trans", ["N", "T"])
def test_trsm_tile_inverted_block(left, lower, trans):
    from dlaf_tpu.ops.pallas.trsm import trsm_tile
    n, m = 128, 96
    a = gen.random_triangular(jax.random.PRNGKey(1), n, np.dtype("float64"), lower=lower)
    bshape = (n, m) if left else (m, n)
    b = gen.random_general(jax.random.PRNGKey(2), bshape, np.dtype("float64"))
    x = np.asarray(trsm_tile(a, b, left=left, lower=lower, trans=trans, unit=False))
    an = np.asarray(a)
    opa = an.T if trans == "T" else an
    lhs = opa @ x if left else x @ opa
    assert np.max(np.abs(lhs - np.asarray(b))) < 1e-9


@pytest.mark.parametrize("shape", [(128, 128, 128), (256, 384, 512),
                                   (512, 256, 1024)])
def test_ksub_matmul(shape):
    """Fused trailing update C - X^T Y (ops/pallas/trailing.py) vs the
    reference formula at f32 accuracy (bf16_3x both sides)."""
    from dlaf_tpu.ops.pallas.trailing import ksub_matmul

    m, n, k = shape
    rng = np.random.default_rng(m + n + k)
    c = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((k, m)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    out = np.asarray(ksub_matmul(c, x, y, interpret=True))
    want = np.asarray(c) - np.asarray(x).T.astype(np.float64) @ \
        np.asarray(y).astype(np.float64)
    # bf16_3x error bound: ~k * eps_f32 relative
    bound = 32 * np.sqrt(k) * np.finfo(np.float32).eps * \
        np.abs(np.asarray(x)).max() * np.abs(np.asarray(y)).max() * np.sqrt(k)
    assert np.abs(out - want).max() <= bound, np.abs(out - want).max()


def test_potrf_upper_pallas_trailing_knob():
    """potrf_upper with the fused trailing kernel (interpret on CPU) matches
    the XLA path bit-for... numerically."""
    from dlaf_tpu.ops import blocked
    from dlaf_tpu.tune import get_tune_parameters, set_tune_parameters
    import dlaf_tpu.ops.pallas.trailing as tr

    n, nb = 256, 128
    rng = np.random.default_rng(5)
    g = rng.standard_normal((n, n)).astype(np.float32)
    a = jnp.asarray(g @ g.T + n * np.eye(n, dtype=np.float32))
    u0 = np.asarray(blocked.potrf_upper(a, nb))
    import functools
    old = get_tune_parameters().potrf_trailing_kernel
    orig_avail, orig_mm = tr.ksub_available, tr.ksub_matmul
    tr.ksub_available = lambda *a_, **k_: True
    tr.ksub_matmul = functools.partial(orig_mm, interpret=True)
    set_tune_parameters(potrf_trailing_kernel="pallas")
    try:
        u1 = np.asarray(blocked.potrf_upper(a, nb))
    finally:
        set_tune_parameters(potrf_trailing_kernel=old)
        tr.ksub_available, tr.ksub_matmul = orig_avail, orig_mm
    assert np.abs(u1 - u0).max() <= 1e-3 * np.abs(u0).max()


def test_ksub_matmul_nn():
    """NN variant (X (m, k)) of the fused trailing update."""
    from dlaf_tpu.ops.pallas.trailing import ksub_matmul

    m, n, k = 256, 256, 384
    rng = np.random.default_rng(42)
    c = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    out = np.asarray(ksub_matmul(c, x, y, interpret=True, x_k_major=False))
    want = np.asarray(c) - np.asarray(x).astype(np.float64) @ \
        np.asarray(y).astype(np.float64)
    bound = 64 * k * np.finfo(np.float32).eps * 16
    assert np.abs(out - want).max() <= bound, np.abs(out - want).max()


@pytest.mark.parametrize("x_k_major", [True, False])
def test_ksub_matmul_masked(x_k_major):
    """Masked (global-lower-triangle) fused trailing update: entries with
    grow < gcol keep C; the rest get C - op(X) Y (the distributed POTRF
    staircase chunk, algos/cholesky.py)."""
    from dlaf_tpu.ops.pallas.trailing import ksub_matmul_masked

    m, n, k = 256, 384, 256
    rng = np.random.default_rng(7)
    c = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    xs = (k, m) if x_k_major else (m, k)
    x = jnp.asarray(rng.standard_normal(xs).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    # global indices with an offset + stride pattern like a 2x3 grid shard
    grow = jnp.asarray((np.arange(m) * 2 + 128)[:, None].astype(np.int32))
    gcol = jnp.asarray((np.arange(n) * 3 + 64)[None, :].astype(np.int32))
    out = np.asarray(ksub_matmul_masked(c, x, y, grow, gcol, interpret=True,
                                        x_k_major=x_k_major))
    xn = np.asarray(x).astype(np.float64)
    prod = (xn.T if x_k_major else xn) @ np.asarray(y).astype(np.float64)
    keep = np.asarray(grow) >= np.asarray(gcol)
    want = np.where(keep, np.asarray(c) - prod, np.asarray(c))
    bound = 64 * k * np.finfo(np.float32).eps * 16
    assert np.abs(out - want).max() <= bound, np.abs(out - want).max()


@pytest.mark.parametrize("trail_chunks", [24, 1])
def test_dist_potrf_pallas_trailing_interpret(monkeypatch, trail_chunks):
    """Distributed POTRF with the fused trailing kernel forced on (interpret
    mode on CPU) matches the XLA path — exercises BOTH fused sites of the
    unrolled shard function: the panel-restricted rank-nb update in
    _tile_step_static (with its pl_end sentinel column bound) and the wide
    staircase chunks (algos/cholesky.py). trail_chunks=1 is the
    single-fused-chunk configuration bench_dist A/Bs (dead-block skip makes
    the triangle block-exact)."""
    import functools
    from dlaf_tpu.algos import cholesky as chol
    from dlaf_tpu.comm.mesh import Grid
    from dlaf_tpu.matrix.dist_matrix import DistMatrix
    from dlaf_tpu.tune import get_tune_parameters, set_tune_parameters

    n, nb = 256, 64
    a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(9), n,
                                               jnp.float32)
    grid = Grid((2, 2))
    dm = DistMatrix.from_global(a, nb, grid)
    tp = get_tune_parameters()
    old = tp.potrf_trailing_kernel
    old_tch = tp.potrf_dist_trail_chunks
    try:
        set_tune_parameters(potrf_trailing_kernel="xla",
                            potrf_dist_trail_chunks=trail_chunks)
        l0 = np.asarray(chol.cholesky(dm).to_global())
        # cholesky.py imports the kernel entry points by name: patch there
        monkeypatch.setattr(chol, "ksub_available", lambda *a_, **k_: True)
        monkeypatch.setattr(chol, "ksub_matmul_masked",
                            functools.partial(chol.ksub_matmul_masked,
                                              interpret=True))
        set_tune_parameters(potrf_trailing_kernel="pallas")
        l1 = np.asarray(chol.cholesky(dm).to_global())
    finally:
        set_tune_parameters(potrf_trailing_kernel=old,
                            potrf_dist_trail_chunks=old_tch)
    scale = np.abs(l0).max()
    assert np.abs(l1 - l0).max() <= 1e-3 * scale, np.abs(l1 - l0).max()


def test_dist_potrf_pallas_trailing_knob_cpu_fallback():
    """On CPU the 'pallas' trailing knob must be a no-op for the distributed
    path (ksub_available gates on backend), producing the same factor."""
    from dlaf_tpu.algos import cholesky as chol
    from dlaf_tpu.comm.mesh import Grid
    from dlaf_tpu.matrix.dist_matrix import DistMatrix
    from dlaf_tpu.tune import get_tune_parameters, set_tune_parameters

    n, nb = 128, 32
    a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(3), n,
                                               jnp.float32)
    grid = Grid((2, 2))
    dm = DistMatrix.from_global(a, nb, grid)
    old = get_tune_parameters().potrf_trailing_kernel
    try:
        set_tune_parameters(potrf_trailing_kernel="xla")
        l0 = chol.cholesky(dm).to_global()
        set_tune_parameters(potrf_trailing_kernel="pallas")
        l1 = chol.cholesky(dm).to_global()
    finally:
        set_tune_parameters(potrf_trailing_kernel=old)
    assert np.abs(np.asarray(l0) - np.asarray(l1)).max() == 0.0
