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
