"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so distributed (mesh) paths are
exercised without TPU hardware — the analog of the reference's
``mpiexec -n 6`` single-machine MPI testing (``cmake/DLAF_AddTest.cmake``).
x64 is enabled so float64/complex128 coverage matches the reference's
``{s,d,c,z}`` dtype matrix.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# jax may already be imported by the environment's sitecustomize with the TPU
# platform cached — override via config (env vars alone are too late).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(params=["float32", "float64", "complex64", "complex128"])
def dtype(request):
    return np.dtype(request.param)


@pytest.fixture(params=["float32", "float64"])
def real_dtype_p(request):
    return np.dtype(request.param)


def tol(dtype, n, factor=10.0):
    """eps-scaled residual bound (reference CHECK_MATRIX_NEAR style,
    test/include/dlaf_test/matrix/util_matrix.h:218-283)."""
    import dlaf_tpu.types as t
    return factor * n * t.eps(dtype)
