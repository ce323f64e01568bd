"""Test configuration.

Default lane: tests run on CPU with 8 virtual XLA devices so distributed
(mesh) paths are exercised without TPU hardware — the analog of the
reference's ``mpiexec -n 6`` single-machine MPI testing
(``cmake/DLAF_AddTest.cmake``). x64 is enabled so float64/complex128
coverage matches the reference's ``{s,d,c,z}`` dtype matrix.

TPU lane: ``DLAF_TPU_TESTS=1 python -m pytest tests -m tpu`` keeps the real
TPU backend (no platform override, f32 only) and runs the ``tpu``-marked
hardware tests — Pallas kernels and the local drivers on the actual chip.
"""
import os
import resource

# XLA's executable (de)serializer and some big compiled CPU programs
# recurse/allocate deeply; with the default 8 MiB stacks the
# persistent-compile-cache path and long full-suite runs segfault
# (observed: put/get_executable_and_time; round-5 full-suite SIGSEGV in
# _pjit_call_impl_python). A FINITE rlimit is deliberate: glibc uses the
# soft RLIMIT_STACK as the default pthread stack size only when it is
# finite, so this also covers XLA's worker threads (RLIM_INFINITY would
# leave them at the 8 MiB glibc default).
try:
    _hard = resource.getrlimit(resource.RLIMIT_STACK)[1]
    _want = 512 << 20
    if _hard != resource.RLIM_INFINITY:
        _want = min(_want, _hard)
    resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
except (ValueError, OSError):
    pass

TPU_LANE = os.environ.get("DLAF_TPU_TESTS") == "1"

if not TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not TPU_LANE:
    # jax may already be imported by the environment's sitecustomize with the
    # TPU platform cached — override via config (env vars alone are too late).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)  # both lanes: the reference tests
# {s,d,c,z} on every backend (cmake/DLAF_AddTest.cmake:60-118); on TPU f64
# runs through the x64-emulation path (float32 exponent range, see
# tests/test_tpu_lane.py dtype tests)

# persistent compile cache: repeat suite runs skip recompilation.
# The CPU lane uses its own MACHINE-KEYED directory (dlaf_tpu/cache.py):
# XLA:CPU AOT executables are machine-specific (the loader warns "Target
# machine feature ... could lead to execution errors such as SIGILL" when
# entries from a previous driver host are loaded, and the round-5
# full-suite segfault disappeared with a fresh dir; the workspace outlives
# the host, so a fixed dir is not enough). TPU-lane .jax_cache entries
# are compiled server-side and stay valid across driver hosts.
from dlaf_tpu.cache import cpu_cache_dir  # noqa: E402

_cache = "/root/repo/.jax_cache" if TPU_LANE else cpu_cache_dir()
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
# A finite max_size switches LRUCache into its filelock-guarded mode
# (jax/_src/lru_cache.py: eviction_enabled => inter-process lock around
# get/put). Without it, put() is a bare non-atomic write_bytes and a
# concurrent xdist worker can read a half-written entry —
# deserialize_executable then SIGSEGVs (observed twice in the round-5 fast
# gate at tests/test_eigh_large.py, gw crash + futex-hung restart; the same
# test passes solo against the same cache, confirming a transient race,
# not a poisoned entry). 4 GiB >> the ~20 MB working set: no evictions,
# locking only.
jax.config.update("jax_compilation_cache_max_size", 4 * 1024**3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_xdist_auto_num_workers(config):
    """``-n auto`` resolution (see pytest.ini): 2 CPU-lane workers, 0 (no
    xdist) on the TPU lane where a single process must own the chip."""
    return 0 if TPU_LANE else 2


# Files whose tests compile the JUMBO eigensolver programs. They run FIRST:
# the XLA:CPU client segfaults loading one of these multi-hundred-MB
# executables into a process that has already accumulated ~300 tests' worth
# of compiled programs (observed three times in round 5, always at
# tests/test_eigh_large.py via compilation_cache get_executable_and_time,
# passing solo against the same cache entries). Fresh workers take these
# files first under --dist loadfile, so the jumbo loads happen at minimal
# accumulation.
_JUMBO_FIRST = ("test_eigh_large.py", "test_eigensolver.py",
                "test_dist_eigensolver.py", "test_tridiag_dc_dist.py")

# Fast-gate dtype policy (VERDICT r4 #5: default gate <= 5 min on this
# 1-core box): the fast lane runs the TPU-native dtypes (float32 /
# complex64); the float64 / complex128 rows of these files' sweeps run in
# the slow lane (`-m "slow or not slow"` restores the full {s,d,c,z}
# matrix, the reference's CI dtype coverage, DLAF_AddTest.cmake:60-118).
# Files NOT listed keep all dtypes fast (e.g. x64-emulation regression
# tests whose f64 rows are their entire point).
_FAST_GATE_TPU_DTYPES = ("test_blas_local.py", "test_dist_cholesky.py",
                         "test_dist_matrix.py",
                         "test_dist_multiplication.py", "test_dist_trsm.py",
                         "test_dist_trsm_right.py", "test_eigensolver.py",
                         "test_aux.py", "test_tridiag_dc_dist.py",
                         "test_band_strips.py", "test_eigh_large.py",
                         "test_dist_eigensolver.py")


def pytest_collection_modifyitems(config, items):
    on_tpu = jax.default_backend() in ("tpu", "axon")
    skip_tpu = pytest.mark.skip(reason="tpu-marked test; backend is not TPU")
    skip_cpu = pytest.mark.skip(reason="CPU-lane test; running the TPU lane")
    slow = pytest.mark.slow

    def _fname(it):
        return it.path.name if getattr(it, "path", None) else \
            it.fspath.basename

    for item in items:
        if "tpu" in item.keywords:
            if not (TPU_LANE and on_tpu):
                item.add_marker(skip_tpu)
        elif TPU_LANE:
            item.add_marker(skip_cpu)
        if (_fname(item) in _FAST_GATE_TPU_DTYPES
                and ("float64" in item.name or "complex128" in item.name)):
            item.add_marker(slow)
    items.sort(key=lambda it: 0 if _fname(it) in _JUMBO_FIRST else 1)


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
