"""dlaf_tpu — TPU-native distributed dense linear algebra.

A ground-up rebuild of DLA-Future's capability surface (tiled Cholesky,
triangular solve/multiply, Hermitian multiply, general GEMM, two-stage
symmetric/Hermitian (generalized) eigensolver) designed for TPU: SPMD over a
2-D device mesh with block-cyclic sharding, Pallas MXU kernels for the hot
tile operations, XLA collectives over ICI for row/column broadcasts and
reductions, and static recursive blocking in place of the reference's dynamic
sender/receiver task graph.
"""
from . import dist, ops, types
from .api.local import gemm, hemm, herk, potrf, trmm, trsm
from .tune import TuneParameters, get_tune_parameters, set_tune_parameters


def eigh(*args, **kw):
    """Hermitian eigensolver (two-stage); see algos.eigensolver.driver.eigh."""
    from .algos.eigensolver.driver import eigh as _eigh
    return _eigh(*args, **kw)


def eigh_gen(*args, **kw):
    """Generalized hermitian eigensolver; see algos.eigensolver.driver.eigh_gen."""
    from .algos.eigensolver.driver import eigh_gen as _eigh_gen
    return _eigh_gen(*args, **kw)


def hegst(*args, **kw):
    """Generalized-to-standard transform; see algos.gen_to_std."""
    from .algos.gen_to_std import generalized_to_standard
    return generalized_to_standard(*args, **kw)


__version__ = "0.1.0"

__all__ = [
    "dist", "ops", "types",
    "potrf", "trsm", "trmm", "hemm", "herk", "gemm",
    "eigh", "eigh_gen", "hegst",
    "TuneParameters", "get_tune_parameters", "set_tune_parameters",
]
