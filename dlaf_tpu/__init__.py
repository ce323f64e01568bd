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

__version__ = "0.1.0"

__all__ = [
    "dist", "ops", "types",
    "potrf", "trsm", "trmm", "hemm", "herk", "gemm",
    "TuneParameters", "get_tune_parameters", "set_tune_parameters",
]
