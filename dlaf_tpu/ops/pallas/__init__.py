"""Pallas TPU kernels for hot single-tile operations.

Custom-kernel layer, the analog of the reference's ``src/lapack/gpu/*.cu``
CUDA kernels: used on TPU for f32/bf16 where the XLA fallback is not
speed-of-light. Dispatch happens in :mod:`dlaf_tpu.ops.leaf`.
"""
