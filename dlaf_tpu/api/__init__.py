from .local import gemm, hemm, herk, potrf, trmm, trsm

__all__ = ["potrf", "trsm", "trmm", "hemm", "herk", "gemm"]
