from .local import gemm, hemm, herk, potrf, potrf_info, trmm, trsm

__all__ = ["potrf", "potrf_info", "trsm", "trmm", "hemm", "herk", "gemm"]
