from . import cholesky

__all__ = ["cholesky"]
