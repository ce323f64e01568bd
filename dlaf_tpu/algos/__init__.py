from . import cholesky, gen_to_std, general, norm, permutations, triangular
from .eigensolver.driver import eigh, eigh_gen

__all__ = ["cholesky", "triangular", "general", "gen_to_std", "norm",
           "permutations", "eigh", "eigh_gen"]
