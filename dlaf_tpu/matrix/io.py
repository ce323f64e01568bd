"""Checkpoint / debug-dump I/O for (distributed) matrices.

TPU-native analog of the reference's HDF5 subsystem (``matrix/hdf5.h:1-308``,
used for debug dumps gated by tune flags and miniapp reference inputs): the
same named-dataset contract (``/input``, ``/evals``, ``/evecs``, ...) stored
via numpy's npz container (h5py is not available in this environment; the
format is keyed identically so an HDF5 backend can be swapped in).
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np


class MatrixFile:
    """Write/read named matrices (reference ``FileHDF5::write/read``)."""

    def __init__(self, path: str):
        self.path = path if path.endswith(".npz") else path + ".npz"

    def write(self, **datasets) -> None:
        existing = self.read_all() if os.path.exists(self.path) else {}
        arrays = {}
        for k, v in datasets.items():
            if hasattr(v, "to_global"):
                v = v.to_global()
            arrays[k.lstrip("/")] = np.asarray(v)
        existing.update(arrays)
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        np.savez_compressed(self.path, **existing)

    def read(self, name: str) -> np.ndarray:
        with np.load(self.path) as f:
            return f[name.lstrip("/")]

    def read_all(self) -> Dict[str, np.ndarray]:
        with np.load(self.path) as f:
            return {k: f[k] for k in f.files}

    def read_dist(self, name: str, nb: int, grid):
        """Read a dataset and scatter it onto a grid as a DistMatrix."""
        import jax.numpy as jnp

        from .dist_matrix import DistMatrix
        return DistMatrix.from_global(jnp.asarray(self.read(name)), nb, grid)


def debug_dump(tag: str, **datasets) -> None:
    """Debug dump gated by tune flags (reference tune.h:29-57 +
    factorization/cholesky/impl.h:196-207 dump calls)."""
    from ..tune import get_tune_parameters
    t = get_tune_parameters()
    if not (t.debug_dump_cholesky_data or t.debug_dump_eigensolver_data):
        return
    MatrixFile(os.path.join(t.debug_dump_path, tag)).write(**datasets)
