"""Tridiagonal D&C miniapp (reference ``miniapp/miniapp_tridiag_solver.cpp``)."""
from __future__ import annotations

import functools

import jax
import numpy as np

from dlaf_tpu.algos.eigensolver.tridiag_dc import tridiag_eigh
from dlaf_tpu.matrix import generators as gen
from dlaf_tpu.types import eps

from . import options


def main(argv=None):
    args = options.parser("miniapp_tridiag_solver").parse_args(argv)
    n = args.matrix_size
    dtype = options.dtype_of(args)
    key = jax.random.PRNGKey(0)
    d = gen.random_general(key, (n,), dtype)
    e = gen.random_general(jax.random.PRNGKey(1), (max(n - 1, 1),), dtype)[: n - 1]

    grid = options.grid_of(args)
    if grid is not None:
        from dlaf_tpu.algos.eigensolver.tridiag_dc_dist import (
            dc_dist_supported, tridiag_eigh_dist)
        ndev = grid.mesh.devices.size
        if dc_dist_supported(n, ndev):
            fn = functools.partial(tridiag_eigh_dist, d, e, grid.mesh)
            get = lambda out: (np.asarray(out[0])[:n],
                               np.asarray(out[1])[:n, :n])
        else:
            fn = functools.partial(tridiag_eigh, d, e, mesh=grid.mesh)
            get = lambda out: (np.asarray(out[0]), np.asarray(out[1]))
    else:
        fn = functools.partial(tridiag_eigh, d, e)
        get = lambda out: (np.asarray(out[0]), np.asarray(out[1]))

    def check(out):
        lam, q = get(out)
        t = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1) + np.diag(np.asarray(e), -1)
        orth = np.max(np.abs(q.T @ q - np.eye(n)))
        res = np.max(np.abs(t @ q - q * lam[None, :]))
        ok = orth <= 500 * n * eps(dtype) and res <= 500 * n * eps(dtype)
        return ok, f"orth {orth:.2e} res {res:.2e}"

    options.run_timed(args, fn, 0, check_fn=check)


if __name__ == "__main__":
    main()
