"""Back-transform (band->tridiag) miniapp
(reference ``miniapp/miniapp_bt_band_to_tridiag.cpp``)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dlaf_tpu.algos.eigensolver.band2tridiag import band_to_tridiag
from dlaf_tpu.algos.eigensolver.bt import bt_band_to_tridiag
from dlaf_tpu.matrix import generators as gen
from . import options


def main(argv=None):
    args = options.parser("miniapp_bt_band_to_tridiag").parse_args(argv)
    n = args.matrix_size
    band = args.band_size or min(args.block_size, 128)
    dtype = options.dtype_of(args)
    a = gen.random_hermitian(jax.random.PRNGKey(0), n, dtype)
    rows = jnp.arange(n)
    bandm = jnp.where(jnp.abs(rows[:, None] - rows[None, :]) <= band, a, 0)
    d, e, vs, taus = band_to_tridiag(bandm, band)
    emat = gen.random_general(jax.random.PRNGKey(1), (n, n), dtype)

    fn = functools.partial(bt_band_to_tridiag, emat, vs, taus, band)
    # 2 * 2 * n * nev flops per reflector row-block application ~ 4 n^2 nev / b
    options.run_timed(args, fn, 0)


if __name__ == "__main__":
    main()
