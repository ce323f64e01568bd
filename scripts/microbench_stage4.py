"""Stage-4 streaming-apply microbenchmark: where do the 44.7s go?

HEEV_32768.json: stage4_bt_band2tridiag = 44.7s of 77.9s. The kernel
moves ~2 x 4.3 GB per group x 256 groups ~ 2.2 TB => 49 GB/s effective,
far below HBM peak. This bench isolates (a) the chip's achievable HBM
copy bandwidth through a trivial jit, (b) one bt_apply_group_pallas call
at n = 16384 for b = 128 vs 256, splitting per-iteration overhead from
bandwidth, to choose between k-group fusion and a wider band.

Usage: python scripts/microbench_stage4.py [--n 16384]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_fence = jax.jit(lambda y: y.ravel()[-1])


def _sync(x):
    float(_fence(x))


def _ovh():
    tiny = jnp.ones((8, 128), jnp.float32)
    _sync(tiny)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(tiny)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    args = ap.parse_args(argv)
    n = args.n
    ovh = _ovh()
    print(f"fence overhead {ovh*1e3:.1f} ms", flush=True)

    # (a) achievable HBM copy bandwidth (read n^2 + write n^2)
    x = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
    cp = jax.jit(lambda x: x + 1.0)
    y = cp(x); _sync(y)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        y = cp(y)
        _sync(y)
        ts.append(time.perf_counter() - t0)
    t = min(ts) - ovh
    gb = 2 * n * n * 4 / 1e9
    print(f"copy: {t*1e3:.1f} ms = {gb/t:.0f} GB/s", flush=True)
    del x, y

    # (b) one streaming group apply per band size
    from dlaf_tpu.ops.pallas.bt_apply import apply_tile, bt_apply_group_pallas
    for b in (128, 256):
        tile = apply_tile(n, b)
        nrows = n + 2 * b
        ep = jax.random.normal(jax.random.PRNGKey(1), (nrows, n), jnp.float32)
        ncmax = (n - 1) // b + 1
        v = jax.random.normal(jax.random.PRNGKey(2), (ncmax, 2 * b, b),
                              jnp.float32) * 0.01
        v2 = jax.random.normal(jax.random.PRNGKey(3), (ncmax, 2 * b, b),
                               jnp.float32) * 0.01
        fn = jax.jit(lambda e, v, v2, b=b, t=tile: bt_apply_group_pallas(
            e, v, v2, 0, ncmax - 1, b, t), donate_argnums=0)
        ep = fn(ep, v, v2); _sync(ep)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            ep = fn(ep, v, v2)
            _sync(ep)
            ts.append(time.perf_counter() - t0)
        t = min(ts) - ovh
        iters = (n // tile) * (ncmax - 1)
        gb = 2 * nrows * n * 4 / 1e9
        fl = (ncmax - 1) * (n // tile) * 8 * b * b * tile / 1e12
        print(f"group apply b={b} tile={tile}: {t*1e3:.1f} ms = "
              f"{gb/t:.0f} GB/s, {fl/t:.1f} TFLOP/s, "
              f"{t/iters*1e6:.1f} us/iter ({iters} iters)", flush=True)
        del ep, v, v2


if __name__ == "__main__":
    main()
